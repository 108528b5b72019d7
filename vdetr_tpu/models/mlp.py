"""Generic MLP stack + learned positional embedding.

Channel-last equivalents of the reference helpers (models/helpers.py:17-141):
a 1x1 Conv1d over (B, C, N) is a Dense over the last axis of (B, N, C).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vdetr_tpu.models.norm import BatchNorm1d

xavier_uniform = nn.initializers.xavier_uniform()


class GenericMLP(nn.Module):
    """Reference models/helpers.py:74-141.

    norm: None | "bn1d" | "ln" | "id". Dropout applies after each hidden
    activation.
    """

    hidden_dims: Sequence[int]
    output_dim: int
    norm: Optional[str] = None
    activation: str = "relu"
    dropout: Optional[float] = None
    hidden_use_bias: bool = False
    output_use_bias: bool = True
    output_use_activation: bool = False
    output_use_norm: bool = False
    output_bias_init: Optional[float] = None
    output_zero_init: bool = False
    axis_name: Optional[str] = None

    def _act(self, x):
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "gelu":
            return nn.gelu(x)
        if self.activation == "leakyrelu":
            return nn.leaky_relu(x, negative_slope=0.1)
        raise ValueError(self.activation)

    def _norm(self, x, i, train):
        if self.norm in (None, "id"):
            return x
        if self.norm == "bn1d":
            return BatchNorm1d(
                x.shape[-1], use_running_average=not train,
                axis_name=self.axis_name, name=f"norm{i}"
            )(x)
        if self.norm == "ln":
            return nn.LayerNorm(name=f"norm{i}")(x)
        raise ValueError(self.norm)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, use_bias=self.hidden_use_bias,
                         name=f"layer{i}")(x)
            x = self._norm(x, i, train)
            x = self._act(x)
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.output_zero_init:
            kinit, binit = nn.initializers.zeros, nn.initializers.zeros
        else:
            kinit = nn.linear.default_kernel_init
            binit = nn.initializers.zeros
        if self.output_bias_init is not None:
            binit = nn.initializers.constant(self.output_bias_init)
        x = nn.Dense(self.output_dim, use_bias=self.output_use_bias,
                     kernel_init=kinit, bias_init=binit, name="out")(x)
        if self.output_use_norm:
            x = self._norm(x, "out", train)
        if self.output_use_activation:
            x = self._act(x)
        return x


class PositionEmbeddingLearned(nn.Module):
    """Dense + BN + ReLU + Dense on coordinates (reference
    models/helpers.py:17-33). Input (B, N, D) -> (B, N, F)."""

    num_pos_feats: int = 256
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        x = nn.Dense(self.num_pos_feats, name="layer0")(xyz)
        x = BatchNorm1d(self.num_pos_feats, use_running_average=not train,
                        axis_name=self.axis_name, name="norm0")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, name="out")(x)
