"""Fourier / sine coordinate embeddings (reference
models/position_embedding.py:21-148; only used when querypos_mlp=False,
which is off in the published config — shipped for API completeness).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vdetr_tpu.geometry.boxes import shift_scale_points


class PositionEmbeddingCoordsSine(nn.Module):
    d_pos: int = 256
    pos_type: str = "fourier"  # "fourier" | "sine"
    temperature: float = 10000.0
    normalize: bool = True
    gauss_scale: float = 1.0
    d_in: int = 3

    @nn.compact
    def __call__(self, xyz, input_range=None, num_channels: Optional[int] = None):
        """xyz: (B, N, d_in) -> (B, N, num_channels). No gradients flow
        (the reference computes these under no_grad)."""
        nc = num_channels or self.d_pos
        if self.normalize and input_range is not None:
            xyz = shift_scale_points(xyz, src_range=input_range)
        xyz = jax.lax.stop_gradient(xyz)
        if self.pos_type == "fourier":
            gauss_b = self.variable(
                "constants", "gauss_B",
                lambda: jnp.asarray(
                    np.random.RandomState(0).randn(self.d_in, self.d_pos // 2)
                    * self.gauss_scale,
                    jnp.float32,
                ),
            ).value
            d_out = nc // 2
            proj = (2 * np.pi * xyz) @ gauss_b[:, :d_out]
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        # sine: per-dim interleaved sin/cos with temperature scaling
        d_in = xyz.shape[-1]
        ndim = nc // d_in
        if ndim % 2 != 0:
            ndim -= 1
        rems = nc - ndim * d_in
        outs = []
        for d in range(d_in):
            cdim = ndim + (2 if rems > 0 else 0)
            rems = max(rems - 2, 0)
            dim_t = jnp.arange(cdim, dtype=jnp.float32)
            dim_t = self.temperature ** (2 * (dim_t // 2) / cdim)
            pos = xyz[..., d:d + 1] * (2 * math.pi) / dim_t
            emb = jnp.stack(
                [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
            ).reshape(xyz.shape[:-1] + (cdim,))
            outs.append(emb)
        return jnp.concatenate(outs, axis=-1)
