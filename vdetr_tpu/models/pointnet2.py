"""PointNet++ set-abstraction / feature-propagation modules.

API-parity layer over vdetr_tpu.ops for the reference's
third_party/pointnet2/pointnet2_modules.py (imported by
utils/ap_calculator.py:27-29 but not executed in the shipped train/eval
path — provided so code written against the reference's module surface
has an equivalent here). Channel-last layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vdetr_tpu.models.norm import BatchNorm1d
from vdetr_tpu.ops.ball_query import ball_query
from vdetr_tpu.ops.fps import furthest_point_sample
from vdetr_tpu.ops.gather import grouping_operation
from vdetr_tpu.ops.interpolate import (
    interpolate_weights,
    three_interpolate,
    three_nn,
)


class QueryAndGroup(nn.Module):
    """Ball query + relative-coordinate grouping (reference
    pointnet2_utils.py QueryAndGroup)."""

    radius: float
    nsample: int
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, new_xyz, features=None):
        """xyz: (B, N, 3); new_xyz: (B, np, 3); features: (B, N, C).
        Returns (B, np, nsample, C') with C' = C (+3 when use_xyz)."""
        idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
        grouped_xyz = grouping_operation(
            jnp.swapaxes(xyz, 1, 2), idx
        ).transpose(0, 2, 3, 1)  # (B, np, ns, 3)
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
        parts = []
        if features is not None:
            grouped = grouping_operation(
                jnp.swapaxes(features, 1, 2), idx
            ).transpose(0, 2, 3, 1)
            parts.append(grouped)
        if self.use_xyz:
            parts.insert(0, grouped_xyz)
        return jnp.concatenate(parts, axis=-1)


class SharedMLP(nn.Module):
    """Per-point MLP (1x1 conv stack) with BN+ReLU."""

    dims: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        flat = x.reshape(B, -1, x.shape[-1])
        for i, d in enumerate(self.dims):
            flat = nn.Dense(d, use_bias=False, name=f"layer{i}")(flat)
            flat = BatchNorm1d(d, use_running_average=not train,
                               name=f"norm{i}")(flat)
            flat = nn.relu(flat)
        return flat.reshape(x.shape[:-1] + (self.dims[-1],))


class PointnetSAModuleVotes(nn.Module):
    """Set abstraction: FPS centers + ball-query grouping + shared MLP +
    max pool (reference pointnet2_modules.py:161-269)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, inds=None, train: bool = False):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint, impl="jax")
        new_xyz = jnp.take_along_axis(xyz, inds[..., None], axis=1)
        grouped = QueryAndGroup(self.radius, self.nsample,
                                self.use_xyz, name="grouper")(
            xyz, new_xyz, features
        )
        feats = SharedMLP(self.mlp, name="mlp")(grouped, train)
        pooled = feats.max(axis=2)  # (B, npoint, C)
        return new_xyz, pooled, inds


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + shared
    MLP (reference pointnet2_modules.py:352-411)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = False):
        """unknown: (B, n, 3); known: (B, m, 3); *_feats channel-last."""
        if known is not None:
            dist, idx = three_nn(unknown, known)
            w = interpolate_weights(dist)
            interp = three_interpolate(
                jnp.swapaxes(known_feats, 1, 2), idx, w
            ).transpose(0, 2, 1)
        else:
            interp = jnp.broadcast_to(
                known_feats.mean(1, keepdims=True),
                (known_feats.shape[0], unknown.shape[1],
                 known_feats.shape[-1]),
            )
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, name="mlp")(interp, train)
