"""Gather / grouping ops (reference pointnet2 `gather_operation` /
`grouping_operation`, third_party/pointnet2/_ext_src/src/sampling_gpu.cu:12-60
and group_points_gpu.cu:11-78).

In XLA these are plain take-along-axis gathers; backward (scatter-add)
comes from autodiff for free, matching the CUDA grad kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_operation(features, idx):
    """features: (B, C, N); idx: (B, m) int -> (B, C, m)."""
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


def grouping_operation(features, idx):
    """features: (B, C, N); idx: (B, npoint, nsample) int
    -> (B, C, npoint, nsample)."""
    B, C, N = features.shape
    _, npoint, nsample = idx.shape
    flat = jnp.take_along_axis(
        features, idx.reshape(B, 1, npoint * nsample), axis=2
    )
    return flat.reshape(B, C, npoint, nsample)
