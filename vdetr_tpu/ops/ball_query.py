"""Fixed-radius ball query (reference
third_party/pointnet2/_ext_src/src/ball_query_gpu.cu:12-57).

Semantics: for each query center, take the first `nsample` points (in
index order) with squared distance < radius^2; slots beyond the number of
hits are filled with the first hit. Centers with zero hits return all
zeros (the CUDA kernel leaves the preallocated zero buffer untouched).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ball_query(radius: float, nsample: int, xyz, new_xyz, valid_mask=None):
    """xyz: (B, N, 3) support points; new_xyz: (B, npoint, 3) centers.

    valid_mask: optional (B, N) bool; padded points never match.
    Returns (B, npoint, nsample) int32.
    """
    d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    within = d2 < radius * radius  # (B, npoint, N)
    if valid_mask is not None:
        within = within & valid_mask[:, None, :]
    N = xyz.shape[1]
    # candidates sorted by index: hits keep their index, misses become N
    cand = jnp.where(within, jnp.arange(N, dtype=jnp.int32)[None, None, :], N)
    first = jnp.sort(cand, axis=-1)[..., :nsample]  # (B, npoint, nsample)
    any_hit = within.any(-1, keepdims=True)
    first_hit = first[..., 0:1]
    idx = jnp.where(first >= N, first_hit, first)
    idx = jnp.where(any_hit, idx, 0)
    return idx.astype(jnp.int32)
