"""Three-nearest-neighbor feature interpolation (reference
third_party/pointnet2/_ext_src/src/interpolate_gpu.cu).

three_nn: for each `unknown` point, the 3 nearest `known` points
(ascending distance). three_interpolate: inverse-distance weighted sum of
their features; the backward (scatter-add) comes from autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def three_nn(unknown, known, known_valid=None):
    """unknown: (B, n, 3); known: (B, m, 3) -> (dist, idx) both (B, n, 3)."""
    d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
    if known_valid is not None:
        d2 = jnp.where(known_valid[:, None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(-neg), idx.astype(jnp.int32)


def three_interpolate(features, idx, weight):
    """features: (B, C, m); idx: (B, n, 3); weight: (B, n, 3) -> (B, C, n)."""
    B, C, m = features.shape
    n = idx.shape[1]
    flat = jnp.take_along_axis(features, idx.reshape(B, 1, n * 3), axis=2)
    flat = flat.reshape(B, C, n, 3)
    return (flat * weight[:, None, :, :]).sum(-1)


def interpolate_weights(dist, eps: float = 1e-8):
    """Inverse-distance weights as used by PointnetFPModule
    (reference third_party/pointnet2/pointnet2_modules.py:386-391)."""
    recip = 1.0 / (dist + eps)
    norm = recip.sum(-1, keepdims=True)
    return recip / norm
