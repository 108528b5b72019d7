"""Normalization layers.

MaskedBatchNorm / MaskedInstanceNorm operate on padded voxel tensors
(B, V, C) with a validity mask so padding never pollutes the statistics —
the TPU equivalent of MinkowskiBatchNorm / MinkowskiInstanceNorm which see
only real voxels. Sync-BN across the data mesh axis (reference
main.py:511-514, required because batchsize_per_gpu=1) is a weighted
psum of (sum, sq_sum, count) via `axis_name`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of (B, V, C), torch-style running stats."""

    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    use_running_average: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        # stats and normalization always in float32: inputs may be stored
        # bfloat16 (backbone-resident low precision for the sparse-conv
        # gathers) and bf16 accumulation over 65k voxels loses ~3 digits
        x = x.astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(x.dtype)[..., None]
            cnt = m.sum()
            s = (x * m).sum(axis=(0, 1))
            sq = (x * x * m).sum(axis=(0, 1))
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(sq / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class MaskedInstanceNorm(nn.Module):
    """Per-sample instance norm over valid voxels (stem alternative,
    reference models/mink_resnet.py:41 when stem_bn=False)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(jnp.float32)  # see MaskedBatchNorm: f32 stats
        m = mask.astype(x.dtype)[..., None]
        cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        mean = (x * m).sum(axis=1, keepdims=True) / cnt
        var = ((x - mean) ** 2 * m).sum(axis=1, keepdims=True) / cnt
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class BatchNorm1d(nn.Module):
    """Dense BatchNorm over (B, N, C) with stats over (B, N): the
    equivalent of torch nn.BatchNorm1d on (B, C, N) used throughout the
    reference MLP heads (models/helpers.py:56-61)."""

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0] * x.shape[1]
            s = x.sum(axis=(0, 1))
            sq = (x * x).sum(axis=(0, 1))
            cnt = jnp.asarray(n, x.dtype)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            mean = s / cnt
            var = jnp.maximum(sq / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
