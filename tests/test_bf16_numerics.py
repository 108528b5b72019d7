"""Bound the numeric impact of compute_dtype=bfloat16 (VERDICT r2 item 6).

compute_dtype only changes REAL data movement now: conv features are
cast to bf16 BEFORE the sparse-conv row gather (halving gather bytes —
the backbone bottleneck) and the materialized-RPE intermediates. All
matmuls accumulate f32, and on TPU the MXU rounds matmul inputs to bf16
by default anyway, so the extra rounding is at layer boundaries only.

Deviation is bounded at the module level on CONTINUOUS outputs: the
full-model box outputs of an untrained model are dominated by knife-edge
top-k query reselection (any epsilon flips which random proposals win),
which says nothing about trained-model behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.models.backbone import SparseResNet
from vdetr_tpu.models.transformer import GlobalShareCrossAttention
from vdetr_tpu.ops.voxelize import voxelize


def test_backbone_bf16_deviation_bounded(rng):
    N, C = 3000, 3
    pts = rng.rand(2, N, 3).astype(np.float32) * np.array([3.0, 3.0, 2.0])
    feats = rng.rand(2, N, C).astype(np.float32)
    grid = voxelize(jnp.asarray(pts), jnp.asarray(feats),
                    jnp.ones((2, N), bool), voxel_size=0.05,
                    capacity=2048, extent=(128, 128, 64))
    caps = (1024, 512, 256, 128, 128)
    m32 = SparseResNet(depth=18, inplanes=16, stage_capacities=caps)
    m16 = SparseResNet(depth=18, inplanes=16, stage_capacities=caps,
                       compute_dtype=jnp.bfloat16)
    variables = m32.init(jax.random.PRNGKey(0), grid, train=False)
    o32 = m32.apply(variables, grid, train=False)
    o16 = m16.apply(variables, grid, train=False)
    for s, (a, b) in enumerate(zip(o32, o16)):
        fa, fb = np.asarray(a.features), np.asarray(b.features)
        scale = np.abs(fa).max()
        dev = np.abs(fa - fb).max() / max(scale, 1e-6)
        assert dev < 0.05, f"stage {s} relative deviation {dev}"
    # the cast must actually do something (guards against elision)
    assert not np.array_equal(np.asarray(o32[0].features),
                              np.asarray(o16[0].features))


def test_rpe_cross_attention_bf16_deviation_bounded(rng):
    dim, H, B, nQ, nK = 32, 4, 2, 16, 64
    q = rng.randn(B, nQ, dim).astype(np.float32) * 0.5
    key = rng.randn(B, nK, dim).astype(np.float32) * 0.5
    centers = rng.rand(B, nQ, 3).astype(np.float32) * 4
    sizes = rng.rand(B, nQ, 3).astype(np.float32) + 0.3
    offs = np.array([[i, j, l] for i in (-1, 1) for j in (-1, 1)
                     for l in (-1, 1)], np.float32) / 2
    corners = centers[:, :, None, :] + offs[None, None] * sizes[:, :, None, :]
    xyz = rng.rand(B, nK, 3).astype(np.float32) * 4
    angles = jnp.zeros((B, nQ))

    def run(cd):
        m = GlobalShareCrossAttention(dim=dim, num_heads=H, rpe_dim=16,
                                      impl="materialized", compute_dtype=cd)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(key),
                   jnp.asarray(corners), angles, jnp.asarray(xyz),
                   train=False)
        return np.asarray(m.apply(v, jnp.asarray(q), jnp.asarray(key),
                                  jnp.asarray(corners), angles,
                                  jnp.asarray(xyz), train=False))

    o32 = run(None)
    o16 = run(jnp.bfloat16)
    dev = np.abs(o32 - o16).max() / max(np.abs(o32).max(), 1e-6)
    assert dev < 0.05, f"cross-attention relative deviation {dev}"
