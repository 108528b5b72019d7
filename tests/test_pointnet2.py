"""PointNet++ module-surface tests (set abstraction / feature propagation)."""

import numpy as np
import jax
import jax.numpy as jnp

from vdetr_tpu.models.pointnet2 import (
    PointnetFPModule,
    PointnetSAModuleVotes,
    QueryAndGroup,
)


def test_sa_module_shapes_and_center_selection(rng):
    xyz = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32) + 1.0)
    feats = jnp.asarray(rng.randn(2, 128, 8).astype(np.float32))
    m = PointnetSAModuleVotes(npoint=16, radius=0.3, nsample=8,
                              mlp=[16, 16])
    vars_ = m.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, pooled, inds = m.apply(vars_, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert pooled.shape == (2, 16, 16)
    assert inds.shape == (2, 16)
    # centers are actual input points
    sel = np.take_along_axis(np.asarray(xyz), np.asarray(inds)[..., None], 1)
    np.testing.assert_allclose(np.asarray(new_xyz), sel)


def test_query_and_group_relative_coords(rng):
    xyz = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    new_xyz = xyz[:, :4]
    g = QueryAndGroup(radius=0.5, nsample=8, use_xyz=True)
    out = g.init_with_output(jax.random.PRNGKey(0), xyz, new_xyz)[0]
    assert out.shape == (1, 4, 8, 3)
    # the center itself is within radius; its relative coord is ~0
    mins = np.abs(np.asarray(out)).sum(-1).min(-1)
    np.testing.assert_allclose(mins, 0.0, atol=1e-6)


def test_fp_module_interpolates(rng):
    unknown = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    known = unknown[:, :8] + 0.001  # nearly coincident with first 8
    known_feats = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32))
    m = PointnetFPModule(mlp=[4])
    vars_ = m.init(jax.random.PRNGKey(0), unknown, known, None, known_feats)
    out = m.apply(vars_, unknown, known, None, known_feats)
    assert out.shape == (1, 32, 4)
    assert np.isfinite(np.asarray(out)).all()
