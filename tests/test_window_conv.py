"""Windowed one-hot Mosaic sparse-conv kernel (ops/sparse_conv_kernel.py)
vs the XLA gather path, in interpret mode on CPU.

Covers: forward parity, the flipped-map dFeats identity, the dW kernel,
gradients through the integrated `sparse_conv` dispatch, and the
overflow fallback (an adversarial layout must still be exact).
Reference semantics: MinkowskiEngine submanifold convolution
(reference models/mink_resnet.py via third-party ME).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.ops import sparse_conv as sc
from vdetr_tpu.ops.sparse_conv_kernel import (
    build_window_map,
    flip_weights,
    window_conv,
    window_conv_ad,
)
from vdetr_tpu.ops.voxelize import voxelize


def _grid(rng, V=512, clustered=True, B=1):
    if clustered:
        npatch = 8
        centers = rng.rand(npatch, 3) * np.array([2.0, 2.0, 1.0])
        pts = []
        per = V // npatch + 1
        for c in centers:
            u = rng.randn(per, 3).astype(np.float32)
            u[:, 2] *= 0.08
            pts.append(c + u * 0.3)
        pts = np.concatenate(pts)[:V]
    else:
        # adversarial: uniform sparse points -> huge rank jumps between
        # consecutive sites -> window overflow
        pts = rng.rand(V, 3).astype(np.float32) * 30.0
    pts = np.stack([pts] * B)
    return voxelize(jnp.asarray(pts), jnp.asarray(pts),
                    jnp.ones((B, V), bool), voxel_size=0.05, capacity=V)


def test_window_conv_forward_parity():
    rng = np.random.RandomState(0)
    grid = _grid(rng, V=512, B=2)
    C, Co = 64, 64
    feats = jnp.asarray(rng.randn(2, 512, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    plain = sc.sparse_conv(sc.attach_kernel_map(grid), w).features
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    assert g_win.win_le is not None
    assert not bool(np.asarray(g_win.win_ovf).any())
    got = sc.sparse_conv(g_win, w).features
    r, g = np.asarray(plain), np.asarray(got)
    assert np.abs(r - g).max() / np.abs(r).max() < 2e-2


def test_window_conv_grads_match_xla():
    rng = np.random.RandomState(1)
    grid = _grid(rng, V=256)
    C, Co = 64, 128
    feats = jnp.asarray(rng.randn(1, 256, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    g_plain = sc.attach_kernel_map(grid)
    g_win = sc.attach_kernel_map(grid, window_interpret=True)

    def loss(base, w_, f_):
        out = sc.sparse_conv(base.replace(features=f_), w_).features
        return (out * jnp.cos(out)).sum()

    ref = jax.grad(loss, argnums=(1, 2))(g_plain, w, g_plain.features)
    got = jax.grad(loss, argnums=(1, 2))(g_win, w, g_win.features)
    for a, b in zip(ref, got):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(1e-6, np.abs(a).max()) < 2e-2


def _comb_wall_grid(V_wall=128, V_slab=1024):
    """A layout whose bad (scattered-neighbor) rows stay WITHIN the
    fix-up budget: a sparse 'comb' slab at x=0 (one site every 8 voxels
    in y) next to a dense slab at x=1. The comb tile's dx=+1 neighbor
    ranks spread over ~8*V_wall rows — far more than the 2 dual-cluster
    window pairs cover — so its rows are bad, but they all live in one
    tile (the comb sorts first, x-major keys), so build_fixup absorbs
    them and win_ovf stays False."""
    vs = 0.05
    wall = np.stack([np.zeros(V_wall), np.arange(V_wall) * 8.0,
                     np.zeros(V_wall)], axis=1)
    slab = np.stack([np.ones(V_slab), np.arange(V_slab) * 1.0,
                     np.zeros(V_slab)], axis=1)
    pts = ((np.concatenate([wall, slab]) + 0.5) * vs)[None].astype(
        np.float32)
    V = V_wall + V_slab
    return voxelize(jnp.asarray(pts), jnp.asarray(pts),
                    jnp.ones((1, V), bool), voxel_size=vs, capacity=V)


def test_fixup_path_grads_match_xla():
    """Gradients THROUGH the fix-up path (bad rows used, no overflow):
    the flipped-map dFeats replay has -1 holes at bad rows, which the
    backward must patch with the exact gather transpose conv — the
    round-3 advisor's high finding."""
    rng = np.random.RandomState(7)
    grid = _comb_wall_grid()
    V = grid.keys.shape[1]
    C, Co = 64, 64
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    g_plain = sc.attach_kernel_map(grid)
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    assert g_win.win_le is not None
    # the layout must actually exercise the fix-up: no overflow, but
    # used fix slots (rows < V)
    assert not bool(np.asarray(g_win.win_ovf).any())
    assert bool((np.asarray(g_win.fix_rows) < V).any())

    def loss(base, w_, f_):
        out = sc.sparse_conv(base.replace(features=f_), w_).features
        return (out * jnp.cos(out)).sum()

    ref = jax.grad(loss, argnums=(1, 2))(g_plain, w, g_plain.features)
    got = jax.grad(loss, argnums=(1, 2))(g_win, w, g_win.features)
    for name, a, b in zip(("dW", "dFeats"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
        assert err < 2e-2, (name, err)


def test_flipped_map_identity():
    """dFeats of a submanifold conv == same window conv with reversed,
    transposed weights (offsets[26-k] == -offsets[k])."""
    offs = sc._offsets(3)
    for k in range(27):
        assert tuple(-o for o in offs[k]) == offs[26 - k]


def test_overflow_falls_back_exactly():
    rng = np.random.RandomState(2)
    grid = _grid(rng, V=512, clustered=False)
    C = 64
    feats = jnp.asarray(rng.randn(1, 512, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    plain = sc.sparse_conv(sc.attach_kernel_map(grid), w).features
    got = sc.sparse_conv(g_win, w).features
    if bool(np.asarray(g_win.win_ovf).any()):
        # fallback branch: results must be bit-identical to the XLA path
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(got))
    else:
        r, g = np.asarray(plain), np.asarray(got)
        assert np.abs(r - g).max() / np.abs(r).max() < 2e-2


def test_fwdk_stride2_path():
    """window_conv_fwdk (kernel forward, XLA backward) on a stride-2
    neighbor map: output sites != input sites."""
    from vdetr_tpu.ops.sparse_conv import (_gather_matmul,
                                           sparse_conv_down)
    from vdetr_tpu.ops.sparse_conv_kernel import window_conv_fwdk
    from vdetr_tpu.ops.voxelize import downsample_grid
    from vdetr_tpu.ops.sparse_conv import _zrun_neighbors

    rng = np.random.RandomState(4)
    grid = _grid(rng, V=512)
    C, Co = 64, 128
    feats = jnp.asarray(rng.randn(1, 512, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    out_grid = downsample_grid(grid, 256)
    nbr = jax.vmap(
        lambda oc, ov, ik: _zrun_neighbors(ik, oc * 2, ov, grid.extent, 1)
    )(out_grid.coords, out_grid.valid, grid.keys)
    ref = jax.vmap(lambda f, i: _gather_matmul(f, i, w))(
        grid.features, nbr)
    blk, le, ovf = jax.vmap(
        lambda n: build_window_map(n, 512, 256, 256))(nbr)
    if bool(np.asarray(ovf).any()):
        pytest.skip("stride-2 layout overflowed on this seed")

    def loss(f, w_):
        out = window_conv_fwdk(f, blk, le, nbr, w_, 256, 256, True)
        return (out * out).sum(), out

    (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(grid.features, w)
    r, g = np.asarray(ref), np.asarray(out)
    assert np.abs(r - g).max() / np.abs(r).max() < 2e-2

    def loss_ref(f, w_):
        return (jax.vmap(lambda ff, i: _gather_matmul(ff, i, w_))(
            f, nbr) ** 2).sum()

    gref = jax.grad(loss_ref, argnums=(0, 1))(grid.features, w)
    for a, b in zip(grads, gref):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(1e-6, np.abs(b).max()) < 2e-2


def test_miss_rows_contribute_zero():
    """All-miss sites (isolated voxels far apart) produce the center-tap
    result only."""
    rng = np.random.RandomState(3)
    V, C = 256, 64
    # isolated voxels: no neighbors except self
    pts = (np.arange(V)[:, None] * np.array([1.0, 0.7, 0.3]))[None]
    grid = voxelize(jnp.asarray(pts, jnp.float32),
                    jnp.asarray(pts, jnp.float32),
                    jnp.ones((1, V), bool), voxel_size=0.05, capacity=V)
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    if bool(np.asarray(g_win.win_ovf).any()):
        pytest.skip("isolated layout overflowed; covered by fallback test")
    got = sc.sparse_conv(g_win, w).features
    center = grid.features @ w[13]  # offset (0,0,0) is index 13
    center = center * grid.valid[..., None]
    r, g = np.asarray(center), np.asarray(got)
    assert np.abs(r - g).max() / max(1e-6, np.abs(r).max()) < 2e-2
