"""Keyed (map-free) windowed Mosaic sparse-conv (ops/sparse_conv_keyed.py)
vs the XLA gather path, in interpret mode on CPU, through the integrated
`sparse_conv` / `sparse_conv_down` dispatch.

Covers: forward parity, gradients (flipped-weights dFeats identity +
dW kernel), gradients THROUGH the fix-up path (bad rows used), the
overflow fallback (adversarial layout must still be exact), stride-2
keyed forward with lazily-mapped XLA backward, and all-miss rows.
Reference semantics: MinkowskiEngine submanifold/strided convolution
(reference models/mink_resnet.py via third-party ME).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.ops import sparse_conv as sc
from vdetr_tpu.ops import sparse_conv_keyed as skc
from vdetr_tpu.ops.voxelize import downsample_grid, voxelize


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


def test_keyed_conv_forward_parity():
    rng = np.random.RandomState(0)
    grid = _grid(rng, V=512, B=2)
    C, Co = 64, 64
    feats = jnp.asarray(rng.randn(2, 512, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    plain = sc.sparse_conv(sc.attach_kernel_map(grid), w).features
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    assert g_win.wk_qkey is not None and g_win.nbr_idx is None
    assert not bool(np.asarray(g_win.win_ovf).any())
    got = sc.sparse_conv(g_win, w).features
    r, g = np.asarray(plain), np.asarray(got)
    assert np.abs(r - g).max() / np.abs(r).max() < 2e-2


def test_keyed_conv_grads_match_xla():
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
    window pairs cover — so its rows are bad, but there are few of them
    (the comb sorts first, x-major keys), so build_fix_plan absorbs
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
    the flipped-weights dFeats replay misses terms at bad rows, which
    the backward must patch with the exact gather transpose conv — the
    structure mandated by the round-3 advisor's high finding."""
    rng = np.random.RandomState(7)
    grid = _comb_wall_grid()
    V = grid.keys.shape[1]
    C, Co = 64, 64
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    g_plain = sc.attach_kernel_map(grid)
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    assert g_win.wk_qkey is not None
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


def test_bad_rows_complement_is_exact_without_fixup():
    """The contract behind detect_bad_rows: every valid row NOT flagged
    bad is computed correctly by the RAW keyed kernel (no fix-up
    applied) — the flagged rows are the only ones fix-up may repair.
    This pins the XLA gap predicate to the kernel's actual block
    coverage ([bA..bA+1] + the conditional high pair bounded by hb)."""
    rng = np.random.RandomState(5)
    grid = _comb_wall_grid()
    V = grid.keys.shape[1]
    assert V % 128 == 0
    C = Co = 64
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    tile = wb = 128
    k, q0, v = grid.keys[0], grid.coords[0], grid.valid[0]
    geom = skc.conv_window_geometry(k, q0, v, grid.extent, tile, wb)
    assert bool(np.asarray(geom["bad"]).any())  # layout exercises gaps
    shifts = jnp.asarray(skc._group_shifts(grid.extent), jnp.int32)
    raw = skc.keyed_conv(grid.features, k[None], geom["qkeym"][None],
                         geom["mask"][None], geom["blk"][None], shifts,
                         w, tile=tile, wb=wb, interpret=True)
    ref = sc.sparse_conv(sc.attach_kernel_map(grid), w).features
    ok = np.asarray(v) & ~np.asarray(geom["bad"])
    r, g = np.asarray(ref)[0][ok], np.asarray(raw)[0][ok]
    assert np.abs(r - g).max() / max(1e-6, np.abs(r).max()) < 2e-2


def test_flipped_weights_identity():
    """dFeats of a submanifold conv == same keyed conv with reversed,
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
        # fallback branch (lazily-built map): results must be
        # bit-identical to the XLA path
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(got))
    else:
        r, g = np.asarray(plain), np.asarray(got)
        assert np.abs(r - g).max() / np.abs(r).max() < 2e-2


def test_keyed_stride2_through_sparse_conv_down():
    """Stride-2 keyed forward + lazily-mapped XLA backward through the
    sparse_conv_down dispatch (output sites != input sites)."""
    rng = np.random.RandomState(4)
    grid = _grid(rng, V=512)
    C, Co = 64, 128
    feats = jnp.asarray(rng.randn(1, 512, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    out_grid = downsample_grid(grid, 256)

    def loss(f, w_, win):
        out = sc.sparse_conv_down(grid.replace(features=f), w_,
                                  out_grid=out_grid,
                                  window_interpret=win).features
        return (out * jnp.cos(out)).sum(), out

    (l_ref, ref), gref = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(grid.features, w, False)
    (l_got, got), ggot = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(grid.features, w, True)
    r, g = np.asarray(ref), np.asarray(got)
    assert np.abs(r - g).max() / np.abs(r).max() < 2e-2
    for a, b in zip(gref, ggot):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(1e-6, np.abs(a).max()) < 2e-2


def test_keyed_stem_small_cin():
    """Stride-2 keyed conv with C_in=3 (the stem): channels zero-padded
    to 32 inside the dispatch; forward and grads must match the XLA
    gather path."""
    rng = np.random.RandomState(9)
    grid = _grid(rng, V=512)
    C, Co = 3, 64
    feats = jnp.asarray(rng.randn(1, 512, C).astype(np.float32))
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.1)
    out_grid = downsample_grid(grid, 256)

    def loss(f, w_, win):
        out = sc.sparse_conv_down(grid.replace(features=f), w_,
                                  out_grid=out_grid,
                                  window_interpret=win).features
        return (out * jnp.cos(out)).sum(), out

    (_, ref), gref = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(grid.features, w, False)
    (_, got), ggot = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(grid.features, w, True)
    r, g = np.asarray(ref), np.asarray(got)
    assert np.abs(r - g).max() / np.abs(r).max() < 2e-2
    for a, b in zip(gref, ggot):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(1e-6, np.abs(a).max()) < 2e-2
        assert a.shape == b.shape


def test_keyed_conv_cin_split_512():
    """512x512 weights exceed WEIGHT_VMEM_CAP: keyed_conv splits the
    contraction over C_in (two 256-half passes). Since round 5 the
    submanifold 512s also pass keyed_bwd_ok, so sparse_conv dispatches
    them to keyed_conv_ad — flipped-weights keyed dFeats (with fix-up
    mirror) + the GROUP-SPLIT dW kernel (27*512*512*4 = 28 MB exceeds
    DW_SCRATCH_CAP, so the accumulator blocks to (3, C, Co) over a
    9-step outer grid). Forward + both grads through the sparse_conv
    dispatch must match the XLA gather path (VERDICT items 2 + 4)."""
    rng = np.random.RandomState(11)
    grid = _grid(rng, V=256)
    C = Co = 512
    assert skc.keyed_fwd_ok(C, Co)  # admitted via the internal halving
    assert skc.keyed_bwd_ok(C, Co)  # fully keyed backward (ad path)
    assert 27 * C * Co * 4 > skc.DW_SCRATCH_CAP  # dW takes group split
    # needs halving but c_in not 128-divisible: rejected
    assert not skc.keyed_fwd_ok(192, 1024)
    feats = jnp.asarray(rng.randn(1, 256, C).astype(np.float32) * 0.1)
    grid = grid.replace(features=feats * grid.valid[..., None])
    w = jnp.asarray(rng.randn(27, C, Co).astype(np.float32) * 0.02)
    g_plain = sc.attach_kernel_map(grid)
    g_win = sc.attach_kernel_map(grid, window_interpret=True)
    assert g_win.wk_qkey is not None and not bool(
        np.asarray(g_win.win_ovf).any())

    def loss(base, w_, f_):
        out = sc.sparse_conv(base.replace(features=f_), w_).features
        return (out * jnp.cos(out)).sum(), out

    (_, ref), gref = jax.value_and_grad(loss, argnums=(1, 2),
                                        has_aux=True)(
        g_plain, w, g_plain.features)
    (_, got), ggot = jax.value_and_grad(loss, argnums=(1, 2),
                                        has_aux=True)(
        g_win, w, g_win.features)
    r, g = np.asarray(ref), np.asarray(got)
    assert np.abs(r - g).max() / np.abs(r).max() < 2e-2
    for name, a, b in zip(("dW", "dFeats"), gref, ggot):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
        assert err < 2e-2, (name, err)


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
