"""Tests for voxelization and sparse convolutions.

Sparse convs are validated against dense `lax.conv_general_dilated` on a
zero-padded dense grid: a submanifold/strided sparse conv evaluated at an
occupied site must equal the dense convolution there (unoccupied features
are zero in both views).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vdetr_tpu.ops.voxelize import (
    voxelize,
    pack_keys,
    lookup,
    KEY_SENTINEL,
    downsample_grid,
)
from vdetr_tpu.ops.sparse_conv import (
    sparse_conv,
    sparse_conv_down,
    sparse_conv_transpose,
    sparse_conv_transpose_generative,
    _offsets,
)

EXTENT = (32, 32, 16)


def make_grid(rng, npts=200, C=4, B=2, capacity=256):
    pts = (rng.rand(B, npts, 3) * np.array([0.25, 0.25, 0.12])).astype(
        np.float32
    )
    feats = rng.randn(B, npts, C).astype(np.float32)
    valid = np.ones((B, npts), bool)
    valid[:, -20:] = False
    return voxelize(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid),
        voxel_size=0.01, capacity=capacity, extent=EXTENT, align_stride=8,
    ), pts, feats, valid


def to_dense(grid):
    """Scatter a VoxelGrid into a dense (B, GX, GY, GZ, C) array."""
    B, V, C = grid.features.shape
    gx, gy, gz = grid.extent
    dense = np.zeros((B, gx, gy, gz, C), np.float32)
    coords = np.asarray(grid.coords)
    feats = np.asarray(grid.features)
    valid = np.asarray(grid.valid)
    for b in range(B):
        for v in range(V):
            if valid[b, v]:
                x, y, z = coords[b, v]
                dense[b, x, y, z] = feats[b, v]
    return dense


def dense_conv(dense, W, stride=1, kernel_size=3):
    """Dense reference conv. W: (K, Cin, Cout) in z-fastest offset order."""
    k = kernel_size
    Whwio = np.asarray(W).reshape(k, k, k, W.shape[1], W.shape[2])
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense),
        jnp.asarray(Whwio),
        window_strides=(stride,) * 3,
        padding=[(k // 2, k // 2)] * 3 if k == 3 else [(0, 0)] * 3,
        dimension_numbers=("NHWDC"[:1] + "XYZ" + "C", "XYZIO", "N" + "XYZ" + "C"),
    )
    return np.asarray(out)


def test_voxelize_dedup_and_sorted(rng):
    grid, pts, feats, valid = make_grid(rng)
    keys = np.asarray(grid.keys)
    gvalid = np.asarray(grid.valid)
    for b in range(2):
        ks = keys[b][gvalid[b]]
        assert (np.diff(ks) > 0).all(), "keys strictly ascending (dedup'd)"
        assert (keys[b][~gvalid[b]] == KEY_SENTINEL).all()
        # voxel count equals numpy unique count of in-range coords
        c = np.floor(pts[b][valid[b]] / 0.01).astype(np.int64)
        origin = np.asarray(grid.origin[b])
        cc = c - origin
        want = len(np.unique(cc, axis=0))
        assert gvalid[b].sum() == want


def test_voxelize_first_point_wins(rng):
    # two points in the same voxel: representative = lowest original index
    pts = np.array([[[0.005, 0.005, 0.005], [0.006, 0.006, 0.006],
                     [0.051, 0.005, 0.005]]], np.float32)
    feats = np.array([[[1.0], [2.0], [3.0]]], np.float32)
    grid = voxelize(jnp.asarray(pts), jnp.asarray(feats),
                    jnp.ones((1, 3), bool), 0.01, capacity=8,
                    extent=EXTENT, align_stride=8)
    f = np.asarray(grid.features)[0][np.asarray(grid.valid)[0]]
    assert set(f.ravel().tolist()) == {1.0, 3.0}


def test_lookup_hits_and_misses(rng):
    grid, *_ = make_grid(rng)
    keys = grid.keys[0]
    coords = np.asarray(grid.coords[0])
    valid = np.asarray(grid.valid[0])
    nvalid = valid.sum()
    # every valid coord must be found at its own slot
    qk = pack_keys(grid.coords[0], EXTENT)
    qk = jnp.where(grid.valid[0], qk, KEY_SENTINEL)
    idx = np.asarray(lookup(keys, qk))
    np.testing.assert_array_equal(idx[:nvalid], np.arange(nvalid))
    assert (idx[nvalid:] == grid.capacity).all()
    # a coord that's definitely absent
    miss = jnp.asarray([pack_keys(jnp.asarray([31, 31, 15]), EXTENT)])
    assert np.asarray(lookup(keys, miss))[0] in (grid.capacity,
                                                 int(nvalid - 1), grid.capacity)


def test_fast_rank_matches_sort_and_numpy(rng):
    """The block-summary fast lookup/rank must agree exactly with the
    double-sort formulation and numpy searchsorted, including sentinel
    queries, misses, and non-multiple-of-wb table sizes."""
    from vdetr_tpu.ops.voxelize import (lookup_binary, lookup_rank,
                                        lookup_rank_sort, lookup_sort)

    for V, nq in ((1000, 5000), (128, 7), (77, 1000), (4096, 30000)):
        keys = np.unique(
            rng.randint(0, 2 ** 31 - 1, V * 2))[:V].astype(np.int32)
        keys = np.sort(keys)
        q = np.concatenate([
            rng.choice(keys, nq // 2),
            rng.randint(0, 2 ** 31 - 1, nq - nq // 2).astype(np.int32)])
        q[::17] = KEY_SENTINEL
        kj, qj = jnp.asarray(keys), jnp.asarray(q)
        r_np = np.searchsorted(keys, q, side="left")
        np.testing.assert_array_equal(np.asarray(lookup_rank(kj, qj)), r_np)
        np.testing.assert_array_equal(
            np.asarray(lookup_rank_sort(kj, qj)), r_np)
        l_bin = np.asarray(lookup_binary(kj, qj))
        np.testing.assert_array_equal(np.asarray(lookup(kj, qj)), l_bin)
        np.testing.assert_array_equal(np.asarray(lookup_sort(kj, qj)), l_bin)


def test_submanifold_conv_matches_dense(rng):
    grid, *_ = make_grid(rng)
    W = rng.randn(27, 4, 6).astype(np.float32) * 0.2
    out = sparse_conv(grid, jnp.asarray(W), kernel_size=3)
    dense = to_dense(grid)
    ref = dense_conv(dense, W)
    coords = np.asarray(grid.coords)
    valid = np.asarray(grid.valid)
    got = np.asarray(out.features)
    for b in range(2):
        for v in np.where(valid[b])[0][:50]:
            x, y, z = coords[b, v]
            np.testing.assert_allclose(got[b, v], ref[b, x, y, z], atol=1e-4)


def test_strided_conv_matches_dense(rng):
    grid, *_ = make_grid(rng)
    W = rng.randn(27, 4, 6).astype(np.float32) * 0.2
    out = sparse_conv_down(grid, jnp.asarray(W), out_capacity=256,
                           kernel_size=3)
    assert out.stride == 2
    dense = to_dense(grid)
    # dense stride-2 conv with SAME-ish padding: output site o pulls from
    # 2o + {-1,0,1}; emulate by padding 1 then window at 2o
    ref = dense_conv(dense, W, stride=2)
    coords = np.asarray(out.coords)
    valid = np.asarray(out.valid)
    got = np.asarray(out.features)
    for b in range(2):
        for v in np.where(valid[b])[0][:50]:
            x, y, z = coords[b, v]
            np.testing.assert_allclose(got[b, v], ref[b, x, y, z], atol=1e-4)


def test_downsample_coords_are_parents(rng):
    grid, *_ = make_grid(rng)
    down = downsample_grid(grid, 256)
    parents = set()
    coords = np.asarray(grid.coords)
    valid = np.asarray(grid.valid)
    for v in np.where(valid[0])[0]:
        parents.add(tuple(coords[0, v] // 2))
    dc = np.asarray(down.coords[0])[np.asarray(down.valid[0])]
    assert set(map(tuple, dc)) == parents


def test_transpose_conv_matches_manual(rng):
    grid, *_ = make_grid(rng)
    W = rng.randn(27, 4, 8).astype(np.float32) * 0.2
    coarse = sparse_conv_down(grid, jnp.asarray(W), 256, kernel_size=3)
    Wt = rng.randn(8, 8, 4).astype(np.float32) * 0.2
    up = sparse_conv_transpose(coarse, grid, jnp.asarray(Wt))
    assert up.stride == 1
    # manual check: out[f] = W[offset] @ coarse[floor(f/2)]
    ccoords = np.asarray(coarse.coords)
    cfeats = np.asarray(coarse.features)
    cvalid = np.asarray(coarse.valid)
    cmap = {tuple(ccoords[0, v]): cfeats[0, v]
            for v in np.where(cvalid[0])[0]}
    fcoords = np.asarray(grid.coords)
    fvalid = np.asarray(grid.valid)
    got = np.asarray(up.features)
    for v in np.where(fvalid[0])[0][:50]:
        f = fcoords[0, v]
        parent = tuple(f // 2)
        rel = f - np.array(parent) * 2
        k = (rel[0] * 2 + rel[1]) * 2 + rel[2]
        want = cmap[parent] @ Wt[k] if parent in cmap else np.zeros(4)
        np.testing.assert_allclose(got[0, v], want, atol=1e-4)


def test_generative_transpose_covers_children(rng):
    grid, *_ = make_grid(rng)
    W = rng.randn(27, 4, 8).astype(np.float32) * 0.2
    coarse = sparse_conv_down(grid, jnp.asarray(W), 256, kernel_size=3)
    Wt = rng.randn(8, 8, 4).astype(np.float32) * 0.2
    up = sparse_conv_transpose_generative(coarse, jnp.asarray(Wt), 2048)
    # every coarse voxel must produce its 8 children
    nc = int(np.asarray(coarse.valid).sum(1)[0])
    nf = int(np.asarray(up.valid).sum(1)[0])
    assert nf == nc * 8


def test_offsets_order_z_fastest():
    offs = _offsets(3)
    assert offs[0] == (-1, -1, -1)
    assert offs[1] == (-1, -1, 0)
    assert offs[13] == (0, 0, 0)
    assert offs[26] == (1, 1, 1)


def test_bottleneck_resnet50_forward_and_port():
    """Depth-50 Bottleneck stages (reference mink_resnet.py:19-25) run and
    round-trip through the torch checkpoint shim."""
    import jax

    from vdetr_tpu.config import VDETRConfig
    from vdetr_tpu.data import ScannetDatasetConfig
    from vdetr_tpu.models import build_model
    from vdetr_tpu.train import torch_import as ti

    cfg = VDETRConfig(
        depth=50, voxel_capacity=1024, min_stage_capacity=64,
        grid_extent=(64, 64, 32), preenc_npoints=64, nqueries=16,
        dec_nlayers=2, dec_dim=32, dec_ffn_dim=32, rpe_dim=8, inplanes=8,
        enc_dim=32, fps_impl="jax", num_points=512,
    )
    model = build_model(cfg, ScannetDatasetConfig())
    rng = np.random.RandomState(0)
    pts = rng.rand(1, 512, 3).astype(np.float32)
    inputs = {
        "point_clouds": jnp.asarray(pts),
        "point_cloud_dims_min": jnp.asarray(pts.min(1)),
        "point_cloud_dims_max": jnp.asarray(pts.max(1)),
    }
    variables = model.init(jax.random.PRNGKey(0), inputs, train=False)
    out = model.apply(variables, inputs, train=False)
    corners = np.asarray(out["outputs"]["box_corners"])
    assert np.isfinite(corners).all()
    # expansion-4 stage channels reach the FPN/top unchanged
    p = variables["params"]["pre_encoder"]
    assert p["layer1_block0"]["conv3"]["kernel"].shape[-1] == 8 * 4
    assert "norm3" in p["layer1_block0"]

    # exact round trip through the reference state-dict layout
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = ti.build_reference_state_dict(params, stats, cfg)
    assert "pre_encoder.layer1.0.conv3.kernel" in sd
    p2, s2, report = ti.convert_torch_state_dict(sd, cfg)
    assert not report["missing"] and not report["unused"], report
    fa, fb = ti._flatten(params), ti._flatten(p2)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=str(k))
