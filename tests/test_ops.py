"""Tests for point ops: FPS, gather, grouping, ball query, 3-NN interp."""

import numpy as np
import jax.numpy as jnp

from vdetr_tpu.ops import (
    furthest_point_sample,
    gather_operation,
    grouping_operation,
    ball_query,
    three_nn,
    three_interpolate,
)
from vdetr_tpu.ops.fps import fps_jax, fps_pallas
from vdetr_tpu.ops.interpolate import interpolate_weights


def fps_numpy_reference(xyz, npoint):
    """Direct transcription of the documented CUDA FPS semantics
    (start at 0, greedy max-min, skip |p|^2 <= 1e-3)."""
    n = xyz.shape[0]
    temp = np.full(n, 1e10, np.float64)
    mag = (xyz.astype(np.float64) ** 2).sum(-1)
    skip = mag <= 1e-3
    idxs = np.zeros(npoint, np.int64)
    old = 0
    for j in range(1, npoint):
        d = ((xyz.astype(np.float64) - xyz[old]) ** 2).sum(-1)
        d2 = np.minimum(d, temp)
        temp = np.where(skip, temp, d2)
        cand = np.where(skip, -1.0, d2)
        old = int(np.argmax(cand))
        idxs[j] = old
    return idxs


def test_fps_matches_reference_semantics(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32) + 2.0  # away from origin
    got = np.asarray(fps_jax(jnp.asarray(xyz), 16))
    for b in range(2):
        want = fps_numpy_reference(xyz[b], 16)
        np.testing.assert_array_equal(got[b], want)


def test_fps_skips_zero_padding(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32) + 2.0
    xyz[0, 20:] = 0.0  # padding
    got = np.asarray(fps_jax(jnp.asarray(xyz), 12))
    assert (got < 20).all(), "padded (zero) points must never be selected"
    # all selected indices distinct when enough valid points exist
    assert len(set(got[0].tolist())) == 12


def test_fps_pallas_interpret_matches_jax(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32) + 1.5
    xyz[0, 100:] = 0.0
    a = np.asarray(fps_jax(jnp.asarray(xyz), 32))
    b = np.asarray(fps_pallas(jnp.asarray(xyz), 32, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_gather_and_grouping(rng):
    feats = rng.randn(2, 4, 10).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 5)).astype(np.int32)
    out = np.asarray(gather_operation(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], feats[b][:, idx[b]])
    gidx = rng.randint(0, 10, size=(2, 3, 4)).astype(np.int32)
    gout = np.asarray(grouping_operation(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        for p in range(3):
            np.testing.assert_allclose(gout[b, :, p], feats[b][:, gidx[b, p]])


def test_ball_query_first_hits_and_padding(rng):
    xyz = rng.rand(1, 50, 3).astype(np.float32)
    centers = xyz[:, :4] + 0.01
    idx = np.asarray(ball_query(0.2, 8, jnp.asarray(xyz), jnp.asarray(centers)))
    d2 = ((centers[0, :, None] - xyz[0, None]) ** 2).sum(-1)
    for q in range(4):
        hits = np.where(d2[q] < 0.04)[0]
        k = min(8, len(hits))
        np.testing.assert_array_equal(idx[0, q, :k], hits[:k])
        if len(hits) < 8:  # padded with first hit
            assert (idx[0, q, k:] == hits[0]).all()


def test_ball_query_no_hits():
    xyz = jnp.ones((1, 10, 3))
    centers = jnp.zeros((1, 1, 3)) - 100.0
    idx = np.asarray(ball_query(0.1, 4, xyz, centers))
    np.testing.assert_array_equal(idx, 0)


def test_three_nn_and_interpolate(rng):
    known = rng.rand(1, 20, 3).astype(np.float32)
    unknown = rng.rand(1, 7, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    dist, idx = np.asarray(dist), np.asarray(idx)
    d2 = ((unknown[0, :, None] - known[0, None]) ** 2).sum(-1)
    for q in range(7):
        want = np.sort(d2[q])[:3]
        np.testing.assert_allclose(dist[0, q] ** 2, want, rtol=1e-4)
    feats = rng.randn(1, 5, 20).astype(np.float32)
    w = interpolate_weights(jnp.asarray(dist))
    out = np.asarray(
        three_interpolate(jnp.asarray(feats), jnp.asarray(idx), w)
    )
    wn = np.asarray(w)
    for q in range(7):
        want = (feats[0][:, idx[0, q]] * wn[0, q][None, :]).sum(-1)
        np.testing.assert_allclose(out[0, :, q], want, rtol=1e-4)
