"""Tests for GIoU / rotated IoU against brute-force references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.geometry import (
    box_parametrization_to_corners,
    box3d_vol_corners,
    enclosing_box3d_vol,
    generalized_box3d_iou,
    rotated_intersection_areas,
    diff_diou_rotated_3d,
    box3d_iou_np,
)
from vdetr_tpu.geometry.iou import diff_iou_rotated_3d


def make_corners(centers, sizes, angles):
    return box_parametrization_to_corners(
        jnp.asarray(centers), jnp.asarray(sizes), jnp.asarray(angles)
    )


def aabb_giou_ref(c1, s1, c2, s2):
    """Brute-force axis-aligned 3D GIoU from (center, size) in depth frame."""
    lo1, hi1 = c1 - s1 / 2, c1 + s1 / 2
    lo2, hi2 = c2 - s2 / 2, c2 + s2 / 2
    inter = np.prod(np.clip(np.minimum(hi1, hi2) - np.maximum(lo1, lo2), 0, None))
    v1, v2 = np.prod(s1), np.prod(s2)
    union = v1 + v2 - inter
    enc = np.prod(np.maximum(hi1, hi2) - np.minimum(lo1, lo2))
    return inter / union - (1 - union / enc)


def test_axis_aligned_giou_matches_bruteforce(rng):
    B, K1, K2 = 2, 7, 5
    c1 = rng.randn(B, K1, 3).astype(np.float32)
    s1 = (rng.rand(B, K1, 3) + 0.3).astype(np.float32)
    c2 = rng.randn(B, K2, 3).astype(np.float32)
    s2 = (rng.rand(B, K2, 3) + 0.3).astype(np.float32)
    corners1 = make_corners(c1, s1, np.zeros((B, K1), np.float32))
    corners2 = make_corners(c2, s2, np.zeros((B, K2), np.float32))
    nums_k2 = jnp.asarray([K2, 3])
    giou = np.asarray(
        generalized_box3d_iou(corners1, corners2, nums_k2, rotated_boxes=False)
    )
    for b in range(B):
        for i in range(K1):
            for j in range(K2):
                want = aabb_giou_ref(c1[b, i], s1[b, i], c2[b, j], s2[b, j])
                if j >= int(nums_k2[b]):
                    want = 0.0
                np.testing.assert_allclose(giou[b, i, j], want, atol=2e-4)


def test_volume_from_corners(rng):
    sizes = (rng.rand(1, 4, 3) + 0.2).astype(np.float32)
    corners = make_corners(np.zeros((1, 4, 3), np.float32), sizes,
                           np.zeros((1, 4), np.float32))
    vols = np.asarray(box3d_vol_corners(corners))
    np.testing.assert_allclose(vols[0], sizes[0].prod(-1), rtol=1e-4)


def test_enclosing_vol(rng):
    c1 = rng.randn(1, 3, 3).astype(np.float32)
    s1 = (rng.rand(1, 3, 3) + 0.3).astype(np.float32)
    c2 = rng.randn(1, 4, 3).astype(np.float32)
    s2 = (rng.rand(1, 4, 3) + 0.3).astype(np.float32)
    corners1 = make_corners(c1, s1, np.zeros((1, 3), np.float32))
    corners2 = make_corners(c2, s2, np.zeros((1, 4), np.float32))
    enc = np.asarray(enclosing_box3d_vol(corners1, corners2))
    for i in range(3):
        for j in range(4):
            lo = np.minimum(c1[0, i] - s1[0, i] / 2, c2[0, j] - s2[0, j] / 2)
            hi = np.maximum(c1[0, i] + s1[0, i] / 2, c2[0, j] + s2[0, j] / 2)
            np.testing.assert_allclose(enc[0, i, j], np.prod(hi - lo), rtol=1e-4)


def test_rotated_intersection_bev(rng):
    # two unit squares, one rotated 45 degrees: intersection = 2*(sqrt2-1)^2*...
    # easier canonical case: overlap of unit square with itself shifted by 0.5
    c = np.zeros((1, 2, 3), np.float32)
    c[0, 1, 0] = 0.5
    s = np.ones((1, 2, 3), np.float32)
    a = np.zeros((1, 2), np.float32)
    corners = make_corners(c, s, a)
    rect = corners[..., jnp.array([3, 2, 1, 0]), :][..., jnp.array([0, 2])]
    areas = np.asarray(rotated_intersection_areas(rect, rect))
    np.testing.assert_allclose(areas[0, 0, 1], 0.5, atol=1e-5)
    np.testing.assert_allclose(areas[0, 1, 0], 0.5, atol=1e-5)
    # NOTE: the strict 'inside' predicate (reference parity,
    # utils/box_util.py:405-407) yields 0 for exactly coincident boxes.


def test_rotated_giou_vs_axis_aligned_consistency(rng):
    # with zero angles, the rotated path must agree with the AA fast path
    B, K1, K2 = 1, 4, 4
    c1 = rng.randn(B, K1, 3).astype(np.float32)
    s1 = (rng.rand(B, K1, 3) + 0.3).astype(np.float32)
    c2 = c1 + 0.1 * rng.randn(B, K2, 3).astype(np.float32)
    s2 = (rng.rand(B, K2, 3) + 0.3).astype(np.float32)
    corners1 = make_corners(c1, s1, np.zeros((B, K1), np.float32))
    corners2 = make_corners(c2, s2, np.zeros((B, K2), np.float32))
    aa = np.asarray(generalized_box3d_iou(corners1, corners2, None, False))
    rot = np.asarray(generalized_box3d_iou(corners1, corners2, None, True))
    np.testing.assert_allclose(aa, rot, atol=1e-4)


def test_diff_iou_rotated_3d_axis_aligned(rng):
    # paired boxes with zero yaw: compare against brute-force AABB IoU
    b1 = np.concatenate(
        [rng.randn(1, 6, 3), rng.rand(1, 6, 3) + 0.3, np.zeros((1, 6, 1))], -1
    ).astype(np.float32)
    b2 = np.concatenate(
        [b1[..., :3] + 0.1 * rng.randn(1, 6, 3), rng.rand(1, 6, 3) + 0.3,
         np.zeros((1, 6, 1))], -1
    ).astype(np.float32)
    iou = np.asarray(diff_iou_rotated_3d(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(6):
        c1, s1 = b1[0, i, :3], b1[0, i, 3:6]
        c2, s2 = b2[0, i, :3], b2[0, i, 3:6]
        lo1, hi1 = c1 - s1 / 2, c1 + s1 / 2
        lo2, hi2 = c2 - s2 / 2, c2 + s2 / 2
        inter = np.prod(np.clip(np.minimum(hi1, hi2) - np.maximum(lo1, lo2), 0, None))
        want = inter / (np.prod(s1) + np.prod(s2) - inter)
        np.testing.assert_allclose(iou[0, i], want, atol=1e-4)


def test_diff_iou_rotated_gradient_exists():
    b1 = jnp.asarray([[[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.2]]])
    b2 = jnp.asarray([[[0.2, 0.1, 0.0, 1.0, 1.2, 1.0, -0.1]]])
    g = jax.grad(lambda x: diff_iou_rotated_3d(x, b2).sum())(b1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_diou_less_than_iou():
    b1 = jnp.asarray([[[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]]])
    b2 = jnp.asarray([[[0.5, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]]])
    diou = np.asarray(diff_diou_rotated_3d(b1, b2))
    iou = np.asarray(diff_iou_rotated_3d(b1, b2))
    assert diou[0, 0] < iou[0, 0]


def test_box3d_iou_np_identity_and_disjoint(rng):
    corners = np.asarray(
        make_corners(np.zeros((1, 1, 3), np.float32),
                     np.ones((1, 1, 3), np.float32),
                     np.zeros((1, 1), np.float32))
    )[0, 0]
    iou, iou2d = box3d_iou_np(corners, corners)
    np.testing.assert_allclose(iou, 1.0, atol=1e-6)
    np.testing.assert_allclose(iou2d, 1.0, atol=1e-6)
    corners_far = corners + np.array([10.0, 0, 0])
    iou, _ = box3d_iou_np(corners, corners_far)
    assert iou == 0.0


def test_box3d_iou_np_rotated():
    # unit square vs itself rotated by 45deg about Y (camera frame):
    # intersection area is the regular octagon 2*(sqrt(2)-1)
    c = np.zeros((1, 2, 3), np.float32)
    s = np.ones((1, 2, 3), np.float32)
    a = np.array([[0.0, np.pi / 4]], np.float32)
    corners = np.asarray(make_corners(c, s, a))
    iou, iou2d = box3d_iou_np(corners[0, 0], corners[0, 1])
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    np.testing.assert_allclose(iou2d, want, atol=1e-5)
    np.testing.assert_allclose(iou, want, atol=1e-5)
