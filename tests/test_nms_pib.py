"""Tests for NMS (numpy + device) and points_in_boxes."""

import numpy as np
import jax.numpy as jnp

from vdetr_tpu.geometry import (
    nms_3d_faster_samecls_np,
    nms_3d_faster_np,
    nms_2d_faster_np,
    nms_3d_samecls_mask,
    points_in_boxes_all,
)


def random_boxes8(rng, n):
    lo = rng.randn(n, 3) * 2
    hi = lo + rng.rand(n, 3) * 2 + 0.1
    score = rng.rand(n)
    cls = rng.randint(0, 3, size=n)
    return np.concatenate(
        [lo, hi, score[:, None], cls[:, None].astype(float)], axis=1
    )


def test_device_nms_matches_numpy(rng):
    for trial in range(5):
        boxes = random_boxes8(rng, 40)
        pick = nms_3d_faster_samecls_np(boxes, 0.25)
        keep = np.asarray(
            nms_3d_samecls_mask(
                jnp.asarray(boxes[:, :6]),
                jnp.asarray(boxes[:, 6]),
                jnp.asarray(boxes[:, 7].astype(np.int32)),
                jnp.ones(40, bool),
                0.25,
            )
        )
        want = np.zeros(40, bool)
        want[pick] = True
        np.testing.assert_array_equal(keep, want)


def test_device_nms_respects_valid_mask(rng):
    boxes = random_boxes8(rng, 10)
    valid = np.zeros(10, bool)
    valid[:4] = True
    keep = np.asarray(
        nms_3d_samecls_mask(
            jnp.asarray(boxes[:, :6]),
            jnp.asarray(boxes[:, 6]),
            jnp.asarray(boxes[:, 7].astype(np.int32)),
            jnp.asarray(valid),
            0.25,
        )
    )
    assert not keep[4:].any()


def test_nms_2d_and_3d_basic():
    # two heavily overlapping boxes + one far box
    boxes3d = np.array(
        [
            [0, 0, 0, 1, 1, 1, 0.9],
            [0.05, 0.05, 0.05, 1.05, 1.05, 1.05, 0.8],
            [5, 5, 5, 6, 6, 6, 0.7],
        ]
    )
    pick = nms_3d_faster_np(boxes3d, 0.25)
    assert sorted(pick) == [0, 2]
    boxes2d = np.array([[0, 0, 1, 1, 0.9], [0.05, 0.05, 1.05, 1.05, 0.8],
                        [5, 5, 6, 6, 0.7]])
    pick2 = nms_2d_faster_np(boxes2d, 0.25)
    assert sorted(pick2) == [0, 2]


def test_points_in_boxes_axis_aligned():
    points = jnp.asarray([[[0.0, 0.0, 0.5], [2.0, 0.0, 0.5], [0.0, 0.0, 1.5]]])
    # box centered at origin bottom z=0, size 1x1x1
    boxes = jnp.asarray([[[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]]])
    inside = np.asarray(points_in_boxes_all(points, boxes))
    np.testing.assert_array_equal(inside[0, :, 0], [1.0, 0.0, 0.0])


def test_points_in_boxes_rotated():
    # box rotated 45deg: point at (0.6, 0, 0.5) is inside (diagonal reaches
    # sqrt(2)/2 = 0.707) but outside the unrotated box
    points = jnp.asarray([[[0.6, 0.0, 0.5]]])
    box_rot = jnp.asarray([[[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, np.pi / 4]]])
    box_aa = jnp.asarray([[[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]]])
    assert points_in_boxes_all(points, box_rot)[0, 0, 0] == 1.0
    assert points_in_boxes_all(points, box_aa)[0, 0, 0] == 0.0
