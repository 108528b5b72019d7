"""Box parametrization and coordinate-frame utilities (pure jnp).

Reproduces the geometry conventions of the reference (utils/box_util.py,
utils/pc_util.py, datasets/scannet.py:168-199) in vectorized, jit-friendly
form. All functions accept arbitrary leading batch dims and never use
Python-level data-dependent control flow.

Frames:
  depth frame:  X-right, Y-forward, Z-up        (the point clouds)
  camera frame: X-right, Y-down,   Z-forward    (box corners live here)
  "lidar" frame (reference convert_corners_camera2lidar): back to depth.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flip_axis_to_camera(pc):
    """Depth (X,Y,Z) -> camera (X,-Z,Y). Reference: utils/box_util.py:261-268."""
    return jnp.stack([pc[..., 0], -pc[..., 2], pc[..., 1]], axis=-1)


def flip_axis_to_depth(pc):
    """Camera (X,Y,Z) -> depth (X,Z,-Y). Reference: utils/ap_calculator.py:32-36."""
    return jnp.stack([pc[..., 0], pc[..., 2], -pc[..., 1]], axis=-1)


def convert_corners_camera2lidar(corners):
    """Camera corners -> depth/world corners: (x, z, -y).

    Reference: models/vdetr_transformer.py:98-102 (in-place y*=-1 then
    axis swap [0,2,1]).
    """
    return jnp.stack(
        [corners[..., 0], corners[..., 2], -corners[..., 1]], axis=-1
    )


def roty_batch(t):
    """(...,) angles -> (...,3,3) rotation about +Y. Reference: utils/box_util.py:226-240."""
    c, s = jnp.cos(t), jnp.sin(t)
    z = jnp.zeros_like(t)
    o = jnp.ones_like(t)
    rows = jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rotz_batch(t):
    """(...,) angles -> (...,3,3) rotation about +Z (used by augs/points-in-box)."""
    c, s = jnp.cos(t), jnp.sin(t)
    z = jnp.zeros_like(t)
    o = jnp.ones_like(t)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


# Corner sign pattern: x uses box_size[...,0] (l), y uses box_size[...,2] (h),
# z uses box_size[...,1] (w). Reference: utils/box_util.py:271-291.
_CORNER_SIGNS_X = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32)
_CORNER_SIGNS_Y = np.array([1, 1, 1, 1, -1, -1, -1, -1], np.float32)
_CORNER_SIGNS_Z = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float32)


def get_3d_box_batch(box_size, angle, center):
    """Corners of boxes in the *camera* frame.

    box_size: (..., 3) (l, w, h); angle: (...,) heading about camera +Y;
    center: (..., 3) camera-frame center. Returns (..., 8, 3).
    Reference: utils/box_util.py:319-358 (get_3d_box_batch_tensor).
    """
    l = box_size[..., 0:1] * 0.5
    w = box_size[..., 1:2] * 0.5
    h = box_size[..., 2:3] * 0.5
    sx = jnp.asarray(_CORNER_SIGNS_X, box_size.dtype)
    sy = jnp.asarray(_CORNER_SIGNS_Y, box_size.dtype)
    sz = jnp.asarray(_CORNER_SIGNS_Z, box_size.dtype)
    corners = jnp.stack([l * sx, h * sy, w * sz], axis=-1)  # (..., 8, 3)
    R = roty_batch(angle)  # (..., 3, 3)
    # corners @ R^T via broadcasted multiply-add: tiny 3-vector rotations
    # stay on the VPU at full fp32 (no MXU low-precision pass).
    corners = (corners[..., None, :] * R[..., None, :, :]).sum(-1)
    return corners + center[..., None, :]


def box_parametrization_to_corners(center_unnorm, box_size, box_angle):
    """(center in depth frame, size, angle) -> camera-frame corners.

    Reference: datasets/scannet.py:168-171 (flip center to camera, then
    get_3d_box_batch).
    """
    center_cam = flip_axis_to_camera(center_unnorm)
    return get_3d_box_batch(box_size, box_angle, center_cam)


def shift_scale_points(pred_xyz, src_range, dst_range=None):
    """Map points from src_range ([min,max] pair of (B,3)) to dst_range.

    Reference: utils/pc_util.py:38-67.
    """
    if dst_range is None:
        dst_range = [
            jnp.zeros_like(src_range[0]),
            jnp.ones_like(src_range[0]),
        ]
    src_diff = src_range[1][:, None, :] - src_range[0][:, None, :]
    dst_diff = dst_range[1][:, None, :] - dst_range[0][:, None, :]
    return (
        (pred_xyz - src_range[0][:, None, :]) * dst_diff / src_diff
        + dst_range[0][:, None, :]
    )


def scale_points(pred_xyz, mult_factor):
    """Reference: utils/pc_util.py:70-74."""
    return pred_xyz * mult_factor[:, None, :]


def rotate_aligned_boxes_np(input_boxes: np.ndarray, rot_mat: np.ndarray):
    """Rotate axis-aligned (cx,cy,cz,dx,dy,dz) boxes; keep them axis aligned
    by taking the rotated-corner extents. numpy (data pipeline).

    Reference: datasets/scannet.py:178-199.
    """
    centers, lengths = input_boxes[:, 0:3], input_boxes[:, 3:6]
    new_centers = centers @ rot_mat.T
    dx, dy = lengths[:, 0] / 2.0, lengths[:, 1] / 2.0
    corners = np.stack(
        [
            np.stack([sx * dx, sy * dy, np.zeros_like(dx)], axis=1)
            for sx, sy in [(-1, -1), (1, -1), (1, 1), (-1, 1)]
        ],
        axis=1,
    )  # (N, 4, 3)
    crnrs = corners @ rot_mat.T
    new_dx = 2.0 * crnrs[..., 0].max(axis=1)
    new_dy = 2.0 * crnrs[..., 1].max(axis=1)
    new_lengths = np.stack([new_dx, new_dy, lengths[:, 2]], axis=1)
    return np.concatenate([new_centers, new_lengths], axis=1)
