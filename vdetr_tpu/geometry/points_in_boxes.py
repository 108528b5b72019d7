"""Point-in-rotated-box tests (jnp, replaces mmcv.ops.points_in_boxes_all).

Reference usage: criterion.py:279 (encoder point-cls loss) and
utils/ap_calculator.py:92 (remove_empty_box). Boxes are
(cx, cy, cz_bottom, dx, dy, dz, yaw) with yaw about +Z; a point is inside
if its box-local coordinates satisfy |lx| < dx/2, |ly| < dy/2 and
0 <= lz <= dz.
"""

from __future__ import annotations

import jax.numpy as jnp


def points_in_boxes_all(points, boxes):
    """points: (B, N, 3); boxes: (B, T, 7) -> (B, N, T) float 0/1."""
    center = boxes[..., 0:3]  # z is the bottom face
    dims = boxes[..., 3:6]
    yaw = boxes[..., 6]
    d = points[:, :, None, :] - center[:, None, :, :]  # (B, N, T, 3)
    c = jnp.cos(-yaw)[:, None, :]
    s = jnp.sin(-yaw)[:, None, :]
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    lz = d[..., 2]
    inside = (
        (jnp.abs(lx) < dims[:, None, :, 0] * 0.5)
        & (jnp.abs(ly) < dims[:, None, :, 1] * 0.5)
        & (lz >= 0.0)
        & (lz <= dims[:, None, :, 2])
    )
    return inside.astype(jnp.float32)
