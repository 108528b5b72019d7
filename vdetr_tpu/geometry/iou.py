"""3D IoU / GIoU math.

Device path (jnp, jit-friendly, static shapes):
  - generalized_box3d_iou: corner-based GIoU used by the matcher/criterion.
    Axis-aligned fast path exactly reproduces the reference semantics
    (utils/box_util.py:523-624); the rotated path replaces the reference's
    per-pair Python Sutherland-Hodgman loops (utils/box_util.py:582-604)
    with a fixed-buffer, fully vectorized clip.
  - diff_diou_rotated_3d: differentiable rotated DIoU (criterion.py:25-70,
    re-expressing mmcv.ops.diff_iou_rotated internals in jnp).

Host path (numpy, used by the VoteNet-protocol AP evaluator):
  - box3d_iou_np: exact rotated 3D IoU via convex polygon clipping
    (utils/box_util.py:122-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8
VOL_EPS = 1e-6
_MAXV = 16  # max vertices while clipping a quad by a quad (8 needed)


def box3d_vol_corners(corners):
    """(..., 8, 3) corners -> (...,) volume as edge-length product.

    Reference: utils/box_util.py:449-469 (clamps squared edge length at 1e-6).
    """
    a = jnp.sqrt(
        jnp.clip(((corners[..., 0, :] - corners[..., 1, :]) ** 2).sum(-1), VOL_EPS)
    )
    b = jnp.sqrt(
        jnp.clip(((corners[..., 1, :] - corners[..., 2, :]) ** 2).sum(-1), VOL_EPS)
    )
    c = jnp.sqrt(
        jnp.clip(((corners[..., 0, :] - corners[..., 4, :]) ** 2).sum(-1), VOL_EPS)
    )
    return a * b * c


def enclosing_box3d_vol(corners1, corners2):
    """Volume of the axis-aligned box enclosing each (k1, k2) pair.

    corners1: (B, K1, 8, 3); corners2: (B, K2, 8, 3) -> (B, K1, K2).
    Reference: utils/box_util.py:472-520 (the Y-flip there reduces to plain
    per-axis union extents, which is what we compute).
    """
    mn1 = corners1.min(axis=2)  # (B, K1, 3)
    mx1 = corners1.max(axis=2)
    mn2 = corners2.min(axis=2)  # (B, K2, 3)
    mx2 = corners2.max(axis=2)
    lo = jnp.minimum(mn1[:, :, None, :], mn2[:, None, :, :])
    hi = jnp.maximum(mx1[:, :, None, :], mx2[:, None, :, :])
    d = jnp.abs(hi - lo)
    return d[..., 0] * d[..., 1] * d[..., 2]


def _bev_rects(corners):
    """Camera-frame corners (..., 8, 3) -> CCW BEV rects (..., 4, 2) in (x, z).

    Reference: utils/box_util.py:555-560 (corners[..., [3,2,1,0], :][..., [0,2]]).
    """
    rect = corners[..., jnp.array([3, 2, 1, 0]), :]
    return rect[..., jnp.array([0, 2])]


def _clip_quad_quad(subject, clip):
    """Sutherland-Hodgman clip of quad `subject` by convex CCW quad `clip`.

    Both (4, 2). Returns intersection area (scalar). Uses strict 'inside'
    (>) to match reference utils/box_util.py:405-407.
    """
    dt = subject.dtype
    poly = jnp.zeros((_MAXV, 2), dt).at[:4].set(subject)
    n = jnp.asarray(4, jnp.int32)

    def clip_edge(carry, edge_idx):
        poly, n = carry
        cp1 = clip[(edge_idx + 3) % 4]
        cp2 = clip[edge_idx]
        d = cp2 - cp1

        def inside(p):
            return d[0] * (p[..., 1] - cp1[1]) > d[1] * (p[..., 0] - cp1[0])

        def intersect(s, e):
            dp = s - e
            n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
            n2 = s[0] * e[1] - s[1] * e[0]
            n3 = 1.0 / (d[0] * (-dp[1]) - d[1] * (-dp[0]) + 1e-30)
            # mirror of reference helper_computeIntersection with
            # dc = cp1-cp2 = -d, dp = s-e
            dc = -d
            n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0] + 1e-30)
            return jnp.stack(
                [(n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3]
            )

        out = jnp.zeros((_MAXV, 2), dt)
        m = jnp.asarray(0, jnp.int32)
        # s = last valid vertex
        s0 = poly[jnp.maximum(n - 1, 0)]

        def body(i, carry):
            out, m, s = carry
            valid = i < n
            e = poly[i]
            ins_e = inside(e)
            ins_s = inside(s)
            x = intersect(s, e)
            # append intersection when crossing the edge
            add_x = valid & (ins_e != ins_s)
            out = out.at[m].set(jnp.where(add_x, x, out[m]))
            m = m + add_x.astype(jnp.int32)
            # append e when inside
            add_e = valid & ins_e
            out = out.at[m].set(jnp.where(add_e, e, out[m]))
            m = m + add_e.astype(jnp.int32)
            s = jnp.where(valid, e, s)
            return out, m, s

        out, m, _ = jax.lax.fori_loop(0, _MAXV, body, (out, m, s0))
        return (out, m), None

    (poly, n), _ = jax.lax.scan(clip_edge, (poly, n), jnp.arange(4))

    # shoelace over the n valid vertices
    idx = jnp.arange(_MAXV)
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    x, y = poly[:, 0], poly[:, 1]
    contrib = x * y[nxt] - y * x[nxt]
    contrib = jnp.where(idx < n, contrib, 0.0)
    area = 0.5 * jnp.abs(contrib.sum())
    return jnp.where(n >= 3, area, jnp.zeros((), dt))


def rotated_intersection_areas(rect1, rect2):
    """BEV intersection areas for all pairs.

    rect1: (B, K1, 4, 2); rect2: (B, K2, 4, 2) -> (B, K1, K2).
    Fully vectorized replacement of reference utils/box_util.py:582-604.
    """
    f = jax.vmap(  # over K2
        jax.vmap(  # over K1
            _clip_quad_quad, in_axes=(0, None)
        ),
        in_axes=(None, 0),
        out_axes=1,
    )
    return jax.vmap(f)(rect1, rect2)


def generalized_box3d_iou(
    corners1,
    corners2,
    nums_k2=None,
    rotated_boxes: bool = False,
    return_inter_vols_only: bool = False,
):
    """Corner-based GIoU matrix (B, K1, K2).

    corners1 (B,K1,8,3) predictions, corners2 (B,K2,8,3) GT, both in the
    camera frame (Y down). nums_k2 (B,) masks GT columns >= count.
    Reference: utils/box_util.py:523-624, 723-743.
    """
    B, K1 = corners1.shape[:2]
    K2 = corners2.shape[1]

    # height overlap along camera Y (corner 0 top, corner 4 bottom)
    ymax = jnp.minimum(
        corners1[:, :, 0, 1][:, :, None], corners2[:, :, 0, 1][:, None, :]
    )
    ymin = jnp.maximum(
        corners1[:, :, 4, 1][:, :, None], corners2[:, :, 4, 1][:, None, :]
    )
    height = jnp.clip(ymax - ymin, 0.0)

    rect1 = _bev_rects(corners1)
    rect2 = _bev_rects(corners2)

    # axis-aligned BEV overlap: rect[:, 1] is the min corner, rect[:, 3] max
    lt = jnp.maximum(rect1[:, :, None, 1, :], rect2[:, None, :, 1, :])
    rb = jnp.minimum(rect1[:, :, None, 3, :], rect2[:, None, :, 3, :])
    wh = jnp.clip(rb - lt, 0.0)
    non_rot_inter_areas = wh[..., 0] * wh[..., 1]

    if nums_k2 is not None:
        k2_mask = jnp.arange(K2)[None, :] < nums_k2[:, None]  # (B, K2)
        non_rot_inter_areas = non_rot_inter_areas * k2_mask[:, None, :]

    enclosing_vols = enclosing_box3d_vol(corners1, corners2)
    vols1 = jnp.clip(box3d_vol_corners(corners1), EPS)
    vols2 = jnp.clip(box3d_vol_corners(corners2), EPS)
    sum_vols = vols1[:, :, None] + vols2[:, None, :]
    good_boxes = (enclosing_vols > 2 * EPS) & (sum_vols > 4 * EPS)

    if rotated_boxes:
        inter_areas = rotated_intersection_areas(rect1, rect2)
        # reference skips pairs whose AABB overlap is zero
        inter_areas = jnp.where(non_rot_inter_areas > 0, inter_areas, 0.0)
    else:
        inter_areas = non_rot_inter_areas

    inter_vols = inter_areas * height
    if return_inter_vols_only:
        return inter_vols

    union_vols = jnp.clip(sum_vols - inter_vols, EPS)
    ious = inter_vols / union_vols
    gious = ious - (1.0 - union_vols / enclosing_vols)
    gious = gious * good_boxes
    if nums_k2 is not None:
        gious = gious * k2_mask[:, None, :]
    return gious


# --------------------------------------------------------------------------
# Differentiable rotated IoU (mmcv diff_iou_rotated_3d re-expression)
# --------------------------------------------------------------------------

def box2corners_bev(box5):
    """(..., 5) (x, y, w, h, alpha) -> (..., 4, 2) BEV corners."""
    x, y, w, h, a = (box5[..., i] for i in range(5))
    sx = jnp.asarray([0.5, -0.5, -0.5, 0.5], box5.dtype)
    sy = jnp.asarray([-0.5, -0.5, 0.5, 0.5], box5.dtype)
    cx = w[..., None] * sx
    cy = h[..., None] * sy
    c, s = jnp.cos(a)[..., None], jnp.sin(a)[..., None]
    rx = cx * c - cy * s + x[..., None]
    ry = cx * s + cy * c + y[..., None]
    return jnp.stack([rx, ry], axis=-1)


def _convex_area_from_candidates(pts, mask):
    """Area of the convex polygon through the masked candidate points.

    pts: (N, 2), mask: (N,) bool. Sorts valid points by angle around their
    mean and applies the shoelace formula (the standard differentiable
    rotated-IoU construction).
    """
    num = jnp.maximum(mask.sum(), 1)
    mean = (pts * mask[:, None]).sum(0) / num
    d = pts - mean
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    ang = jnp.where(mask, ang, 1e9)  # invalid points sort last
    order = jnp.argsort(ang)
    p = pts[order]
    m = mask[order]
    n = mask.sum()
    idx = jnp.arange(pts.shape[0])
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    x, y = p[:, 0], p[:, 1]
    contrib = jnp.where(m, x * y[nxt] - y * x[nxt], 0.0)
    area = 0.5 * jnp.abs(contrib.sum())
    return jnp.where(n >= 3, area, 0.0)


def _pair_intersection_area(c1, c2):
    """Intersection area of two convex quads c1, c2: (4, 2) each."""
    # candidate 1: corners of c1 inside c2 and vice versa
    def inside_quad(p, quad):
        # works for either orientation: consistent sign of cross products
        a = quad
        b = jnp.roll(quad, -1, axis=0)
        cross = (b[:, 0] - a[:, 0]) * (p[1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
            p[0] - a[:, 0]
        )
        return (cross >= -1e-9).all() | (cross <= 1e-9).all()

    in12 = jax.vmap(lambda p: inside_quad(p, c2))(c1)
    in21 = jax.vmap(lambda p: inside_quad(p, c1))(c2)

    # candidate 2: the 16 edge-pair intersections
    a1 = c1
    b1 = jnp.roll(c1, -1, axis=0)
    a2 = c2
    b2 = jnp.roll(c2, -1, axis=0)

    def seg_isect(p1, p2, p3, p4):
        d1 = p2 - p1
        d2 = p4 - p3
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((p3[0] - p1[0]) * d2[1] - (p3[1] - p1[1]) * d2[0]) / (denom + 1e-30)
        u = ((p3[0] - p1[0]) * d1[1] - (p3[1] - p1[1]) * d1[0]) / (denom + 1e-30)
        ok = (jnp.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        return p1 + t * d1, ok

    def edge_pairs(i, j):
        return seg_isect(a1[i], b1[i], a2[j], b2[j])

    ii, jj = jnp.meshgrid(jnp.arange(4), jnp.arange(4), indexing="ij")
    ipts, iok = jax.vmap(jax.vmap(edge_pairs))(ii, jj)
    ipts = ipts.reshape(16, 2)
    iok = iok.reshape(16)

    pts = jnp.concatenate([c1, c2, ipts], axis=0)  # (24, 2)
    mask = jnp.concatenate([in12, in21, iok], axis=0)
    return _convex_area_from_candidates(pts, mask)


def oriented_box_intersection_2d(corners1, corners2):
    """(..., 4, 2) x (..., 4, 2) -> (...,) intersection areas."""
    flat1 = corners1.reshape(-1, 4, 2)
    flat2 = corners2.reshape(-1, 4, 2)
    areas = jax.vmap(_pair_intersection_area)(flat1, flat2)
    return areas.reshape(corners1.shape[:-2])


def diff_iou_rotated_3d(box3d1, box3d2):
    """Differentiable rotated 3D IoU of paired boxes (..., 7).

    Boxes are (x, y, z_center, dx, dy, dz, yaw). Reference semantics:
    mmcv.ops.diff_iou_rotated_3d as used at criterion.py:627-628.
    """
    box1 = box3d1[..., jnp.array([0, 1, 3, 4, 6])]
    box2 = box3d2[..., jnp.array([0, 1, 3, 4, 6])]
    corners1 = box2corners_bev(box1)
    corners2 = box2corners_bev(box2)
    inter = oriented_box_intersection_2d(corners1, corners2)
    zmax1 = box3d1[..., 2] + box3d1[..., 5] * 0.5
    zmin1 = box3d1[..., 2] - box3d1[..., 5] * 0.5
    zmax2 = box3d2[..., 2] + box3d2[..., 5] * 0.5
    zmin2 = box3d2[..., 2] - box3d2[..., 5] * 0.5
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), 0.0)
    inter3d = inter * z_overlap
    vol1 = box3d1[..., 3] * box3d1[..., 4] * box3d1[..., 5]
    vol2 = box3d2[..., 3] * box3d2[..., 4] * box3d2[..., 5]
    union3d = vol1 + vol2 - inter3d
    return inter3d / jnp.clip(union3d, 1e-8)


def diff_diou_rotated_3d(box3d1, box3d2):
    """Differentiable rotated 3D DIoU. Reference: criterion.py:25-70."""
    iou = diff_iou_rotated_3d(box3d1, box3d2)
    box1 = box3d1[..., jnp.array([0, 1, 3, 4, 6])]
    box2 = box3d2[..., jnp.array([0, 1, 3, 4, 6])]
    corners1 = box2corners_bev(box1)
    corners2 = box2corners_bev(box2)
    zmax1 = box3d1[..., 2] + box3d1[..., 5] * 0.5
    zmin1 = box3d1[..., 2] - box3d1[..., 5] * 0.5
    zmax2 = box3d2[..., 2] + box3d2[..., 5] * 0.5
    zmin2 = box3d2[..., 2] - box3d2[..., 5] * 0.5

    x_max = jnp.maximum(corners1[..., 0].max(-1), corners2[..., 0].max(-1))
    x_min = jnp.minimum(corners1[..., 0].min(-1), corners2[..., 0].min(-1))
    y_max = jnp.maximum(corners1[..., 1].max(-1), corners2[..., 1].max(-1))
    y_min = jnp.minimum(corners1[..., 1].min(-1), corners2[..., 1].min(-1))
    z_max = jnp.maximum(zmax1, zmax2)
    z_min = jnp.minimum(zmin1, zmin2)

    # NOTE(reference quirk): criterion.py:67 computes the center distance
    # over (x, y, w) because box1[..., :3] slices the 5-tuple (x, y, w, h, a).
    # We reproduce it for parity.
    r2 = ((box1[..., :3] - box2[..., :3]) ** 2).sum(-1)
    c2 = (x_min - x_max) ** 2 + (y_min - y_max) ** 2 + (z_min - z_max) ** 2
    return iou - r2 / jnp.clip(c2, 1e-8)


# --------------------------------------------------------------------------
# Exact numpy IoU for the AP evaluator (host side)
# --------------------------------------------------------------------------

def _polygon_clip_np(subject, clip):
    """Sutherland-Hodgman in numpy; subject/clip lists of (x, y), clip CCW.

    Returns vertex list or None. Mirrors utils/box_util.py:37-84.
    """
    def inside(p, cp1, cp2):
        return (cp2[0] - cp1[0]) * (p[1] - cp1[1]) > (cp2[1] - cp1[1]) * (
            p[0] - cp1[0]
        )

    def intersection(cp1, cp2, s, e):
        dc = (cp1[0] - cp2[0], cp1[1] - cp2[1])
        dp = (s[0] - e[0], s[1] - e[1])
        n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
        n2 = s[0] * e[1] - s[1] * e[0]
        n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
        return ((n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3)

    output = list(subject)
    cp1 = clip[-1]
    for cp2 in clip:
        inp = output
        output = []
        if not inp:
            return None
        s = inp[-1]
        for e in inp:
            if inside(e, cp1, cp2):
                if not inside(s, cp1, cp2):
                    output.append(intersection(cp1, cp2, s, e))
                output.append(e)
            elif inside(s, cp1, cp2):
                output.append(intersection(cp1, cp2, s, e))
            s = e
        cp1 = cp2
        if not output:
            return None
    return output


def _poly_area_np(pts):
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def box3d_iou_np(corners1: np.ndarray, corners2: np.ndarray):
    """Exact rotated 3D IoU of two camera-frame corner boxes (8, 3).

    Reference: utils/box_util.py:122-147 (up direction is negative Y).
    Returns (iou3d, iou2d).
    """
    rect1 = [(corners1[i, 0], corners1[i, 2]) for i in range(3, -1, -1)]
    rect2 = [(corners2[i, 0], corners2[i, 2]) for i in range(3, -1, -1)]
    area1 = _poly_area_np(rect1)
    area2 = _poly_area_np(rect2)
    inter = _polygon_clip_np(rect1, rect2)
    inter_area = _poly_area_np(inter) if inter else 0.0
    iou_2d = inter_area / (area1 + area2 - inter_area)
    ymax = min(corners1[0, 1], corners2[0, 1])
    ymin = max(corners1[4, 1], corners2[4, 1])
    inter_vol = inter_area * max(0.0, ymax - ymin)

    def vol(c):
        a = np.sqrt(((c[0] - c[1]) ** 2).sum())
        b = np.sqrt(((c[1] - c[2]) ** 2).sum())
        h = np.sqrt(((c[0] - c[4]) ** 2).sum())
        return a * b * h

    v1, v2 = vol(corners1), vol(corners2)
    iou = inter_vol / (v1 + v2 - inter_vol)
    return iou, iou_2d
