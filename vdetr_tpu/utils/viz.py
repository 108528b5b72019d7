"""Scene / detection visualization dumps (reference scannet/data_viz.py).

Writes PLY point clouds and OBJ wireframes of boxes so scenes and
detections can be inspected in MeshLab/CloudCompare. plyfile-free (plain
ascii) so it works in minimal environments.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def write_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None):
    """points: (N, 3); colors: optional (N, 3) in 0-255."""
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.4f} {points[i, 1]:.4f} {points[i, 2]:.4f}"
            if colors is not None:
                c = colors[i].astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")


def write_boxes_obj(path: str, corners: np.ndarray):
    """corners: (K, 8, 3) box corner arrays -> OBJ wireframes."""
    with open(path, "w") as f:
        for k in range(len(corners)):
            for v in corners[k]:
                f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for k in range(len(corners)):
            base = k * 8
            for a, b in _BOX_EDGES:
                f.write(f"l {base + a + 1} {base + b + 1}\n")


def dump_scene(out_dir: str, name: str, points: np.ndarray,
               gt_corners: Optional[np.ndarray] = None,
               pred_corners: Optional[np.ndarray] = None,
               colors: Optional[np.ndarray] = None):
    os.makedirs(out_dir, exist_ok=True)
    write_ply(os.path.join(out_dir, f"{name}_pc.ply"), points, colors)
    if gt_corners is not None and len(gt_corners):
        write_boxes_obj(os.path.join(out_dir, f"{name}_gt.obj"), gt_corners)
    if pred_corners is not None and len(pred_corners):
        write_boxes_obj(os.path.join(out_dir, f"{name}_pred.obj"),
                        pred_corners)
