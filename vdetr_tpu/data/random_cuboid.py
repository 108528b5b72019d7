"""RandomCuboid crop augmentation (reference utils/random_cuboid.py:38-98).

Up to 100 tries to find a crop covering 50-100% of the xy-range with
aspect >= 0.8 that keeps >= min_points points and at least one box center;
falls back to the full scene.
"""

from __future__ import annotations

import numpy as np


def _check_aspect(crop_range, aspect_min):
    xy = crop_range[[0, 1]]
    xz = crop_range[[0, 2]]
    yz = crop_range[[1, 2]]
    return (
        (xy.min() / xy.max()) >= aspect_min
        or (xz.min() / xz.max()) >= aspect_min
        or (yz.min() / yz.max()) >= aspect_min
    )


class RandomCuboid:
    def __init__(self, min_points: int, aspect: float = 0.8,
                 min_crop: float = 0.5, max_crop: float = 1.0):
        self.min_points = min_points
        self.aspect = aspect
        self.min_crop = min_crop
        self.max_crop = max_crop

    def __call__(self, point_cloud, target_boxes, per_point_labels=None,
                 rng: np.random.RandomState = None):
        rng = rng or np.random
        range_xyz = (
            point_cloud[:, 0:3].max(axis=0) - point_cloud[:, 0:3].min(axis=0)
        )
        for _ in range(100):
            crop = (
                self.min_crop
                + rng.rand(3) * (self.max_crop - self.min_crop)
            )
            if not _check_aspect(crop, self.aspect):
                continue
            sample_center = (
                point_cloud[rng.randint(len(point_cloud)), 0:3]
            )
            new_range = range_xyz * crop / 2.0
            lo = sample_center - new_range
            hi = sample_center + new_range
            keep = np.all(point_cloud[:, 0:3] >= lo, axis=1) & np.all(
                point_cloud[:, 0:3] <= hi, axis=1
            )
            if keep.sum() < self.min_points:
                continue
            if target_boxes is not None and len(target_boxes) > 0:
                centers = target_boxes[:, 0:3]
                box_keep = np.all(centers >= lo, axis=1) & np.all(
                    centers <= hi, axis=1
                )
                if box_keep.sum() == 0:
                    continue
                new_boxes = target_boxes[box_keep]
            else:
                new_boxes = target_boxes
            new_pc = point_cloud[keep]
            new_labels = None
            if per_point_labels is not None:
                new_labels = [lab[keep] for lab in per_point_labels]
            return new_pc, new_boxes, new_labels
        return point_cloud, target_boxes, per_point_labels
