"""Input-pipeline throughput bench (VERDICT r2 item 9).

Fabricates ScanNet-layout scans on disk (150k-point clouds, instance/
semantic labels, boxes), then measures:
  - single-thread ScannetDetectionDataset.__getitem__ rate with the FULL
    train augmentation stack (RandomCuboid, 100k resample, flips/rot/
    translate/scale, color drop+contrast+jitter+HSV),
  - prefetch_loader throughput at several worker counts.

Target: comfortably above the device eval/train rate (>= 2x the 50
scenes/sec/chip BASELINE target when scaled across a host's cores).

Usage: python tools/loader_bench.py   (pure numpy/host; no jax needed)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data.loader import prefetch_loader
from vdetr_tpu.data.scannet import ScannetDetectionDataset


def fabricate(root, n_scans=16, n_points=150000, seed=0):
    rng = np.random.RandomState(seed)
    names = []
    for i in range(n_scans):
        name = f"scene{i:04d}_00"
        pts = rng.rand(n_points, 3).astype(np.float32) * [8, 6, 3]
        rgb = rng.randint(0, 256, (n_points, 3)).astype(np.float32)
        verts = np.concatenate([pts, rgb], axis=1)
        nbox = rng.randint(4, 20)
        centers = rng.rand(nbox, 3).astype(np.float32) * [7, 5, 2.5]
        sizes = rng.rand(nbox, 3).astype(np.float32) * 1.5 + 0.3
        cls = rng.choice([3, 4, 5, 6, 7, 8, 9, 10], nbox)
        bbox = np.concatenate(
            [centers, sizes, cls[:, None].astype(np.float32)], axis=1)
        ins = rng.randint(0, nbox + 1, n_points).astype(np.int64)
        sem = rng.choice([1, 2, 3, 4, 39, 40], n_points).astype(np.int64)
        np.save(os.path.join(root, name + "_vert.npy"), verts)
        np.save(os.path.join(root, name + "_ins_label.npy"), ins)
        np.save(os.path.join(root, name + "_sem_label.npy"), sem)
        np.save(os.path.join(root, name + "_bbox.npy"), bbox)
        names.append(name)
    with open(os.path.join(root, "scannetv2_train.txt"), "w") as f:
        f.write("\n".join(names))
    return names


def main():
    out = {}
    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        fabricate(root)
        out["fabricate_s"] = round(time.time() - t0, 2)
        cfg = VDETRConfig(
            dataset_root_dir=root, use_color=True, color_drop=0.2,
            color_contrastp=0.2, color_jitterp=0.2, hue_sat="0.5_0.2_1.0",
        )
        ds = ScannetDetectionDataset(cfg, split_set="train", augment=True)

        # single-thread item rate
        n = 24
        t0 = time.time()
        for i in range(n):
            ds[i % len(ds)]
        dt = time.time() - t0
        out["getitem_ms"] = round(dt / n * 1000, 1)
        out["single_thread_scenes_per_sec"] = round(n / dt, 1)

        for nw in (4, 8):
            t0 = time.time()
            count = 0
            for batch in prefetch_loader(ds, batch_size=4, shuffle=True,
                                         num_workers=nw,
                                         prefetch_batches=4):
                count += batch["point_clouds"].shape[0]
            dt = time.time() - t0
            out[f"loader_scenes_per_sec_w{nw}"] = round(count / dt, 1)
        out["cpu_count"] = os.cpu_count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
