"""ScanNet loader tests on fabricated scan files (no real dataset needed)."""

import os

import numpy as np
import pytest

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data.scannet import ScannetDetectionDataset
from vdetr_tpu.data.random_cuboid import RandomCuboid


@pytest.fixture(scope="module")
def fake_scannet(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    rng = np.random.RandomState(0)
    for i, name in enumerate(["scene0000_00", "scene0001_00", "scene0002_00"]):
        n = 5000 + i * 1000
        verts = np.concatenate(
            [rng.rand(n, 3) * [6, 5, 2.5], rng.rand(n, 3) * 255], axis=1
        ).astype(np.float32)
        nb = 3 if i < 2 else 0  # last scene has no boxes (filt_empty target)
        boxes = np.zeros((nb, 7), np.float32)
        for b in range(nb):
            boxes[b, :3] = rng.rand(3) * 4 + 0.5
            boxes[b, 3:6] = rng.rand(3) * 0.8 + 0.3
            boxes[b, 6] = [3, 4, 5][b]  # nyu40 ids (cabinet, bed, chair)
        np.save(root / f"{name}_vert.npy", verts)
        np.save(root / f"{name}_bbox.npy", boxes)
        np.save(root / f"{name}_sem_label.npy", np.zeros(n, np.int64))
        np.save(root / f"{name}_ins_label.npy", np.zeros(n, np.int64))
    with open(root / "scannetv2_train.txt", "w") as f:
        f.write("scene0000_00\nscene0001_00\nscene0002_00\n")
    with open(root / "scannetv2_val.txt", "w") as f:
        f.write("scene0000_00\nscene0001_00\n")
    return str(root)


def cfg_for(root, **kw):
    base = dict(dataset_root_dir=root, num_points=2048)
    base.update(kw)
    return VDETRConfig(**base)


def test_filt_empty_drops_boxless_scans(fake_scannet):
    ds = ScannetDetectionDataset(cfg_for(fake_scannet), split_set="train")
    assert len(ds) == 2  # scene0002_00 filtered


def test_train_sample_contract(fake_scannet):
    cfg = cfg_for(fake_scannet)
    ds = ScannetDetectionDataset(cfg, split_set="train")
    s = ds.__getitem__(0, rng=np.random.RandomState(1))
    assert s["point_clouds"].shape == (2048, 3)
    assert s["gt_box_corners"].shape == (64, 8, 3)
    assert s["gt_box_present"].sum() == 3
    assert set(s["gt_box_sem_cls_label"][:3].tolist()) == {0, 1, 2}
    # normalized centers in [0, 1] for valid boxes (augs keep boxes inside-ish)
    cn = s["gt_box_centers_normalized"][:3]
    assert np.isfinite(cn).all()
    # corners consistent with centers/sizes
    c = s["gt_box_centers"][0]
    mins = s["gt_box_corners"][0].min(0)
    # camera frame: x_cam = x_world, z_cam = y_world, y_cam = -z_world
    np.testing.assert_allclose(
        (mins[0] + s["gt_box_corners"][0].max(0)[0]) / 2, c[0], atol=1e-4
    )


def test_val_sample_fixed_shape_and_padding(fake_scannet):
    cfg = cfg_for(fake_scannet, num_points=10000)  # more than scene points
    ds = ScannetDetectionDataset(cfg, split_set="val")
    s = ds.__getitem__(0, rng=np.random.RandomState(0))
    assert s["point_clouds"].shape == (10000, 3)
    assert s["point_validity"].sum() < 10000
    # padded points sit at the scene minimum (cannot win FPS or enter boxes)
    pad = s["point_clouds"][~s["point_validity"]]
    want = np.broadcast_to(s["point_cloud_dims_min"], pad.shape)
    np.testing.assert_allclose(pad, want, atol=1e-5)


def test_color_path(fake_scannet):
    cfg = cfg_for(fake_scannet, use_color=True)
    ds = ScannetDetectionDataset(cfg, split_set="train")
    s = ds.__getitem__(0, rng=np.random.RandomState(2))
    assert s["point_clouds"].shape == (2048, 6)
    # normalized colors roughly centered
    assert abs(float(s["point_clouds"][:, 3:].mean())) < 0.5


def test_random_cuboid_keeps_box(fake_scannet, rng):
    pc = rng.rand(50000, 3) * [6, 5, 2.5]
    boxes = np.array([[3.0, 2.5, 1.0, 0.5, 0.5, 0.5, 3]])
    rc = RandomCuboid(min_points=5000)
    new_pc, new_boxes, _ = rc(pc, boxes, rng=rng)
    assert len(new_pc) >= 5000
    assert len(new_boxes) >= 1
