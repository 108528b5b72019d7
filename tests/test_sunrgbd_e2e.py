"""SUN RGB-D end-to-end (BASELINE config 2): oriented boxes, 12 angle
bins, angle heads + rotated IoU through train -> eval -> metrics via the
real CLI. The reference advertises SUN RGB-D but ships no loader
(datasets/__init__.py:2)."""

import os

import numpy as np
import pytest

from vdetr_tpu.data.dataset_config import SunrgbdDatasetConfig


@pytest.fixture(scope="module")
def fake_sunrgbd(tmp_path_factory):
    root = tmp_path_factory.mktemp("sunrgbd")
    rng = np.random.RandomState(11)
    for split, ids in (("train", [f"{i:06d}" for i in range(1, 9)]),
                       ("val", ["000103", "000104"])):
        os.makedirs(root / split, exist_ok=True)
        for sid in ids:
            n = 4000
            pc = np.concatenate(
                [rng.rand(n, 3) * [5, 5, 2.5] - [2.5, 2.5, 0],
                 rng.rand(n, 3) - 0.5], axis=1
            ).astype(np.float32)
            nb = 3
            boxes = np.zeros((nb, 8), np.float32)
            for b in range(nb):
                boxes[b, 0:3] = rng.rand(3) * 3 - 1.5
                boxes[b, 3:6] = rng.rand(3) * 0.8 + 0.3
                boxes[b, 6] = rng.rand() * np.pi - np.pi / 2  # heading
                boxes[b, 7] = b  # classes 0..2
            np.savez(root / split / f"{sid}_pc.npz", pc=pc)
            np.save(root / split / f"{sid}_bbox.npy", boxes)
    return str(root)


def test_sunrgbd_cli_train_eval(fake_sunrgbd, tmp_path):
    from vdetr_tpu.main import main

    overall = main([
        "--dataset_name", "sunrgbd",
        "--dataset_root_dir", fake_sunrgbd,
        "--voxel_capacity", "1024", "--min_stage_capacity", "128",
        "--preenc_npoints", "64", "--nqueries", "16",
        "--dec_nlayers", "2", "--dec_dim", "32", "--dec_ffn_dim", "32",
        "--rpe_dim", "8", "--inplanes", "8", "--enc_dim", "32",
        "--fps_impl", "jax", "--num_points", "2048", "--repeat_num", "2",
        "--mlp_dropout", "0", "--dec_dropout", "0",
        # oriented-box losses active (reference main.py:118-137 defaults
        # zero them for ScanNet; SUN RGB-D exercises them)
        "--loss_angle_cls_weight", "0.1", "--loss_angle_reg_weight", "0.5",
        "--matcher_anglecls_cost", "0.5", "--angle_type", "world_coords",
        "--max_epoch", "1", "--eval_every_epoch", "10",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert 0.25 in overall and np.isfinite(overall[0.25]["mAP"])


def test_sunrgbd_angle_class_roundtrip():
    ds = SunrgbdDatasetConfig()
    rng = np.random.RandomState(0)
    for ang in rng.rand(32) * 2 * np.pi - np.pi:
        c, r = ds.angle2class(ang)
        back = ds.class2angle(int(c), float(r))
        # equal modulo 2pi
        d = np.mod(back - ang + np.pi, 2 * np.pi) - np.pi
        assert abs(d) < 1e-6
    assert ds.num_angle_bin == 12
