"""Val-split subsampling neutrality (VERDICT round-1 weak 4 / SURVEY §7.2).

The reference evaluates the full variable-size cloud at batch 1
(datasets/scannet.py:493); our val loader subsamples to a fixed
`num_points` budget so eval jits with one static shape. This test bounds
the departure at tiny scale with a *harsher* ratio than production
(budget = half the cloud, vs 100k of ~150k on real ScanNet): a briefly
trained model must produce the same mAP@0.25 on fabricated val scans
whether it sees the full (padded) cloud or the subsampled one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.data.scannet import ScannetDetectionDataset
from vdetr_tpu.data.synthetic import collate
from vdetr_tpu.eval.ap_calculator import APCalculator, config_dict_from_cfg
from vdetr_tpu.models import build_model
from vdetr_tpu.parallel import make_mesh
from vdetr_tpu.train.engine import Trainer

NPTS_FULL = 16384   # > any fabricated cloud: pure padding, zero dropped
NPTS_SUB = 6144     # < cloud size: real subsampling


@pytest.fixture(scope="module")
def fake_scans(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_big")
    rng = np.random.RandomState(7)
    names = ["scene0100_00", "scene0101_00"]
    for i, name in enumerate(names):
        n = 12000 + i * 1500
        # surface-ish structure: half the points on box faces, rest room
        nb = 3
        boxes = np.zeros((nb, 7), np.float32)
        pts = []
        for b in range(nb):
            boxes[b, :3] = rng.rand(3) * 3 + 1.0
            boxes[b, 3:6] = rng.rand(3) * 0.6 + 0.4
            boxes[b, 6] = [3, 4, 5][b]
            m = n // (2 * nb)
            local = (rng.rand(m, 3) - 0.5) * boxes[b, 3:6]
            face = rng.randint(0, 3, m)
            sign = rng.randint(0, 2, m) * 2 - 1
            local[np.arange(m), face] = (
                sign * boxes[b, 3 + face] / 2
            )
            pts.append(boxes[b, :3] + local)
        rest = n - sum(p.shape[0] for p in pts)
        pts.append(rng.rand(rest, 3) * [5, 4, 2.5])
        verts = np.concatenate(
            [np.concatenate(pts, 0), rng.rand(n, 3) * 255], axis=1
        ).astype(np.float32)
        np.save(root / f"{name}_vert.npy", verts)
        np.save(root / f"{name}_bbox.npy", boxes)
        np.save(root / f"{name}_sem_label.npy", np.zeros(n, np.int64))
        np.save(root / f"{name}_ins_label.npy", np.zeros(n, np.int64))
    for split in ("train", "val"):
        with open(root / f"scannetv2_{split}.txt", "w") as f:
            f.write("\n".join(names) + "\n")
    return str(root)


def _cfg(root, num_points):
    return VDETRConfig(
        dataset_root_dir=root, num_points=num_points,
        voxel_capacity=4096, min_stage_capacity=128,
        grid_extent=(512, 512, 256), preenc_npoints=128, nqueries=32,
        dec_nlayers=2, dec_dim=32, dec_ffn_dim=32, rpe_dim=16, inplanes=8,
        enc_dim=32, fps_impl="jax", repeat_num=2, max_epoch=10,
        base_lr=2e-3, warm_lr_epochs=0, mlp_dropout=0.0, dec_dropout=0.0,
    )


def _eval_map(cfg, state_src_trainer, params, stats, scans_root):
    """Eval every val scan at cfg.num_points; returns mAP@0.25."""
    ds_cfg = ScannetDatasetConfig()
    model = build_model(cfg, ds_cfg, axis_name="data")
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    trainer = Trainer(cfg, model, ds_cfg, mesh, steps_per_epoch=1)
    val = ScannetDetectionDataset(cfg, ds_cfg, split_set="val")
    state = state_src_trainer.init_state(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in collate(
            [val.__getitem__(0, rng=np.random.RandomState(0))]).items()},
    )
    state = state.replace(params=params, batch_stats=stats)
    calc = APCalculator(
        ds_cfg, ap_iou_thresh=[0.25],
        class2type_map=ds_cfg.class2type,
        ap_config_dict=config_dict_from_cfg(cfg, ds_cfg),
    )
    for i in range(len(val)):
        sample = val.__getitem__(i, rng=np.random.RandomState(100 + i))
        batch = {k: jnp.asarray(v) for k, v in collate([sample]).items()}
        out = trainer.eval_step(state, batch, retries=0)
        calc.step(out, batch)
    overall = calc.compute_metrics()
    return float(overall[0.25]["mAP"])


@pytest.mark.slow
def test_val_subsample_metric_neutrality(fake_scans):
    ds_cfg = ScannetDatasetConfig()
    cfg = _cfg(fake_scans, NPTS_SUB)
    mesh = make_mesh(("data",), (1,), devices=jax.devices()[:1])
    model = build_model(cfg, ds_cfg, axis_name="data")
    train = ScannetDetectionDataset(cfg, ds_cfg, split_set="train")
    trainer = Trainer(cfg, model, ds_cfg, mesh, steps_per_epoch=1)
    batch = {k: jnp.asarray(v) for k, v in collate(
        [train.__getitem__(0, rng=np.random.RandomState(1))]).items()}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(3)
    # overfit the two scans so predictions are meaningful
    for i in range(16):
        s = train.__getitem__(i % 2, rng=np.random.RandomState(10 + i))
        b = {k: jnp.asarray(v) for k, v in collate([s]).items()}
        rng, r = jax.random.split(rng)
        state, loss, _ = trainer.train_step(state, b, r, retries=0)
    assert np.isfinite(float(loss))

    params = state.params
    stats = state.batch_stats
    map_sub = _eval_map(_cfg(fake_scans, NPTS_SUB), trainer, params, stats,
                        fake_scans)
    map_full = _eval_map(_cfg(fake_scans, NPTS_FULL), trainer, params,
                         stats, fake_scans)
    # the subsampled protocol must not bias the metric: identical up to a
    # small tolerance even at a 2x harsher subsample ratio than production
    assert abs(map_full - map_sub) < 0.05, (map_full, map_sub)
