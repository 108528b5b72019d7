"""Train-step tests: 8-device DP mesh, loss decreases on synthetic data,
sync-BN statistics, finite-guard."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.data.synthetic import (
    SyntheticDetectionDataset,
    collate,
    make_loader,
)
from vdetr_tpu.models import build_model
from vdetr_tpu.parallel import make_mesh
from vdetr_tpu.train.engine import Trainer, train_one_epoch
from vdetr_tpu.train.schedule import make_lr_schedule


def tiny_cfg(**kw):
    base = dict(
        voxel_capacity=2048, min_stage_capacity=128,
        grid_extent=(128, 128, 64), preenc_npoints=128, nqueries=32,
        dec_nlayers=2, dec_dim=32, dec_ffn_dim=32, rpe_dim=16, inplanes=8,
        enc_dim=32, fps_impl="jax", num_points=1024, repeat_num=2,
        max_epoch=10, base_lr=1e-3, warm_lr_epochs=0, mlp_dropout=0.0,
        dec_dropout=0.0,
    )
    base.update(kw)
    return VDETRConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (-1,))
    assert mesh.devices.size == 8
    model = build_model(cfg, ds, axis_name="data")
    data = SyntheticDetectionDataset(ds, num_points=cfg.num_points,
                                     num_scenes=8, max_objects=4)
    batch = collate([data[i] for i in range(8)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trainer = Trainer(cfg, model, ds, mesh, steps_per_epoch=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return cfg, trainer, state, batch, data


def test_train_step_runs_and_loss_decreases(setup):
    cfg, trainer, state, batch, _ = setup
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        rng, r = jax.random.split(rng)
        state, loss, loss_dict = trainer.train_step(state, batch, r)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # overfitting a single batch must reduce the loss substantially
    assert losses[-1] < losses[0] * 0.9, losses


def test_batch_stats_updated_and_replicated(setup):
    cfg, trainer, state, batch, _ = setup
    state2, _, _ = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    m0 = state.batch_stats["pre_encoder"]["norm1"]["mean"]
    m1 = state2.batch_stats["pre_encoder"]["norm1"]["mean"]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_lr_schedule_reference_shape():
    cfg = VDETRConfig(max_epoch=540, warm_lr_epochs=9, base_lr=7e-4,
                      warm_lr=1e-6, final_lr=1e-6)
    sched = make_lr_schedule(cfg, steps_per_epoch=100)
    # warmup start
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-3)
    # end of warmup reaches base_lr
    assert float(sched(9 * 100)) == pytest.approx(7e-4, rel=1e-2)
    # cosine midpoint
    mid = float(sched(270 * 100))
    assert mid == pytest.approx((7e-4 + 1e-6) / 2, rel=1e-2)
    # final
    assert float(sched(540 * 100)) == pytest.approx(1e-6, rel=1e-2)


def test_train_one_epoch_loop(setup):
    cfg, trainer, state, batch, data = setup
    loader = make_loader(data, batch_size=8, shuffle=True)
    state, mean_loss, loss_dict = train_one_epoch(
        trainer, state, loader, jax.random.PRNGKey(1), epoch=0, logger=None
    )
    assert np.isfinite(mean_loss)
    assert "loss_giou" in loss_dict


def test_eval_step_outputs(setup):
    cfg, trainer, state, batch, _ = setup
    out = trainer.eval_step(state, batch)
    assert out["box_corners"].shape == (8, cfg.nqueries, 8, 3)
    p = np.asarray(out["sem_cls_prob"])
    assert (p >= 0).all() and (p <= 1).all(), "probs must be sigmoided"


def test_small_capacity_init_matches(setup):
    """init_state shrinks the init model to INIT_CAPACITY voxels (full-size
    compiles cost minutes just to discover shapes); parameters and
    batch_stats must be bit-identical to a full-size init because flax
    derives rng keys from module paths and every initializer is
    shape-only."""
    cfg, _, _, batch, _ = setup
    ds = ScannetDatasetConfig()
    mesh = make_mesh(("data",), (-1,))
    model = build_model(cfg, ds, axis_name="data")

    small = Trainer(cfg, model, ds, mesh, steps_per_epoch=1)
    small.INIT_CAPACITY = 512   # force the shrink path (cfg capacity 2048)
    full = Trainer(cfg, model, ds, mesh, steps_per_epoch=1)
    full.INIT_CAPACITY = 1 << 30

    # sanity: the shrink actually engages
    m, inp = small._init_model_and_inputs(
        {k: batch[k] for k in ("point_clouds", "point_cloud_dims_min",
                               "point_cloud_dims_max", "point_validity")
         if k in batch})
    assert m is not model and inp["point_clouds"].shape[1] == 512

    s_small = small.init_state(jax.random.PRNGKey(0), batch)
    s_full = full.init_state(jax.random.PRNGKey(0), batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_small.params, s_full.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_small.batch_stats, s_full.batch_stats,
    )
