"""TTA de-augmentation consistency + checkpoint round-trip tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.eval.tta import (
    augment_batch,
    deaugment_outputs,
    merge_views,
    tta_eval_step,
)
from vdetr_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_config,
    auto_reload_config,
    resume_if_possible,
)


def fake_outputs(rng, B=2, K=8):
    ds = ScannetDatasetConfig()
    centers = rng.rand(B, K, 3).astype(np.float32) * 4 - 2
    sizes = (rng.rand(B, K, 3) + 0.3).astype(np.float32)
    angles = np.zeros((B, K), np.float32)
    corners = ds.box_parametrization_to_corners_np(centers, sizes, angles)
    return {
        "box_corners": corners.astype(np.float32),
        "box_corners_axis_align": corners.astype(np.float32),
        "sem_cls_prob": rng.rand(B, K, 18).astype(np.float32),
        "objectness_prob": rng.rand(B, K).astype(np.float32),
        "angle_prob": np.zeros((B, K), np.float32),
        "center_unnormalized": centers,
        "size_unnormalized": sizes,
        "angle_continuous": angles,
    }


def test_flip_roundtrip_identity(rng):
    """A model that's equivariant to the flip would produce flipped outputs;
    de-augmenting them must recover the original boxes."""
    ds = ScannetDatasetConfig()
    out = fake_outputs(rng)
    for fx, fy in [(True, False), (False, True), (True, True)]:
        centers = np.array(out["center_unnormalized"], copy=True)
        if fx:
            centers[..., 0] = -centers[..., 0]
        if fy:
            centers[..., 1] = -centers[..., 1]
        corners_aug = ds.box_parametrization_to_corners_np(
            centers, out["size_unnormalized"],
            np.zeros(centers.shape[:2], np.float32),
        )
        aug_out = dict(out)
        aug_out["center_unnormalized"] = centers
        aug_out["box_corners"] = corners_aug.astype(np.float32)
        aug_out["box_corners_axis_align"] = corners_aug.astype(np.float32)
        rec = deaugment_outputs(aug_out, fx, fy, 0.0)
        np.testing.assert_allclose(
            rec["center_unnormalized"], out["center_unnormalized"], atol=1e-5
        )
        # corner SET equality: per-box min/max must match
        np.testing.assert_allclose(
            np.sort(rec["box_corners"], axis=2),
            np.sort(out["box_corners"], axis=2),
            atol=1e-5,
        )


def test_augment_batch_recomputes_dims(rng):
    pc = rng.rand(1, 100, 3).astype(np.float32) * [4, 3, 2]
    batch = {
        "point_clouds": pc,
        "point_cloud_dims_min": pc.min(1),
        "point_cloud_dims_max": pc.max(1),
    }
    aug = augment_batch(batch, True, False, 0.0)
    np.testing.assert_allclose(aug["point_cloud_dims_min"][0, 0],
                               -pc[0, :, 0].max(), atol=1e-6)


def test_tta_eval_step_merges_views(rng):
    out = fake_outputs(rng)

    def eval_step(state, batch):
        return {k: jnp.asarray(v) for k, v in out.items()}

    merged = tta_eval_step(eval_step, None, {
        "point_clouds": rng.rand(2, 50, 3).astype(np.float32),
        "point_cloud_dims_min": np.zeros((2, 3), np.float32),
        "point_cloud_dims_max": np.ones((2, 3), np.float32),
    })
    assert merged["box_corners"].shape[1] == 4 * 8  # 4 views x 8 proposals


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = VDETRConfig(max_epoch=7, base_lr=1e-3)
    state = {
        "params": {"a": np.float32(rng.rand(3, 4))},
        "step": np.int32(5),
    }
    p = save_checkpoint(str(tmp_path), state, cfg, epoch=3,
                        best_val_metrics={"mAP_0.25": 0.5})
    state2, header = load_checkpoint(p, state)
    np.testing.assert_array_equal(state2["params"]["a"],
                                  state["params"]["a"])
    assert header["epoch"] == 3
    cfg2, _ = load_config(p)
    assert cfg2.max_epoch == 7 and cfg2.base_lr == 1e-3
    assert isinstance(cfg2.grid_extent, tuple)
    # resume
    state3, epoch, best = resume_if_possible(str(tmp_path), state)
    assert epoch == 3 and best["mAP_0.25"] == 0.5


def test_auto_reload_config(tmp_path):
    train_cfg = VDETRConfig(dec_nlayers=5, nms_iou=0.25, hard_anchor=True)
    state = {"x": np.zeros(1, np.float32)}
    p = save_checkpoint(str(tmp_path), state, train_cfg, epoch=1)
    cli_cfg = VDETRConfig(dec_nlayers=9, nms_iou=0.5, test_only=True)
    merged = auto_reload_config(cli_cfg, p)
    assert merged.dec_nlayers == 5      # model hyperparam from ckpt
    assert merged.hard_anchor is True
    assert merged.nms_iou == 0.5        # test flag from CLI
    assert merged.test_only is True
