"""Criterion tests: matcher parity vs scipy, loss values on crafted cases."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from vdetr_tpu.config import VDETRConfig
from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.train.criterion import (
    SetCriterion,
    build_criterion,
    repeat_ground_truth,
    sigmoid_focal_loss_sum,
    huber_loss,
)

MAXOBJ = 8
NPROP = 16
NCLS = 18


def make_targets(rng, B=2, ngt=(3, 5)):
    t = {
        "gt_box_corners": np.zeros((B, MAXOBJ, 8, 3), np.float32),
        "gt_box_centers": np.zeros((B, MAXOBJ, 3), np.float32),
        "gt_box_centers_normalized": np.zeros((B, MAXOBJ, 3), np.float32),
        "gt_box_sizes": np.zeros((B, MAXOBJ, 3), np.float32),
        "gt_box_sizes_normalized": np.zeros((B, MAXOBJ, 3), np.float32),
        "gt_box_angles": np.zeros((B, MAXOBJ), np.float32),
        "gt_angle_class_label": np.zeros((B, MAXOBJ), np.int32),
        "gt_angle_residual_label": np.zeros((B, MAXOBJ), np.float32),
        "gt_box_sem_cls_label": np.zeros((B, MAXOBJ), np.int32),
        "gt_box_present": np.zeros((B, MAXOBJ), np.float32),
    }
    ds = ScannetDatasetConfig()
    for b in range(B):
        n = ngt[b]
        t["gt_box_present"][b, :n] = 1
        centers = rng.rand(n, 3) * 4
        sizes = rng.rand(n, 3) + 0.3
        t["gt_box_centers"][b, :n] = centers
        t["gt_box_sizes"][b, :n] = sizes
        t["gt_box_sem_cls_label"][b, :n] = rng.randint(0, NCLS, n)
        t["gt_box_corners"][b, :n] = ds.box_parametrization_to_corners_np(
            centers, sizes, np.zeros(n)
        )
    return {k: jnp.asarray(v) for k, v in t.items()}


def make_outputs(rng, B=2, nprop=NPROP, ncls=NCLS):
    ds = ScannetDatasetConfig()
    centers = rng.rand(B, nprop, 3).astype(np.float32) * 4
    sizes = (rng.rand(B, nprop, 3) + 0.3).astype(np.float32)
    pre_c = centers + rng.randn(B, nprop, 3).astype(np.float32) * 0.05
    pre_s = sizes * np.exp(rng.randn(B, nprop, 3).astype(np.float32) * 0.05)
    logits = rng.randn(B, nprop, ncls).astype(np.float32)
    corners = ds.box_parametrization_to_corners_np(
        centers, sizes, np.zeros((B, nprop))
    )
    out = {
        "sem_cls_logits": logits,
        "sem_cls_prob": logits,  # focal: prob == logits
        "objectness_prob": 1 / (1 + np.exp(-logits)).max(-1),
        "center_unnormalized": centers,
        "size_unnormalized": sizes,
        "angle_logits": np.zeros((B, nprop, 1), np.float32),
        "angle_residual_normalized": np.zeros((B, nprop, 1), np.float32),
        "angle_continuous": np.zeros((B, nprop), np.float32),
        "box_corners": corners,
        "pre_box_center_unnormalized": pre_c,
        "pre_box_size_unnormalized": pre_s,
        "center_reg": (centers - pre_c) / (pre_s + 1e-5),
        "size_reg": np.log(sizes / pre_s),
    }
    return {k: jnp.asarray(v) for k, v in out.items()}


def scipy_reference_match(cfg, outputs, targets, b, nactual):
    """Rebuild the matcher cost in numpy and solve with scipy."""
    logits = np.asarray(outputs["sem_cls_prob"][b])
    p = 1 / (1 + np.exp(-logits))
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * p ** gamma * (-np.log(1 - p + 1e-8))
    pos = alpha * (1 - p) ** gamma * (-np.log(p + 1e-8))
    labels = np.asarray(targets["gt_box_sem_cls_label"][b])[:nactual]
    class_mat = (pos - neg)[:, labels]

    from vdetr_tpu.geometry.iou import generalized_box3d_iou
    gious = np.asarray(
        generalized_box3d_iou(
            outputs["box_corners"][b:b + 1],
            targets["gt_box_corners"][b:b + 1],
            jnp.asarray([nactual]),
        )
    )[0][:, :nactual]
    pre_c = np.asarray(outputs["pre_box_center_unnormalized"][b])
    pre_s = np.asarray(outputs["pre_box_size_unnormalized"][b])
    gt_c = np.asarray(targets["gt_box_centers"][b])[:nactual]
    gt_s = np.asarray(targets["gt_box_sizes"][b])[:nactual]
    creg = np.asarray(outputs["center_reg"][b])
    sreg = np.asarray(outputs["size_reg"][b])
    gt_creg = (gt_c[None] - pre_c[:, None]) / (pre_s[:, None] + 1e-5)
    cdist = np.abs(creg[:, None] - gt_creg).sum(-1)
    gt_sreg = np.log((gt_s[None] + 1e-5) / (pre_s[:, None] + 1e-5))
    sdist = np.abs(sreg[:, None] - gt_sreg).sum(-1)
    cost = (cfg.matcher_cls_cost * class_mat
            + cfg.matcher_center_cost * cdist
            + cfg.matcher_giou_cost * (-gious)
            + cfg.matcher_size_cost * sdist)
    return linear_sum_assignment(cost), cost


def test_matcher_matches_scipy(rng):
    cfg = VDETRConfig(repeat_num=0)
    crit = build_criterion(cfg, ScannetDatasetConfig())
    targets = make_targets(rng)
    outputs = make_outputs(rng)
    t = dict(targets)
    t["nactual_gt"] = targets["gt_box_present"].sum(1).astype(jnp.int32)
    # drive single_output_forward far enough to get assignments
    loss, _ = crit.single_output_forward(outputs, t, jnp.float32(8.0),
                                         jnp.float32(1.0))
    # now compare matching cost directly
    for b, nact in enumerate([3, 5]):
        (rows, cols), cost = scipy_reference_match(cfg, outputs, targets, b,
                                                   nact)
        want = cost[rows, cols].sum()
        # recompute our assignment
        out2 = dict(outputs)
        from vdetr_tpu.geometry.iou import generalized_box3d_iou
        out2["gious"] = generalized_box3d_iou(
            outputs["box_corners"], targets["gt_box_corners"],
            t["nactual_gt"],
        )
        pre_c = outputs["pre_box_center_unnormalized"][:, :, None, :]
        pre_s = outputs["pre_box_size_unnormalized"][:, :, None, :]
        gt_creg = (targets["gt_box_centers"][:, None] - pre_c) / (pre_s + 1e-5)
        out2["center_reg_dist"] = jnp.abs(
            outputs["center_reg"][:, :, None] - gt_creg
        ).sum(-1)
        gt_sreg = jnp.log(
            (targets["gt_box_sizes"][:, None] + 1e-5) / (pre_s + 1e-5)
        )
        out2["size_reg_dist"] = jnp.abs(
            outputs["size_reg"][:, :, None] - gt_sreg
        ).sum(-1)
        assign = crit.match(out2, t)
        mask = np.asarray(assign["proposal_matched_mask"][b])
        inds = np.asarray(assign["per_prop_gt_inds"][b])
        assert mask.sum() == nact
        got = sum(
            cost[p, inds[p]] for p in range(NPROP) if mask[p] > 0
        )
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_perfect_predictions_low_loss(rng):
    """Predictions exactly equal to GT boxes with confident correct classes
    should give near-zero box losses."""
    cfg = VDETRConfig(repeat_num=0)
    ds = ScannetDatasetConfig()
    crit = build_criterion(cfg, ds)
    targets = make_targets(rng, B=1, ngt=(4,))
    n = 4
    centers = np.asarray(targets["gt_box_centers"][0, :n])
    sizes = np.asarray(targets["gt_box_sizes"][0, :n])
    labels = np.asarray(targets["gt_box_sem_cls_label"][0, :n])
    nprop = NPROP
    # proposals: first 4 perfect, rest far away
    pc = np.concatenate([centers, 100 + np.arange(nprop - n)[:, None]
                         * np.ones((nprop - n, 3))]).astype(np.float32)
    ps = np.concatenate([sizes, np.ones((nprop - n, 3))]).astype(np.float32)
    logits = np.full((nprop, NCLS), -10.0, np.float32)
    for i in range(n):
        logits[i, labels[i]] = 10.0
    corners = ds.box_parametrization_to_corners_np(pc, ps,
                                                   np.zeros(nprop))
    outputs = {
        "sem_cls_logits": logits[None],
        "sem_cls_prob": logits[None],
        "objectness_prob": (1 / (1 + np.exp(-logits)))[None].max(-1),
        "center_unnormalized": pc[None],
        "size_unnormalized": ps[None],
        "angle_logits": np.zeros((1, nprop, 1), np.float32),
        "angle_residual_normalized": np.zeros((1, nprop, 1), np.float32),
        "angle_continuous": np.zeros((1, nprop), np.float32),
        "box_corners": corners[None],
        "pre_box_center_unnormalized": pc[None],
        "pre_box_size_unnormalized": ps[None],
        "center_reg": np.zeros((1, nprop, 3), np.float32),
        "size_reg": np.zeros((1, nprop, 3), np.float32),
    }
    outputs = {k: jnp.asarray(v) for k, v in outputs.items()}
    full = {"outputs": outputs}
    loss, ld = crit(full, targets)
    assert np.asarray(ld["loss_center"]) < 1e-3
    assert np.asarray(ld["loss_size"]) < 1e-3
    assert np.asarray(ld["loss_giou"]) < 1e-2
    # focal loss of the perfect cls pattern is tiny
    assert np.asarray(ld["loss_sem_cls"]) < 0.1


def test_repeat_ground_truth_compacts(rng):
    targets = make_targets(rng, B=2, ngt=(3, 5))
    targets["nactual_gt"] = targets["gt_box_present"].sum(1).astype(jnp.int32)
    rep = repeat_ground_truth(targets, 5)
    present = np.asarray(rep["gt_box_present"])
    assert present.shape == (2, 40)
    np.testing.assert_array_equal(present[0], [1] * 15 + [0] * 25)
    np.testing.assert_array_equal(present[1], [1] * 25 + [0] * 15)
    # labels repeat in blocks
    lab = np.asarray(rep["gt_box_sem_cls_label"][0, :15])
    orig = np.asarray(targets["gt_box_sem_cls_label"][0, :3])
    np.testing.assert_array_equal(lab, np.tile(orig, 5))
    assert int(np.asarray(rep["nactual_gt"][0])) == 15


def test_full_criterion_with_model_outputs(rng):
    """End-to-end: random model-shaped outputs + aux + enc outputs."""
    cfg = VDETRConfig(repeat_num=5)
    ds = ScannetDatasetConfig()
    crit = build_criterion(cfg, ds)
    targets = make_targets(rng)
    targets["point_clouds"] = jnp.zeros((2, 32, 3))
    outputs = {
        "outputs": make_outputs(rng),
        "aux_outputs": [make_outputs(rng, ncls=1), make_outputs(rng)],
        "enc_outputs": {
            "point_cls_logits": jnp.asarray(
                rng.randn(2, 32, NCLS).astype(np.float32)
            ),
        },
        "seed_xyz": jnp.asarray(rng.rand(2, 32, 3).astype(np.float32) * 4),
        "seed_inds": jnp.zeros((2, 32), jnp.int32),
    }
    loss, ld = jax.jit(crit)(outputs, targets)
    assert np.isfinite(np.asarray(loss))
    assert "loss_giou_0" in ld and "enc_point_cls_loss" in ld
    for k, v in ld.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_num_boxes_per_job_normalization(rng):
    """Reference criterion.py:612-616 recomputes num_boxes AFTER GT
    repetition: jobs matched against repeated GT divide by repeat*N while
    the un-repeated bilable aux0 and enc point-cls divide by N."""
    cfg = VDETRConfig(repeat_num=5, is_bilable=True)
    ds = ScannetDatasetConfig()
    crit = build_criterion(cfg, ds)
    recorded = []
    orig = crit.compute_losses

    def spy(out, tgt, assignments, num_boxes, has_boxes):
        recorded.append(float(num_boxes))
        return orig(out, tgt, assignments, num_boxes, has_boxes)

    crit.compute_losses = spy
    targets = make_targets(rng)  # 3 + 5 = 8 boxes
    outputs = {
        "outputs": make_outputs(rng),
        "aux_outputs": [make_outputs(rng, ncls=1), make_outputs(rng)],
    }
    crit(outputs, targets)
    # jobs: final (repeated), aux0 (bilable, un-repeated), aux1 (repeated)
    assert recorded == [40.0, 8.0, 40.0]


def test_no_gt_boxes_zero_loss(rng):
    cfg = VDETRConfig(repeat_num=0)
    crit = build_criterion(cfg, ScannetDatasetConfig())
    targets = make_targets(rng, ngt=(0, 0))
    outputs = {"outputs": make_outputs(rng)}
    loss, ld = crit(outputs, targets)
    assert np.isfinite(np.asarray(loss))
    assert np.asarray(ld["loss_center"]) == 0
    assert np.asarray(ld["loss_giou"]) == 0


def test_focal_loss_matches_reference_formula(rng):
    logits = rng.randn(2, 5, 3).astype(np.float32)
    targets = (rng.rand(2, 5, 3) > 0.7).astype(np.float32)
    got = np.asarray(
        sigmoid_focal_loss_sum(jnp.asarray(logits), jnp.asarray(targets))
    )
    p = 1 / (1 + np.exp(-logits))
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    p_t = p * targets + (1 - p) * (1 - targets)
    w = (0.25 * targets + 0.75 * (1 - targets)) * (1 - p_t) ** 2
    np.testing.assert_allclose(got, (ce * w).sum(), rtol=1e-4)


def test_huber():
    e = jnp.asarray([-3.0, -0.5, 0.0, 0.5, 3.0])
    got = np.asarray(huber_loss(e, delta=1.0))
    np.testing.assert_allclose(got, [2.5, 0.125, 0.0, 0.125, 2.5])
