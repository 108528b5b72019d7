"""Eval pipeline tests: VOC AP on canned PR data, AP calculator end-to-end
with perfect and noisy detections."""

import numpy as np

from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.eval import APCalculator, voc_ap, eval_det
from vdetr_tpu.eval.ap_calculator import get_ap_config_dict


def make_scene(rng, n=4, cls_count=3):
    ds = ScannetDatasetConfig()
    centers = rng.rand(n, 3) * 5 + 1
    sizes = rng.rand(n, 3) * 0.5 + 0.5
    labels = rng.randint(0, cls_count, n)
    corners = ds.box_parametrization_to_corners_np(centers, sizes,
                                                   np.zeros(n))
    return centers, sizes, labels, corners


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == 1.0


def test_voc_ap_known_value():
    # 3 dets: TP, FP, TP over 2 GT: prec = [1, 0.5, 2/3], rec = [0.5, 0.5, 1]
    rec = np.array([0.5, 0.5, 1.0])
    prec = np.array([1.0, 0.5, 2 / 3])
    # AP = 0.5*1.0 + 0.5*(2/3)
    np.testing.assert_allclose(voc_ap(rec, prec), 0.5 + 0.5 * 2 / 3,
                               rtol=1e-6)


def test_eval_det_perfect_detections(rng):
    _, _, labels, corners = make_scene(rng)
    pred_all = {0: [(int(labels[i]), corners[i], 0.9) for i in range(4)]}
    gt_all = {0: [(int(labels[i]), corners[i]) for i in range(4)]}
    rec, prec, ap = eval_det(pred_all, gt_all, ovthresh=0.25)
    for c in ap:
        np.testing.assert_allclose(ap[c], 1.0)


def test_eval_det_false_positives_halve_precision(rng):
    _, _, labels, corners = make_scene(rng, n=2, cls_count=1)
    far = corners + 50.0
    pred_all = {0: [
        (0, corners[0], 0.9), (0, corners[1], 0.8),
        (0, far[0], 0.7), (0, far[1], 0.6),
    ]}
    gt_all = {0: [(0, corners[0]), (0, corners[1])]}
    rec, prec, ap = eval_det(pred_all, gt_all, ovthresh=0.25)
    np.testing.assert_allclose(ap[0], 1.0)  # FPs rank below TPs
    np.testing.assert_allclose(rec[0][-1], 1.0)


def test_ap_calculator_end_to_end_perfect(rng):
    ds = ScannetDatasetConfig()
    K = 16
    n = 4
    centers, sizes, labels, corners = make_scene(rng, n=n)
    # model-style outputs: n perfect boxes + K-n junk far boxes
    all_c = np.concatenate([centers, rng.rand(K - n, 3) * 0.2 + 50])
    all_s = np.concatenate([sizes, np.full((K - n, 3), 0.3)])
    all_corners = ds.box_parametrization_to_corners_np(
        all_c, all_s, np.zeros(K)
    )
    probs = np.full((K, 18), 0.01, np.float32)
    for i in range(n):
        probs[i, labels[i]] = 0.95
    obj = np.concatenate([np.full(n, 0.9), np.full(K - n, 0.05)])
    outputs = {
        "box_corners": all_corners[None].astype(np.float32),
        "sem_cls_prob": probs[None],
        "objectness_prob": obj[None].astype(np.float32),
        "angle_prob": np.zeros((1, K), np.float32),
        "center_unnormalized": all_c[None].astype(np.float32),
        "size_unnormalized": all_s[None].astype(np.float32),
        "angle_continuous": np.zeros((1, K), np.float32),
    }
    gt_corners = np.zeros((1, 8, 8, 3), np.float32)
    gt_corners[0, :n] = corners
    gt_labels = np.zeros((1, 8), np.int64)
    gt_labels[0, :n] = labels
    present = np.zeros((1, 8), np.float32)
    present[0, :n] = 1
    # points inside each gt box so remove_empty_box keeps them
    pts = (
        centers[:, None, :] + rng.randn(n, 200, 3) * 0.05
    ).reshape(-1, 3)
    targets = {
        "point_clouds": pts[None].astype(np.float32),
        "gt_box_corners": gt_corners,
        "gt_box_sem_cls_label": gt_labels,
        "gt_box_present": present,
    }
    # NOTE: per_class_proposal=True (the default protocol) would emit dets
    # for all 18 classes; classes absent from GT then score AP 0 and dilute
    # mAP — reference-faithful behavior (utils/eval_det.py:209-226) but not
    # what this perfect-detection check wants.
    calc = APCalculator(
        ds, ap_iou_thresh=[0.25, 0.5], class2type_map=ds.class2type,
        ap_config_dict=get_ap_config_dict(dataset_config=ds,
                                          remove_empty_box=True,
                                          per_class_proposal=False),
    )
    calc.step(outputs, targets)
    overall = calc.compute_metrics()
    assert overall[0.25]["mAP"] > 0.99
    assert overall[0.5]["mAP"] > 0.99
    assert overall[0.25]["AR"] > 0.99
    s = calc.metrics_to_str(overall)
    assert "mAP0.25, mAP0.50:" in s
    assert "chair Average Precision" in s


def test_pad_last_loader_scores_all_scans(rng):
    """A val set of size global_batch*k + r (r>0) must score every scan
    (the round-1 drop_last loader silently dropped the tail)."""
    from vdetr_tpu.data.synthetic import SyntheticDetectionDataset, make_loader

    ds = ScannetDatasetConfig()
    data = SyntheticDetectionDataset(ds, num_points=512, num_scenes=11,
                                     max_objects=3)
    calc = APCalculator(
        ds, ap_iou_thresh=[0.25],
        ap_config_dict=get_ap_config_dict(dataset_config=ds,
                                          remove_empty_box=False),
        processes=1,
    )
    n_batches = 0
    for batch in make_loader(data, batch_size=4, shuffle=False,
                             pad_last=True):
        B, K = 4, 8
        assert batch["point_clouds"].shape[0] == B  # static shape for jit
        outputs = {
            "box_corners": batch["gt_box_corners"][:, :K].astype(np.float32),
            "sem_cls_prob": np.full((B, K, 18), 0.5, np.float32),
            "objectness_prob": np.full((B, K), 0.9, np.float32),
            "angle_prob": np.zeros((B, K), np.float32),
            "center_unnormalized": batch["gt_box_centers"][:, :K],
            "size_unnormalized": batch["gt_box_sizes"][:, :K],
            "angle_continuous": np.zeros((B, K), np.float32),
        }
        calc.step(outputs, batch)
        n_batches += 1
    assert n_batches == 3
    assert calc.scan_cnt == 11  # all scans, no duplicates from padding


def test_rotated_nms_parse_predictions(rng):
    """--rotated_nms must suppress rotated duplicates that axis-aligned
    NMS would keep (the reference flag is a broken debug stub)."""
    from vdetr_tpu.eval.ap_calculator import parse_predictions

    ds = ScannetDatasetConfig()
    center = np.array([[1.0, 1.0, 0.5]])
    size = np.array([[2.0, 0.4, 1.0]])
    # same box at 0 and ~90 degrees: rotated IoU is small (~0.2 thin cross),
    # two copies at angle 0 overlap exactly
    c0 = ds.box_parametrization_to_corners_np(center, size, np.zeros(1))[0]
    c90 = ds.box_parametrization_to_corners_np(center, size,
                                               np.array([np.pi / 2]))[0]
    corners = np.stack([c0, c0, c90])[None].astype(np.float32)
    probs = np.full((1, 3, 18), 0.1, np.float32)
    probs[:, :, 2] = 0.9
    cfgd = get_ap_config_dict(dataset_config=ds, remove_empty_box=False,
                              rotated_nms=True, per_class_proposal=False)
    out = parse_predictions(
        corners, probs, np.array([[0.9, 0.8, 0.7]], np.float32),
        np.zeros((1, 3), np.float32), np.zeros((1, 10, 3), np.float32),
        cfgd,
    )
    kept = out[0]
    # duplicate at angle 0 suppressed; the 90-degree box survives (IoU below
    # 0.25 with the kept box under TRUE rotated IoU)
    assert len(kept) == 2
    scores = sorted(s for (_, _, s) in kept)
    np.testing.assert_allclose(scores, [0.7, 0.9])  # obj_prob of the keeps


def test_ap_calculator_wrong_classes_zero_ap(rng):
    ds = ScannetDatasetConfig()
    n = 3
    centers, sizes, labels, corners = make_scene(rng, n=n, cls_count=2)
    probs = np.full((n, 18), 0.01, np.float32)
    for i in range(n):
        probs[i, (labels[i] + 5) % 18] = 0.9  # systematically wrong class
    outputs = {
        "box_corners": corners[None].astype(np.float32),
        "sem_cls_prob": probs[None],
        "objectness_prob": np.full((1, n), 0.9, np.float32),
        "angle_prob": np.zeros((1, n), np.float32),
        "center_unnormalized": centers[None].astype(np.float32),
        "size_unnormalized": sizes[None].astype(np.float32),
        "angle_continuous": np.zeros((1, n), np.float32),
    }
    gt_corners = corners[None].astype(np.float32)
    targets = {
        "point_clouds": centers[None].astype(np.float32),
        "gt_box_corners": gt_corners,
        "gt_box_sem_cls_label": labels[None],
        "gt_box_present": np.ones((1, n), np.float32),
    }
    calc = APCalculator(
        ds, ap_iou_thresh=[0.25],
        ap_config_dict=get_ap_config_dict(dataset_config=ds,
                                          remove_empty_box=False),
    )
    calc.step(outputs, targets)
    overall = calc.compute_metrics()
    # per-class-proposal still emits every box under every class, so the
    # right class exists with lower score; AP > 0 but clearly below 1
    assert overall[0.25]["mAP"] < 0.999
