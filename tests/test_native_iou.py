"""Native (C++) rotated IoU vs the numpy reference implementation."""

import numpy as np
import pytest

from vdetr_tpu.data import ScannetDatasetConfig
from vdetr_tpu.eval import native
from vdetr_tpu.geometry.iou import box3d_iou_np


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("g++ unavailable; native IoU not built")
    return l


def test_native_matches_numpy(lib, rng):
    ds = ScannetDatasetConfig()
    nd, ng = 12, 7
    dc = rng.rand(nd, 3) * 4
    dsz = rng.rand(nd, 3) * 0.8 + 0.3
    da = (rng.rand(nd) - 0.5) * np.pi
    gc = rng.rand(ng, 3) * 4
    gsz = rng.rand(ng, 3) * 0.8 + 0.3
    ga = (rng.rand(ng) - 0.5) * np.pi
    dets = ds.box_parametrization_to_corners_np(dc, dsz, da)
    gts = ds.box_parametrization_to_corners_np(gc, gsz, ga)
    got = native.box3d_iou_pairs(dets, gts)
    assert got is not None
    for i in range(nd):
        for j in range(ng):
            want, _ = box3d_iou_np(dets[i], gts[j])
            np.testing.assert_allclose(got[i, j], want, atol=2e-5,
                                       err_msg=f"pair {i},{j}")


def test_native_near_identity_iou(lib, rng):
    """NOTE: exactly coincident boxes are numerically chaotic under the
    reference's strict-inside Sutherland-Hodgman (the numpy transcription
    yields self-IoU anywhere in ~[0.84, 1.40]); slightly perturbed pairs
    are the meaningful regime and must agree closely."""
    ds = ScannetDatasetConfig()
    c = rng.rand(5, 3)
    s = rng.rand(5, 3) + 0.3
    a = (rng.rand(5) - 0.5) * np.pi
    corners = ds.box_parametrization_to_corners_np(c, s, a)
    corners2 = ds.box_parametrization_to_corners_np(
        c + 1e-3, s * 1.001, a + 1e-3
    )
    got = native.box3d_iou_pairs(corners, corners2)
    for i in range(5):
        want, _ = box3d_iou_np(corners[i], corners2[i])
        np.testing.assert_allclose(got[i, i], want, atol=1e-4)
        assert got[i, i] > 0.98


def test_eval_det_uses_native_consistently(lib, rng):
    """AP through the evaluator must be identical with/without native."""
    from vdetr_tpu.eval import eval_det
    from vdetr_tpu.eval.eval_det import eval_det_cls, get_iou_obb

    ds = ScannetDatasetConfig()
    n = 6
    c = rng.rand(n, 3) * 5
    s = rng.rand(n, 3) * 0.5 + 0.4
    a = (rng.rand(n) - 0.5) * 0.8
    corners = ds.box_parametrization_to_corners_np(c, s, a)
    noisy = ds.box_parametrization_to_corners_np(
        c + rng.randn(n, 3) * 0.1, s, a
    )
    pred = {0: [(noisy[i], 0.5 + 0.05 * i) for i in range(n)]}
    gt = {0: [corners[i] for i in range(n)]}
    rec_n, prec_n, ap_n = eval_det_cls(pred, gt, ovthresh=0.25)
    # force python path
    import vdetr_tpu.eval.native as nat
    saved = nat._lib
    nat._lib, nat._tried = None, True
    try:
        rec_p, prec_p, ap_p = eval_det_cls(pred, gt, ovthresh=0.25)
    finally:
        nat._lib, nat._tried = saved, True
    np.testing.assert_allclose(ap_n, ap_p, atol=1e-9)
    np.testing.assert_array_equal(rec_n, rec_p)
