"""IoU metric semantics (reference utils.py:151-230)."""

import numpy as np

from deeplabv3plus_augmented_superresolution_tpu.metrics import (
    compute_iou,
    mean_iou,
    single_class_iou,
)


def test_perfect_prediction():
    gt = np.zeros((8, 8, 1), np.int32)
    gt[2:6, 2:6] = 8
    assert compute_iou(gt, gt, class_id=8) == 1.0
    assert compute_iou(gt, gt) == 1.0


def test_single_class_partial_overlap():
    gt = np.zeros((4, 4), np.int32)
    gt[0:2, :] = 8          # 8 pixels of class 8
    pred = np.zeros((4, 4), np.int32)
    pred[1:3, :] = 8        # 8 pixels, 4 overlapping
    # inter=4, union=12
    np.testing.assert_allclose(float(single_class_iou(gt, pred, 8)), 4 / 12)


def test_single_class_include_bg_remaps_other_classes():
    gt = np.zeros((4, 4), np.int32)
    gt[0, :] = 8
    gt[1, :] = 5            # other class -> treated as bg
    pred = np.zeros((4, 4), np.int32)
    pred[0, :] = 8
    # class-8 IoU = 1; bg: gt-bg = rows 1..3 (12 px), pred-bg = rows 1..3 -> 1
    np.testing.assert_allclose(
        float(single_class_iou(gt, pred, 8, include_bg=True)), 1.0)


def test_single_class_nan_dropped():
    # class 8 absent in both -> union 0 -> NaN -> dropped; bg IoU perfect
    gt = np.zeros((4, 4), np.int32)
    pred = np.zeros((4, 4), np.int32)
    out = float(single_class_iou(gt, pred, 8, include_bg=True))
    np.testing.assert_allclose(out, 1.0)


def test_mean_iou_only_present_classes():
    gt = np.zeros((4, 4), np.int32)
    gt[0, :] = 3
    pred = np.zeros((4, 4), np.int32)
    pred[0, :2] = 3
    pred[3, :] = 7          # class 7 not in GT: ignored as a class...
    # class 3: inter 2, union 4 -> 0.5
    # class 0: gt rows 1-3 (12), pred rows 1-2 + row0[2:] (10 overlap,
    #          union 12+10-10+... compute: gt0 = 12 px, pred0 = 10 px,
    #          inter = rows1,2 (8) + row0[2:4]∩gt0? row0 is class3 in gt -> no.
    #          => inter 8, union 14 -> 4/7
    expected = np.mean([0.5, 8 / 14])
    np.testing.assert_allclose(float(mean_iou(gt, pred)), expected, rtol=1e-6)


def test_mean_iou_ignores_255():
    gt = np.full((4, 4), 255, np.int32)
    gt[0, :] = 1
    pred = np.ones((4, 4), np.int32)
    # only class 1 present; inter=4, union=16 (255 pixels count as pred fp)
    np.testing.assert_allclose(float(mean_iou(gt, pred)), 4 / 16)


def test_compute_iou_accepts_hwc_and_flat():
    gt = np.zeros((8, 8, 1), np.float32)
    gt[1:3] = 8.0
    pred = gt.copy()
    assert compute_iou(gt, pred.reshape(-1, 1), class_id=8) == 1.0
