"""Metrics: AP computation, APMeter streaming + ignore semantics, confusion
matrix, MCC vs sklearn."""

import numpy as np
import pytest

from hd_yolo_tpu.models.metrics import (
    APMeter,
    ConfusionMatrix,
    ap_per_class,
    compute_ap,
    coverage_accuracy_miou,
    evaluate_detection,
    matthews_corrcoef,
    summarize_precision_recall,
)


def boxes_at(centers, size=10.0):
    c = np.asarray(centers, np.float64)
    return np.concatenate([c - size / 2, c + size / 2], -1)


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0, abs=0.01)  # 101-pt interp: "perfect" ≈ 0.995


def test_ap_per_class_simple():
    # 2 preds, both TP at iou>=.5, one class
    tp = np.ones((2, 10), bool)
    out = ap_per_class(tp, np.array([0.9, 0.8]), np.zeros(2), np.zeros(2))
    ap = out[5]
    assert ap.shape == (1, 10)
    assert ap[0, 0] == pytest.approx(1.0, abs=0.01)


def test_apmeter_perfect_detections():
    m = APMeter()
    gt_boxes = boxes_at([[20, 20], [60, 60], [100, 40]])
    for _ in range(3):  # 3 identical images
        m.add(
            {"boxes": gt_boxes, "scores": np.array([0.9, 0.8, 0.7]),
             "labels": np.array([1, 2, 1])},
            {"boxes": gt_boxes, "labels": np.array([1, 2, 1])},
        )
    stats = m.ap_per_class()
    assert stats["labels"] == [1, 2]
    np.testing.assert_allclose(stats["ap"][:, 0], 1.0, atol=0.01)  # mAP@.5 ≈ 1
    np.testing.assert_allclose(stats["ap"], 1.0, atol=0.01)  # exact boxes → all iouv

def test_apmeter_false_positive_lowers_precision():
    m = APMeter()
    gt = boxes_at([[20, 20]])
    preds = boxes_at([[20, 20], [100, 100]])  # second is FP
    m.add(
        {"boxes": preds, "scores": np.array([0.6, 0.9]), "labels": np.array([1, 1])},
        {"boxes": gt, "labels": np.array([1])},
    )
    stats = m.ap_per_class()
    # FP ranked above TP → AP@0.5 = 0.5 (precision 1/2 at recall 1)
    assert stats["ap"][0, 0] == pytest.approx(0.5, abs=0.02)


def test_apmeter_ignore_semantics():
    """A prediction matching an unlabeled (−100) GT must be excluded from the
    PR curve entirely (metrics.py:325-333) — AP stays 1.0."""
    m = APMeter()
    gt = boxes_at([[20, 20], [80, 80]])
    preds = boxes_at([[20, 20], [80, 80]])
    m.add(
        {"boxes": preds, "scores": np.array([0.9, 0.95]), "labels": np.array([1, 1])},
        {"boxes": gt, "labels": np.array([1, -100])},
    )
    stats = m.ap_per_class()
    assert stats["labels"] == [1]
    assert stats["counts"] == [1]
    assert stats["ap"][0, 0] == pytest.approx(1.0, abs=0.01)

    # without ignore handling, the same data scores AP 0.5
    stats2 = m.ap_per_class(ignore=[])
    assert stats2["ap"][stats2["labels"].index(1), 0] == pytest.approx(0.5, abs=0.02)


def test_apmeter_mask_iou_type():
    m = APMeter()
    masks = np.zeros((2, 16, 16))
    masks[0, :8, :8] = 1
    masks[1, 8:, 8:] = 1
    out = {"boxes": boxes_at([[4, 4], [12, 12]]), "scores": np.array([0.9, 0.8]),
           "labels": np.array([1, 1]), "masks": masks}
    tgt = {"boxes": boxes_at([[4, 4], [12, 12]]), "labels": np.array([1, 1]), "masks": masks}
    m.add(out, tgt, iou_type="masks")
    stats = m.ap_per_class()
    np.testing.assert_allclose(stats["ap"][0], 1.0, atol=0.01)


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=3, conf=0.25, iou_thres=0.45)
    gt = np.concatenate([[[0]], boxes_at([[20, 20]])], 1)  # class 0
    det_tp = np.concatenate([boxes_at([[20, 20]]), [[0.9, 0]]], 1)
    det_fp = np.concatenate([boxes_at([[90, 90]]), [[0.8, 2]]], 1)
    cm.process_batch(np.concatenate([det_tp, det_fp]), gt)
    assert cm.matrix[0, 0] == 1  # TP class 0
    assert cm.matrix[2, 3] == 1  # class-2 det on background
    tp, fp = cm.tp_fp()
    assert tp[0] == 1 and fp[2] == 1


def test_evaluate_detection_stats():
    gt = {"boxes": boxes_at([[20, 20], [60, 60]]), "labels": np.array([1, 2])}
    out = {"boxes": boxes_at([[21, 20], [100, 100]]), "labels": np.array([1, 2])}
    precision, recall, per_class = evaluate_detection(gt, out, classes=[1, 2])
    n_matched, n1, n2, miou = per_class[1]
    assert (n_matched, n1, n2) == (1, 1, 1) and miou > 0.8
    assert per_class[2][0] == 0  # class-2 pred far from class-2 gt
    summary = summarize_precision_recall([per_class], {1: "tumor", 2: "stromal"})
    assert summary["tumor"]["precision"] == 1.0
    assert np.isnan(summary["stromal"]["f1"]) or summary["stromal"]["f1"] == 0


def test_mcc_matches_sklearn(rng):
    from sklearn.metrics import matthews_corrcoef as sk_mcc

    y_true = rng.integers(0, 4, 200)
    y_pred = np.where(rng.uniform(size=200) < 0.7, y_true, rng.integers(0, 4, 200))
    assert matthews_corrcoef(y_true, y_pred) == pytest.approx(sk_mcc(y_true, y_pred), abs=1e-9)


def test_coverage_accuracy_miou():
    y_true = np.array([1, 2, 3, -100])
    y_pred = np.array([1, 2, -1, 1])  # third unmatched
    ious = np.array([0.9, 0.8, 0.0, 0.7])
    cov, acc, miou = coverage_accuracy_miou(y_true, y_pred, ious, num_classes=3)
    assert cov == pytest.approx(0.75)
    assert miou == pytest.approx(np.mean([0.9, 0.8, 0.7]))
    # acc: matched = [1,2,-100→0]; weights zero out unlabeled → 100% on classes
    assert acc == pytest.approx(1.0)
