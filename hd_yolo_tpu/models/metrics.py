"""Detection metrics — streaming mAP, confusion matrix, NuCLS summaries.

Host-side numpy (metrics never sit on the hot device path; the model emits
padded detection arrays, the meter consumes the valid slots).

Behavioral reference: ``/root/reference/metayolo/models/metrics.py``:
  * ``compute_ap`` 101-point interpolated AP (:86-111),
  * ``ap_per_class`` PR curves + max-F1 operating point (:19-83),
  * ``ConfusionMatrix`` IoU-matched (:114-203),
  * ``APMeter`` streaming matcher with ignore-class semantics for the
    unlabeled (−100) / ignore (−1) classes (:251-395) — the subtle part:
    predictions matched to ignored GT are *excluded* from the PR curves,
  * ``evaluate_detection`` / ``weighted_average_pr`` / ``summarize_*`` NuCLS
    summaries (:411-633) including multi-class Matthews correlation.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


# --------------------------------------------------------------------------- ap
def compute_ap(recall: np.ndarray, precision: np.ndarray):
    """101-point interpolated AP (COCO style)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x)
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls, eps: float = 1e-16):
    """PR curves per class + max-F1 operating point (metrics.py:19-83).

    tp: (n, n_iouv) bool; conf: (n,); pred_cls: (n,); target_cls: (m,).
    Returns (tp, fp, p, r, f1, ap, unique_classes).
    """
    i = np.argsort(-conf, kind="stable")
    tp, conf, pred_cls = tp[i], conf[i], pred_cls[i]
    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]

    px = np.linspace(0, 1, 1000)
    ap = np.zeros((nc, tp.shape[1]))
    p, r = np.zeros((nc, 1000)), np.zeros((nc, 1000))
    for ci, c in enumerate(unique_classes):
        sel = pred_cls == c
        n_l, n_p = nt[ci], sel.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[sel]).cumsum(0)
        tpc = tp[sel].cumsum(0)
        recall = tpc / (n_l + eps)
        r[ci] = np.interp(-px, -conf[sel], recall[:, 0], left=0)
        precision = tpc / (tpc + fpc)
        p[ci] = np.interp(-px, -conf[sel], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], _, _ = compute_ap(recall[:, j], precision[:, j])

    f1 = 2 * p * r / (p + r + eps)
    i = f1.mean(0).argmax()
    p, r, f1 = p[:, i], r[:, i], f1[:, i]
    tp_ = (r * nt).round()
    fp_ = (tp_ / (p + eps) - tp_).round()
    return tp_, fp_, p, r, f1, ap, unique_classes.astype("int32")


# ------------------------------------------------------------------- iou utils
def box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def get_mask_ious(y_true: np.ndarray, y_pred: np.ndarray) -> np.ndarray:
    """(n, h, w) × (m, h, w) mask-IoU matrix (utils_nucls.py:480-490)."""
    if len(y_true) == 0 or len(y_pred) == 0:
        return np.zeros((len(y_true), len(y_pred)))
    t = y_true.reshape(len(y_true), -1).astype(np.float64)
    p = y_pred.reshape(len(y_pred), -1).astype(np.float64)
    inter = t @ p.T
    union = t.sum(1)[:, None] + p.sum(1)[None] - inter + 1e-8
    return inter / union


# --------------------------------------------------------------- ConfusionMatrix
class ConfusionMatrix:
    """IoU-matched detection confusion matrix (metrics.py:114-169)."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.matrix = np.zeros((nc + 1, nc + 1))
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres

    def process_batch(self, detections: np.ndarray, labels: np.ndarray):
        """detections (N, 6): x1,y1,x2,y2,conf,class; labels (M, 5): class,x1,y1,x2,y2."""
        detections = detections[detections[:, 4] > self.conf]
        gt_classes = labels[:, 0].astype(int)
        det_classes = detections[:, 5].astype(int)
        iou = box_iou_np(labels[:, 1:], detections[:, :4])

        gi, di = np.where(iou > self.iou_thres)
        if len(gi):
            matches = np.stack([gi, di, iou[gi, di]], 1)
            if len(gi) > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
        else:
            matches = np.zeros((0, 3))

        n = matches.shape[0] > 0
        m0, m1 = matches[:, 0].astype(int), matches[:, 1].astype(int)
        for i, gc in enumerate(gt_classes):
            j = m0 == i
            if n and j.sum() == 1:
                self.matrix[det_classes[m1[j]][0], gc] += 1
            else:
                self.matrix[self.nc, gc] += 1  # background FP
        if n:
            for i, dc in enumerate(det_classes):
                if not (m1 == i).any():
                    self.matrix[dc, self.nc] += 1  # background FN

    def tp_fp(self):
        tp = self.matrix.diagonal()
        fp = self.matrix.sum(1) - tp
        return tp[:-1], fp[:-1]


# ------------------------------------------------------------------- APMeter
class APMeter:
    """Streaming AP accumulator with ignore-class semantics (metrics.py:251-395).

    Per image, ``add`` records score-sorted predictions, all candidate
    (pred, gt) pairs with IoU ≥ min(iouv) sorted by IoU desc, and the GT
    labels.  ``ap_per_class`` then resolves 1-vs-1 matches and computes
    per-class PR/AP at every IoU threshold, excluding predictions that
    matched ignored GT (labels −100 unclassified / −1).
    """

    def __init__(self, labels_text: Optional[Dict[int, str]] = None):
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.labels_text = labels_text or {}
        self.reset()

    def reset(self):
        self.n_pred, self.n_true, self.n_match = 0, 0, 0
        self.scores: List[np.ndarray] = []
        self.y_pred: List[np.ndarray] = []
        self.y_true: List[np.ndarray] = []
        self.ious: List[np.ndarray] = []
        self.m_pred: List[np.ndarray] = []
        self.m_true: List[np.ndarray] = []

    def add(self, output: Dict[str, np.ndarray], target: Dict[str, np.ndarray],
            iou_type: str = "boxes"):
        scores = np.asarray(output["scores"], np.float64)
        order = np.argsort(-scores, kind="stable")
        o_scores = scores[order]
        o_labels = np.asarray(output["labels"])[order]

        if iou_type == "masks" and "masks" in output and "masks" in target:
            ious = get_mask_ious(np.asarray(output["masks"])[order], np.asarray(target["masks"]))
        else:
            ious = box_iou_np(np.asarray(output["boxes"])[order], np.asarray(target["boxes"]))
        n_pred, n_true = ious.shape

        pi, ti = np.where(ious >= self.iouv.min())
        pair_ious = ious[pi, ti]
        o2 = np.argsort(-pair_ious, kind="stable")
        pi, ti, pair_ious = pi[o2], ti[o2], pair_ious[o2]

        self.m_pred.append(pi + self.n_pred)
        self.m_true.append(ti + self.n_true)
        self.ious.append(pair_ious)
        self.n_match += len(pair_ious)
        self.y_true.append(np.asarray(target["labels"]))
        self.n_true += n_true
        self.y_pred.append(o_labels)
        self.scores.append(o_scores)
        self.n_pred += n_pred

    def _cat(self):
        cat = lambda xs, dt: np.concatenate(xs).astype(dt) if xs else np.zeros(0, dt)
        return (
            cat(self.scores, np.float64), cat(self.y_pred, np.int64),
            cat(self.y_true, np.int64), cat(self.ious, np.float64),
            cat(self.m_pred, np.int64), cat(self.m_true, np.int64),
        )

    def ap_per_class(self, iouv: Optional[np.ndarray] = None,
                     ignore: Sequence[int] = (-100, -1), eps: float = 1e-16):
        if iouv is None:
            iouv = self.iouv
        scores, y_pred, y_true, ious, m_pred, m_true = self._cat()

        matches = np.stack([m_true.astype(np.float64), m_pred.astype(np.float64), ious], -1)
        if len(ignore):
            ignored = np.isin(y_true[m_true], ignore) | np.isin(y_pred[m_pred], ignore)
            if ignored.any():
                matches = matches[~ignored]
        else:
            ignored = np.zeros(0, bool)
        # 1-vs-1 resolution, exactly the reference order (no re-sort between):
        matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
        matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
        matches = matches[y_true[matches[:, 0].astype(int)] == y_pred[matches[:, 1].astype(int)]]
        pred_matches = np.zeros((self.n_pred, len(iouv)), bool)
        pred_matches[matches[:, 1].astype(int)] = matches[:, -1:] >= iouv

        # drop predictions that matched ignored GT (and weren't finally matched)
        if ignored.any():
            mask = np.ones(self.n_pred, bool)
            mask[np.setdiff1d(m_pred[ignored], matches[:, 1].astype(int))] = False
            pred_matches = pred_matches[mask]
            pred_scores = scores[mask]
            pred_labels = y_pred[mask]
        else:
            pred_scores, pred_labels = scores, y_pred

        order = np.argsort(-pred_scores, kind="stable")
        pred_scores, pred_matches, pred_labels = (
            pred_scores[order], pred_matches[order], pred_labels[order]
        )

        px = np.linspace(0, 1, 1000)
        py, counts, labels = [], [], []
        ap, p, r = [], [], []
        for c, n_true in zip(*np.unique(y_true, return_counts=True)):
            if c in ignore:
                continue
            keep = pred_labels == c
            labels.append(int(c))
            counts.append(int(n_true))
            if keep.sum() == 0 or n_true == 0:
                ap.append(np.zeros(len(iouv)))
                r.append(np.zeros(len(px)))
                p.append(np.zeros(len(px)))
                py.append(np.zeros(len(px)))
                continue
            fpc = (~pred_matches[keep]).cumsum(0)
            tpc = pred_matches[keep].cumsum(0)
            recall = tpc / (n_true + eps)
            r.append(np.interp(-px, -pred_scores[keep], recall[:, 0], left=0))
            precision = tpc / (tpc + fpc)
            p.append(np.interp(-px, -pred_scores[keep], precision[:, 0], left=1))
            ap.append(np.zeros(len(iouv)))
            for j in range(pred_matches.shape[1]):
                ap[-1][j], mpre, mrec = compute_ap(recall[:, j], precision[:, j])
                if j == 0:
                    py.append(np.interp(px, mrec, mpre))

        stats = {
            "labels": labels, "counts": counts, "px": px,
            "py": np.stack(py) if py else np.zeros((0, len(px))),
            "ap": np.stack(ap) if ap else np.zeros((0, len(iouv))),
            "p": np.stack(p) if p else np.zeros((0, len(px))),
            "r": np.stack(r) if r else np.zeros((0, len(px))),
        }
        stats["f1"] = 2 * stats["p"] * stats["r"] / (stats["p"] + stats["r"] + eps)
        return stats


# ---------------------------------------------------------------- NuCLS extras
def evaluate_detection(target, output, classes, iou_threshold: float = 0.5,
                       iou_type: str = "boxes"):
    """Best-match P/R + per-class (n_matched, n_true, n_pred, mIoU)
    (metrics.py:411-474)."""
    if iou_type == "masks" and "masks" in output and "masks" in target:
        ious = get_mask_ious(np.asarray(target["masks"]), np.asarray(output["masks"]))
    else:
        ious = box_iou_np(np.asarray(target["boxes"]), np.asarray(output["boxes"]))
    n_true, n_pred = ious.shape
    true_label = np.asarray(target["labels"])
    pred_label = np.asarray(output["labels"])

    if n_true > 0 and n_pred > 0:
        mi, mx = ious.max(1), ious.argmax(1)
        pr = pred_label[mx].copy()
        pr[mi < iou_threshold] = -1
        recall = {"y_true": true_label, "y_pred": pr, "ious": mi}
        mi0, mx0 = ious.max(0), ious.argmax(0)
        tl = true_label[mx0].copy()
        tl[mi0 < iou_threshold] = -1
        precision = {"y_true": tl, "y_pred": pred_label, "ious": mi0}
    else:
        recall = {"y_true": true_label, "y_pred": -np.ones_like(true_label),
                  "ious": np.zeros(len(true_label))}
        precision = {"y_true": -np.ones_like(pred_label), "y_pred": pred_label,
                     "ious": np.zeros(len(pred_label))}

    stats_per_class = {}
    for c in classes:
        t_idx, o_idx = true_label == c, pred_label == c
        n1, n2 = int(t_idx.sum()), int(o_idx.sum())
        m_iou, n_matched = 0.0, 0
        if n1 > 0 and n2 > 0:
            ious_c = ious[t_idx][:, o_idx]
            mi = ious_c.max(1)
            keep = mi >= iou_threshold
            n_matched = int(keep.sum())
            if n_matched:
                m_iou = float(mi[keep].mean())
        stats_per_class[c] = [n_matched, n1, n2, m_iou]
    return precision, recall, stats_per_class


def summarize_precision_recall(stats_list, labels_text):
    """Aggregate per-image evaluate_detection stats (metrics.py:601-616)."""
    stat_sum = defaultdict(list)
    for stat in stats_list:
        for k, v in stat.items():
            stat_sum[k].append(v)
    res = {}
    for k, v in stat_sum.items():
        tmp = np.array(v)
        n_matched, n_true, n_pred = tmp[:, 0].sum(), tmp[:, 1].sum(), tmp[:, 2].sum()
        m_iou = tmp[:, 3].mean()
        precision = n_matched / n_pred if n_pred > 0 else np.nan
        recall = n_matched / n_true if n_true > 0 else np.nan
        f = 2 * precision * recall / (precision + recall) if (precision + recall) else np.nan
        res[labels_text.get(k, k)] = {
            "precision": precision, "recall": recall, "f1": f, "miou": m_iou
        }
    return res


def weighted_accuracy(y_pred, y_true, weight=None):
    """metrics.py:522-535."""
    y_pred, y_true = np.asarray(y_pred), np.asarray(y_true)
    if len(y_pred) == 0:
        return 0.0
    if weight is not None:
        w = np.asarray(weight)[y_true]
        return float((w * (y_true == y_pred)).sum() / max(w.sum(), 1e-12))
    return float((y_true == y_pred).mean())


def coverage_accuracy_miou(y_true, y_pred, ious, num_classes: int = 6):
    """NuCLS coverage / class-weighted accuracy / mean IoU (metrics.py:538-557)."""
    y_true, y_pred, ious = map(np.asarray, (y_true, y_pred, ious))
    counts = [(y_true == c).sum() for c in range(1, num_classes + 1)]
    class_weights = [1.0 / c if c > 0 else 0.0 for c in counts]
    matched = y_pred != -1
    mean_iou = float(ious[matched].mean()) if matched.any() else 0.0
    coverage = float(matched.mean()) if len(y_true) else 0.0
    accuracy = weighted_accuracy(
        y_pred[matched], np.clip(y_true[matched], 0, None), [0.0] + class_weights
    )
    return coverage, accuracy, mean_iou


def matthews_corrcoef(y_true, y_pred) -> float:
    """Multi-class MCC (sklearn-compatible), implemented directly."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    classes = np.unique(np.concatenate([y_true, y_pred]))
    idx = {c: i for i, c in enumerate(classes)}
    k = len(classes)
    C = np.zeros((k, k), np.float64)
    for t, p in zip(y_true, y_pred):
        C[idx[t], idx[p]] += 1
    t_sum = C.sum(1)
    p_sum = C.sum(0)
    n = C.sum()
    cov_tp = np.trace(C) * n - t_sum @ p_sum
    cov_tt = n * n - t_sum @ t_sum
    cov_pp = n * n - p_sum @ p_sum
    denom = np.sqrt(cov_tt * cov_pp)
    return float(cov_tp / denom) if denom else 0.0


def summarize_mcc(y_true, y_pred, core_labels=("tumor", "stromal", "sTILs")):
    """NuCLS-paper MCC table (metrics.py:619-632)."""
    res = {}
    idx = [t in core_labels for t in y_true]
    yt = [v for m, v in zip(idx, y_true) if m]
    yp = [v for m, v in zip(idx, y_pred) if m]
    res["mcc"] = matthews_corrcoef(yt, yp)
    for c in core_labels:
        res[("mcc", c)] = matthews_corrcoef([t == c for t in yt], [p == c for p in yp])
    return res


def summarize_confusion_matrix(cm, labels, core_labels=("tumor", "stromal", "sTILs")):
    """NuCLS coverage/accuracy/per-class P-R-F from a labeled confusion matrix
    (metrics.py:580-598).  ``labels`` must contain 'other', 'missing',
    'unlabeled' rows/cols like the reference."""
    import pandas as pd

    cm = pd.DataFrame(cm, index=list(labels), columns=list(labels))
    cm = cm.drop("other", axis=0).drop("missing", axis=0)
    coverage = 1 - cm["missing"].values.sum() / cm.values.sum()
    cm_core = cm.drop("unlabeled", axis=0).drop("unlabeled", axis=1)
    K = len(np.diag(cm_core))
    accuracy = np.diag(cm_core.values).sum() / cm_core.values.sum()
    accuracy_c = np.diag(cm_core.values).sum() / cm_core.values[:K, :K].sum()
    precision = np.diag(cm_core.values) / cm_core.values.sum(0)[:K]
    recall = np.diag(cm_core.values) / cm_core.values.sum(1)[:K]
    f = 2 * precision * recall / (precision + recall)
    return {
        "coverage": coverage, "accuracy_c": accuracy_c, "accuracy": accuracy,
        "cm": cm, "cm_core": cm_core,
        **{("precision", n): v for n, v in zip(core_labels, precision)},
        **{("recall", n): v for n, v in zip(core_labels, recall)},
        **{("f1", n): v for n, v in zip(core_labels, f)},
    }
