"""Detection + segmentation losses — pure masked functions.

Behavioral reference: ``/root/reference/metayolo/models/loss.py``:
  * ``DetLoss`` (:124-244) — CIoU box loss, IoU-weighted objectness BCE with
    per-level balance, BCE classification on one-hot slices with the
    "unlabeled objects" filter (first column), positive/class weights,
    optional focal wrapping, label smoothing.
  * ``SegLoss`` (:247-283) — per-ROI BCE (or soft-dice) on the mask channel
    selected by ``mask_indices``, skipping empty targets / label −1.

Static-shape adaptation: the reference filters candidate rows; here every
candidate keeps its slot and reductions are validity-weighted means, so the
grad tree is always dense (the JAX answer to DDP's find_unused_parameters —
SURVEY.md §5.2).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou
from .matcher import LevelMatches

Array = jnp.ndarray

DEFAULT_LOSS_HYP = {
    "box": 0.05, "cls": 0.05, "obj": 1.0,
    "cls_pw": 1.0, "obj_pw": 1.0, "cls_cw": 1.0, "fl_gamma": 0.0,
    "iou_t": 0.20, "anchor_t": 4.0, "label_smoothing": 0.0,
    "mask": 1.0, "mask_type": "bce", "mask_iou_t": 0.8,
}


def get_loss_hyp(hyp: Optional[dict] = None) -> dict:
    out = dict(DEFAULT_LOSS_HYP)
    if hyp:
        out.update({k: v for k, v in dict(hyp).items() if k in out or k == "type"})
        if "type" in out:  # reference SegLoss uses key 'type'
            out["mask_type"] = out.pop("type")
    return out


def smooth_label(x: Array, eps: float) -> Array:
    """loss.py:20-21."""
    return x - (x - 0.5) * eps


def bce_with_logits(logits: Array, targets: Array, pos_weight: float = 1.0) -> Array:
    """Elementwise binary cross-entropy with logits + positive-class weight.

    Matches torch BCEWithLogitsLoss(pos_weight=w): loss = -[w·t·log σ(x) + (1−t)·log(1−σ(x))].
    Numerically stable via log-sigmoid.
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def q_focal_factor(logits: Array, targets: Array, gamma: float, alpha: float = 0.25) -> Array:
    """Quality-focal modulation |t − σ(x)|^γ · α-factor (loss.py:96-121
    QFocalLoss) — multiply an elementwise BCE by this."""
    p = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return alpha_factor * jnp.abs(targets - p) ** gamma


def bce_blur_with_logits(logits: Array, targets: Array, alpha: float = 0.05) -> Array:
    """BCE with reduced missing-label effect (loss.py:51-65
    BCEBlurWithLogitsLoss): confident false positives (σ(x)−t → 1) are
    down-weighted by 1 − exp((dx − 1)/(α + 1e−4))."""
    loss = bce_with_logits(logits, targets)
    dx = jax.nn.sigmoid(logits) - targets
    return loss * (1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4)))


def autobalance_update(balance, obj_losses, ssi: int = 0, momentum: float = 0.9999):
    """The reference's per-level objectness auto-balance EMA
    (loss.py:233-237): balance_i ← m·balance_i + (1−m)/obj_i, renormalized by
    the ``ssi`` level.  Pure function — thread the returned balance through
    the train-step carry when hyp enables it (reference default: off)."""
    b = jnp.asarray(balance, jnp.float32)
    o = jnp.maximum(jnp.asarray(obj_losses, jnp.float32), 1e-12)
    b = b * momentum + (1.0 - momentum) / o
    return b / b[ssi]


def focal_factor(logits: Array, targets: Array, gamma: float, alpha: float = 0.25) -> Array:
    """TF-style focal modulation (loss.py:78-88)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return alpha_f * (1.0 - p_t) ** gamma


def masked_mean(x: Array, mask: Array, axis=None) -> Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def det_loss(
    dets: Sequence[Array],                # per level (B, ny, nx, A, no) raw logits
    matches: Sequence[LevelMatches],
    gt_labels_onehot: Array,              # (B, T, nc+1); col 0 = unlabeled
    active: Array,                        # (B,) bool — image has this task
    hyp: dict,
    nc: int,
) -> Tuple[Array, Dict[str, Array], List[Array]]:
    """YOLOv5 multi-part detection loss (loss.py:190-244), padded/masked.

    Returns (total_loss, loss_items, per-level candidate CIoU arrays for the
    mask branch's proposal-quality ranking).
    """
    nl = len(dets)
    balance = {3: [4.0, 1.0, 0.4]}.get(nl, [4.0, 1.0, 0.25, 0.06, 0.02])
    B, T = gt_labels_onehot.shape[:2]
    labels_flat = gt_labels_onehot.reshape(B * T, -1)

    f32 = jnp.float32
    lbox = jnp.zeros((), f32)
    lobj = jnp.zeros((), f32)
    lcls = jnp.zeros((), f32)
    cand_ious: List[Array] = []
    gamma = float(hyp["fl_gamma"])
    cls_cw = jnp.asarray(hyp["cls_cw"], f32)  # scalar or (nc,) class weights

    for i, (pi, m) in enumerate(zip(dets, matches)):
        pi = pi.astype(f32)
        Bp, ny, nx, A, no = pi.shape
        pr = pi[m.b, m.gj, m.gi, m.a]  # (N, no)
        mvalid = m.valid & active[m.b]

        # --- box: CIoU on decoded candidate boxes (loss.py:204-208)
        pxy = jax.nn.sigmoid(pr[:, 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(pr[:, 2:4]) * 2.0) ** 2 * m.anchor_wh
        pbox = jnp.concatenate([pxy, pwh], -1)
        # padded slots carry zero-wh GT boxes → CIoU's arctan(w/h) would NaN and
        # poison the masked mean; substitute a unit box in invalid slots.
        tbox = jnp.where(mvalid[:, None], m.tbox, jnp.asarray([0.0, 0.0, 1.0, 1.0], f32))
        iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True)[:, 0]  # (N,)
        lbox = lbox + masked_mean(1.0 - iou, mvalid)
        cand_ious.append(iou)

        # --- objectness: scatter detached IoU into the grid (loss.py:211-217)
        iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        flat_idx = jnp.where(
            mvalid,
            ((m.b * ny + m.gj) * nx + m.gi) * A + m.a,
            Bp * ny * nx * A,  # dump slot → dropped
        )
        tobj = (
            jnp.zeros((Bp * ny * nx * A,), f32)
            .at[flat_idx]
            .max(iou_d, mode="drop")
            .reshape(Bp, ny, nx, A)
        )
        obj_bce = bce_with_logits(pi[..., 4], tobj, pos_weight=float(hyp["obj_pw"]))
        if gamma > 0:
            obj_bce = obj_bce * focal_factor(pi[..., 4], tobj, gamma)
        # images without this task contribute nothing (reference removes them
        # from the batch entirely — yolo.py:64-70)
        obji = masked_mean(obj_bce, jnp.broadcast_to(active[:, None, None, None], obj_bce.shape))
        lobj = lobj + obji * balance[i]

        # --- classification on labeled candidates (loss.py:220-229)
        if nc > 1:
            tlab = labels_flat[m.obj_idx]  # (N, nc+1)
            labeled = mvalid & (jnp.sum(tlab[:, 1:], -1) > 0)
            target = smooth_label(tlab[:, 1:], float(hyp["label_smoothing"]))
            cls_bce = bce_with_logits(pr[:, 5:], target, pos_weight=float(hyp["cls_pw"]))
            if gamma > 0:
                cls_bce = cls_bce * focal_factor(pr[:, 5:], target, gamma)
            cls_bce = cls_bce * cls_cw  # class weights (WeightReduceLoss)
            lcls = lcls + masked_mean(cls_bce, jnp.broadcast_to(labeled[:, None], cls_bce.shape))

    lbox = lbox * float(hyp["box"])
    lobj = lobj * float(hyp["obj"])
    lcls = lcls * float(hyp["cls"])
    bs = jnp.sum(active.astype(f32))  # reference scales by (task-reduced) batch size
    total = (lbox + lobj + lcls) * bs
    items = {
        "box": jax.lax.stop_gradient(lbox),
        "obj": jax.lax.stop_gradient(lobj),
        "cls": jax.lax.stop_gradient(lcls),
    }
    return total, items, cand_ious


def seg_loss(
    mask_logits: Array,   # (R, Hm, Wm, nc_masks)
    mask_targets: Array,  # (R, Hm, Wm) binary in-box GT masks
    mask_labels: Array,   # (R,) mask channel per ROI; −1 → ignore
    roi_valid: Array,     # (R,) bool
    hyp: dict,
) -> Array:
    """Per-ROI mask loss on the label-selected channel (loss.py:247-283)."""
    R = mask_logits.shape[0]
    ch = jnp.clip(mask_labels, 0, mask_logits.shape[-1] - 1)
    logits = jnp.take_along_axis(
        mask_logits, ch[:, None, None, None], axis=-1
    )[..., 0].astype(jnp.float32)  # (R, Hm, Wm)

    keep = roi_valid & (mask_labels >= 0) & (jnp.sum(mask_targets, axis=(1, 2)) > 0)
    tgt = mask_targets.astype(jnp.float32)
    if hyp.get("mask_type", "bce") == "dice":
        prod = jnp.sum(jax.nn.sigmoid(logits) * tgt, axis=(1, 2))
        plus = jnp.sum(jax.nn.sigmoid(logits) + tgt, axis=(1, 2))
        per_roi = 1.0 - 2.0 * prod / jnp.maximum(plus, 1e-6)
        loss = masked_mean(per_roi, keep)
    else:
        bce = bce_with_logits(logits, tgt)
        loss = masked_mean(bce, jnp.broadcast_to(keep[:, None, None], bce.shape))
    return loss * float(hyp["mask"])
