"""Anchor-free decoupled detection head with SimOTA assignment (YOLOv6/X family).

Behavioral reference: ``/root/reference/metayolo/models/yolov6_head.py``
(decoupled per-level stem/cls/reg branches, exp-wh anchor-free decode
:142-168, objectness NMS outputs) and ``loss_yolov6.py:126-520``
(``ComputeLoss``: center-prior candidate selection, dynamic-k SimOTA matching
by cls+IoU cost, IoU/cls/obj losses).

TPU-first: the assignment is fully vectorized over the padded (cells × T)
matrix — dynamic-k becomes a rank-vs-k mask over a static top-K slice; no
per-GT python loops, no boolean compaction.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import bbox_iou, box_iou, xywh2xyxy, xyxy2xywh
from ..ops.nms import nms_per_image
from .layers import ConvBnAct
from .losses import bce_with_logits, masked_mean

Array = jnp.ndarray


def make_cell_centers(level_shapes: Sequence[Tuple[int, int]],
                      strides: Sequence[float]) -> Tuple[Array, Array]:
    """All cells across levels → centers (N, 2) px + per-cell stride (N,)."""
    centers, strs = [], []
    for (ny, nx), s in zip(level_shapes, strides):
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        c = jnp.stack([(gx + 0.5) * s, (gy + 0.5) * s], -1).reshape(-1, 2)
        centers.append(c)
        strs.append(jnp.full((ny * nx,), s, jnp.float32))
    return jnp.concatenate(centers), jnp.concatenate(strs)


def simota_assign(
    pred_boxes: Array,   # (N, 4) xyxy px (decoded, detached)
    cls_logits: Array,   # (N, nc)
    obj_logits: Array,   # (N,)
    centers: Array,      # (N, 2)
    strides: Array,      # (N,)
    gt_boxes: Array,     # (T, 4) xyxy px
    gt_labels: Array,    # (T,) 1..nc
    gt_valid: Array,     # (T,) bool
    center_radius: float = 2.5,
    topk: int = 10,
) -> Tuple[Array, Array, Array]:
    """Dynamic-k SimOTA (loss_yolov6.py:363-520), fully vectorized.

    Returns (matched_gt (N,), fg_mask (N,), assigned_iou (N,)).
    """
    N, T = pred_boxes.shape[0], gt_boxes.shape[0]
    # center prior: cell center inside gt box OR within radius·stride of gt center
    in_box = (
        (centers[:, None, 0] > gt_boxes[None, :, 0])
        & (centers[:, None, 0] < gt_boxes[None, :, 2])
        & (centers[:, None, 1] > gt_boxes[None, :, 1])
        & (centers[:, None, 1] < gt_boxes[None, :, 3])
    )
    gt_cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gt_cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = center_radius * strides[:, None]
    in_center = (
        (jnp.abs(centers[:, None, 0] - gt_cx[None]) < r)
        & (jnp.abs(centers[:, None, 1] - gt_cy[None]) < r)
    )
    candidate = (in_box | in_center) & gt_valid[None, :]  # (N, T)

    ious = box_iou(pred_boxes, gt_boxes)  # (N, T)
    cls_prob = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    gt_onehot = jax.nn.one_hot(jnp.clip(gt_labels - 1, 0), cls_logits.shape[1])  # (T, nc)
    p = jnp.clip(cls_prob, 1e-8, 1 - 1e-8)
    cls_cost = -(
        gt_onehot[None] * jnp.log(p[:, None, :])
        + (1 - gt_onehot[None]) * jnp.log(1 - p[:, None, :])
    ).sum(-1)  # (N, T)
    cost = cls_cost + 3.0 * (-jnp.log(ious + 1e-8)) + 1e5 * (~candidate)

    # dynamic k per gt: clamp(sum of top-10 candidate IoUs, 1, topk)
    iou_cand = jnp.where(candidate, ious, 0.0)
    topk_ious = jax.lax.top_k(iou_cand.T, min(topk, N))[0]  # (T, topk)
    dyn_k = jnp.clip(jnp.sum(topk_ious, -1).astype(jnp.int32), 1, topk)

    # per gt: take static top-K lowest-cost candidates, keep rank < dyn_k
    neg_cost, cand_idx = jax.lax.top_k(-cost.T, min(topk, N))  # (T, topk)
    rank = jax.lax.broadcasted_iota(jnp.int32, dyn_k.shape + (min(topk, N),), 1)
    keep = (rank < dyn_k[:, None]) & gt_valid[:, None]
    assign = jnp.zeros((T, N), bool).at[
        jnp.arange(T)[:, None], cand_idx
    ].set(keep)  # (T, N) one row per gt
    assign = assign.T & candidate  # (N, T)

    # conflict resolution: anchor keeps the min-cost gt among its assignments
    n_assign = assign.sum(-1)
    best_gt = jnp.argmin(jnp.where(assign, cost, jnp.inf), axis=-1)
    fg = n_assign > 0
    matched_iou = jnp.where(fg, ious[jnp.arange(N), best_gt], 0.0)
    return best_gt, fg, matched_iou


class AnchorFreeDetect(nn.Module):
    """Decoupled anchor-free header: per level stem → (cls branch, reg branch).

    Outputs rows [x, y, w, h, obj, cls...] compatible with the shared
    ``nms_per_image`` post-processing.
    """

    nc: int
    strides: Tuple[float, ...]
    width: int = 128
    nms_params: Tuple[Tuple[str, float], ...] = (
        ("conf_thres", 0.15), ("iou_thres", 0.45), ("max_det", 300)
    )
    pre_nms_topk: int = 1024
    dtype: Any = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.strides)

    def setup(self):
        w = self.width
        self.stems = [ConvBnAct(w, 1, dtype=self.dtype, name=f"stem{i}") for i in range(self.nl)]
        self.cls_convs = [ConvBnAct(w, 3, dtype=self.dtype, name=f"cls_conv{i}") for i in range(self.nl)]
        self.reg_convs = [ConvBnAct(w, 3, dtype=self.dtype, name=f"reg_conv{i}") for i in range(self.nl)]
        self.cls_preds = [nn.Conv(self.nc, (1, 1), dtype=self.dtype, name=f"cls_pred{i}") for i in range(self.nl)]
        self.reg_preds = [nn.Conv(4, (1, 1), dtype=self.dtype, name=f"reg_pred{i}") for i in range(self.nl)]
        self.obj_preds = [nn.Conv(1, (1, 1), dtype=self.dtype, name=f"obj_pred{i}") for i in range(self.nl)]

    def _branches(self, features, train):
        cls_l, reg_l, obj_l, shapes = [], [], [], []
        for i, f in enumerate(features):
            t = self.stems[i](f, train=train)
            c = self.cls_convs[i](t, train=train)
            r = self.reg_convs[i](t, train=train)
            B, ny, nx, _ = f.shape
            cls_l.append(self.cls_preds[i](c).reshape(B, ny * nx, self.nc))
            reg_l.append(self.reg_preds[i](r).reshape(B, ny * nx, 4))
            obj_l.append(self.obj_preds[i](r).reshape(B, ny * nx))
            shapes.append((ny, nx))
        return (
            jnp.concatenate(cls_l, 1), jnp.concatenate(reg_l, 1),
            jnp.concatenate(obj_l, 1), shapes,
        )

    def decode(self, reg: Array, centers: Array, strides: Array) -> Array:
        """(…, N, 4) raw reg → xywh px: xy=(pred·s + center), wh=exp(pred)·s
        (yolov6_head.py:155-160, anchor-free)."""
        xy = reg[..., :2] * strides[..., None] + centers
        wh = jnp.exp(jnp.clip(reg[..., 2:4], -10.0, 8.0)) * strides[..., None]
        return jnp.concatenate([xy, wh], -1)

    def __call__(self, features, targets=None, train=False, compute_masks=False):
        cls_l, reg_l, obj_l, shapes = self._branches(features, train)
        cls_l = cls_l.astype(jnp.float32)
        reg_l = reg_l.astype(jnp.float32)
        obj_l = obj_l.astype(jnp.float32)
        centers, strides = make_cell_centers(shapes, self.strides)

        losses: Dict[str, Array] = {}
        if targets is not None:
            losses = self._loss(cls_l, reg_l, obj_l, centers, strides, shapes, targets)

        outputs: Dict[str, Array] = {}
        if not train:
            boxes_xywh = self.decode(reg_l, centers[None], strides[None])
            lvl = jnp.concatenate(
                [jnp.full((ny * nx, 1), float(i)) for i, (ny, nx) in enumerate(shapes)]
            )
            rows = jnp.concatenate(
                [boxes_xywh, jax.nn.sigmoid(obj_l)[..., None],
                 jax.nn.sigmoid(cls_l),
                 jnp.broadcast_to(lvl[None], obj_l.shape + (1,))], -1,
            )
            p = dict(self.nms_params)
            det = jax.vmap(
                lambda x: nms_per_image(
                    x, nc=self.nc, conf_thres=p["conf_thres"],
                    iou_thres=p["iou_thres"], max_det=int(p["max_det"]),
                    pre_nms_topk=self.pre_nms_topk,
                )
            )(rows)
            cls_scores = jnp.max(det["scores"][..., 1:], -1)
            labels = jnp.argmax(det["scores"][..., 1:], -1) + 1
            outputs = {
                "boxes": det["boxes"],
                "scores": det["scores"][..., 0] * cls_scores * det["valid"],
                "labels": jnp.where(det["valid"], labels, -100),
                "levels": det["extra"][..., 0].astype(jnp.int32),
                "valid": det["valid"],
            }
        return losses, outputs

    def _loss(self, cls_l, reg_l, obj_l, centers, strides, shapes, targets):
        img_h = shapes[0][0] * self.strides[0]
        img_w = shapes[0][1] * self.strides[0]
        gt_boxes = targets["boxes"] * jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        gt_valid = targets["valid"]
        gt_labels = jnp.clip(targets["labels"], 0, self.nc)
        active = targets.get("active", jnp.any(gt_valid, -1))

        def per_image(cl, rg, ob, gb, gl, gv, act):
            boxes_xywh = self.decode(rg, centers, strides)
            boxes_xyxy = xywh2xyxy(boxes_xywh)
            best_gt, fg, m_iou = simota_assign(
                jax.lax.stop_gradient(boxes_xyxy),
                jax.lax.stop_gradient(cl),
                jax.lax.stop_gradient(ob),
                centers, strides, gb, gl, gv,
            )
            fg = fg & act
            # obj: target = assigned IoU (quality), bce over all cells
            tobj = jnp.where(fg, m_iou, 0.0)
            l_obj = masked_mean(bce_with_logits(ob, tobj), jnp.full_like(ob, act, bool))
            # cls on fg
            onehot = jax.nn.one_hot(jnp.clip(gl[best_gt] - 1, 0), self.nc)
            l_cls = masked_mean(
                bce_with_logits(cl, onehot),
                jnp.broadcast_to(fg[:, None], cl.shape),
            )
            # box CIoU on fg; padded GT slots are zero-wh boxes whose arctan
            # aspect term is NaN — substitute a unit box for non-fg cells so
            # NaN*0 can't poison the masked mean (same guard as losses.det_loss)
            gt_xywh = xyxy2xywh(gb)[best_gt]
            gt_xywh = jnp.where(
                fg[:, None], gt_xywh, jnp.asarray([0.0, 0.0, 1.0, 1.0], gt_xywh.dtype)
            )
            ciou = bbox_iou(boxes_xywh, gt_xywh, xywh=True, CIoU=True)[:, 0]
            l_box = masked_mean(1.0 - ciou, fg)
            return l_obj, l_cls, l_box

        l_obj, l_cls, l_box = jax.vmap(per_image)(
            cls_l, reg_l, obj_l, gt_boxes, gt_labels, gt_valid, active
        )
        bs = jnp.maximum(jnp.sum(active.astype(jnp.float32)), 1.0)
        total = (l_obj.mean() * 1.0 + l_cls.mean() * 1.0 + l_box.mean() * 5.0) * bs
        items = {
            "obj": jax.lax.stop_gradient(l_obj.mean()),
            "cls": jax.lax.stop_gradient(l_cls.mean()),
            "box": jax.lax.stop_gradient(l_box.mean()),
        }
        return {"det_loss": total, "mask_loss": jnp.zeros(()), "loss_items": items}
