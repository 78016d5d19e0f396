"""Mask R-CNN header: RPN + RoI heads, static-shape TPU formulation.

Behavioral reference: ``/root/reference/hnet/detection/mask_rcnn.py:301-455``
(which wraps torchvision's RPN/RoIHeads with ROI-constrained anchor
generation and per-class logits kept for training consumers).

TPU-first re-design (not a port of torchvision's C++/Python machinery):
  * anchors are generated with iota at trace time per level — no buffers;
  * proposal selection is padded top-K + the ops/ NMS kernel;
  * the train-time pos/neg *random* samplers become deterministic weighted
    losses: every anchor/proposal keeps its slot, positives weigh 1 and
    negatives are globally reweighted to the reference's 1:1 pos/neg budget —
    same expected gradient, no data-dependent shapes;
  * mask targets reuse the dataset's 28×28 in-GT-box masks for matched
    proposals (metayolo's scheme, yolo_head.py:262), avoiding a second
    on-device GT-mask repaint.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import box_iou, clip_boxes, xywh2xyxy, xyxy2xywh
from ..ops.nms import batched_nms_padded, nms_padded
from ..ops.roi_align import multiscale_roi_align_batched

Array = jnp.ndarray

BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def generate_anchors(
    level_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[float],
    sizes: Sequence[float],
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> List[Array]:
    """Per-level (H·W·A, 4) xyxy anchors, EXACTLY torchvision's
    AnchorGenerator convention (golden-tested vs the reference's subclass in
    tests/test_reference_golden_hnet.py): zero-centered cell anchors with
    rounded corners, shifted by i·stride (grid corners, not cell centers),
    so torch-trained RPN weights transplant bit-for-bit."""
    out = []
    for (h, w), stride, size in zip(level_shapes, strides, sizes):
        ws, hs = [], []
        for ar in aspect_ratios:
            ws.append(size / jnp.sqrt(ar))
            hs.append(size * jnp.sqrt(ar))
        ws, hs = jnp.asarray(ws), jnp.asarray(hs)
        base = jnp.stack([-ws, -hs, ws, hs], -1) / 2  # (A, 4)
        base = jnp.round(base)
        sx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * stride
        sy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * stride
        shifts = jnp.stack([sx, sy, sx, sy], -1)[:, :, None]  # (h, w, 1, 4)
        out.append((shifts + base).reshape(-1, 4))
    return out


def decode_deltas(anchors: Array, deltas: Array, clip: float = 4.135,
                  weights: Tuple[float, ...] = BBOX_REG_WEIGHTS) -> Array:
    """(dx, dy, dw, dh)·weights⁻¹ applied to anchors → xyxy."""
    wx, wy, ww, wh = weights
    a = xyxy2xywh(anchors)
    dx, dy, dw, dh = jnp.split(deltas, 4, axis=-1)
    cx = a[..., 0:1] + dx / wx * a[..., 2:3]
    cy = a[..., 1:2] + dy / wy * a[..., 3:4]
    w = a[..., 2:3] * jnp.exp(jnp.clip(dw / ww, -clip, clip))
    h = a[..., 3:4] * jnp.exp(jnp.clip(dh / wh, -clip, clip))
    return xywh2xyxy(jnp.concatenate([cx, cy, w, h], -1))


def encode_deltas(anchors: Array, gt: Array,
                  weights: Tuple[float, ...] = BBOX_REG_WEIGHTS) -> Array:
    wx, wy, ww, wh = weights
    a = xyxy2xywh(anchors)
    g = xyxy2xywh(gt)
    eps = 1e-6
    dx = wx * (g[..., 0] - a[..., 0]) / jnp.maximum(a[..., 2], eps)
    dy = wy * (g[..., 1] - a[..., 1]) / jnp.maximum(a[..., 3], eps)
    dw = ww * jnp.log(jnp.maximum(g[..., 2], eps) / jnp.maximum(a[..., 2], eps))
    dh = wh * jnp.log(jnp.maximum(g[..., 3], eps) / jnp.maximum(a[..., 3], eps))
    return jnp.stack([dx, dy, dw, dh], -1)


def smooth_l1(x: Array, beta: float = 1.0 / 9) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax**2 / beta, ax - 0.5 * beta)


def assign_targets(
    anchors: Array, gt_boxes: Array, gt_valid: Array,
    fg_iou: float, bg_iou: float,
    anchor_valid: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """(labels, matched_gt_idx): labels 1 fg / 0 bg / −1 ignore.
    Low-quality matches (best anchor per GT) are promoted like torchvision.
    ``anchor_valid`` excludes padded proposal slots from both assignment and
    promotion (otherwise the per-GT argmax can land on an invalid row and the
    GT contributes no box/mask/keypoint signal that step)."""
    iou = box_iou(anchors, gt_boxes)  # (N, T)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    if anchor_valid is not None:
        iou = jnp.where(anchor_valid[:, None], iou, -1.0)
    best_iou = iou.max(-1)
    best_gt = jnp.clip(iou.argmax(-1), 0)
    labels = jnp.where(best_iou >= fg_iou, 1, jnp.where(best_iou < bg_iou, 0, -1))
    # promote the argmax anchor of every valid GT to foreground
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (T,)
    promote = jnp.zeros(anchors.shape[0], bool).at[best_anchor_per_gt].set(gt_valid)
    labels = jnp.where(promote, 1, labels)
    if anchor_valid is not None:
        labels = jnp.where(anchor_valid, labels, -1)
    return labels, best_gt


def sampler_weights(
    pos: Array, neg: Array, budget: float, pos_fraction: float
) -> Tuple[Array, Array, Array]:
    """Expectation-equivalent of torchvision's BalancedPositiveNegativeSampler
    (the reference trains with budget 256/f=0.5 for the RPN and 512/f=0.25
    for the RoI head, utils_det.py:22-46): instead of randomly drawing
    ``min(n_pos, budget·f)`` positives and filling the budget with random
    negatives, every positive/negative row gets the PROBABILITY it would be
    drawn as its loss weight — deterministic, static-shape, and the loss
    equals the sampler's in expectation.

    Returns ``(weights, pos_draw_prob, n_sampled)``; sampled-mean losses are
    ``Σ(term·weights)/n_sampled`` (torchvision divides by the sampled count).
    """
    n_pos = pos.sum()
    n_neg = neg.sum()
    n_pos_s = jnp.minimum(n_pos, budget * pos_fraction)
    n_neg_s = jnp.minimum(n_neg, budget - n_pos_s)
    p_pos = n_pos_s / jnp.maximum(n_pos, 1.0)
    w = pos * p_pos + neg * (n_neg_s / jnp.maximum(n_neg, 1.0))
    return w, p_pos, jnp.maximum(n_pos_s + n_neg_s, 1.0)


def balanced_bce(logits: Array, labels: Array, budget: float = 256.0,
                 pos_fraction: float = 0.5) -> Array:
    """Objectness BCE under the expectation sampler — torchvision
    ``rpn.compute_loss``'s ``binary_cross_entropy_with_logits`` mean over the
    256 sampled anchors, with the random draw replaced by its expectation."""
    pos = (labels == 1).astype(jnp.float32)
    neg = (labels == 0).astype(jnp.float32)
    w, _, n_sampled = sampler_weights(pos, neg, budget, pos_fraction)
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    bce = -(pos * log_p + neg * log_np)
    return jnp.sum(bce * w) / n_sampled


class RPNHead(nn.Module):
    num_anchors: int
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]):
        conv = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="reg")
        logits, deltas = [], []
        for f in feats:
            t = jax.nn.relu(conv(f))
            B = f.shape[0]
            logits.append(cls(t).reshape(B, -1))
            deltas.append(reg(t).reshape(B, -1, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


class BoxHead(nn.Module):
    num_classes: int  # incl. background at index 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: Array):  # (R, 7, 7, C)
        R = rois.shape[0]
        x = rois.reshape(R, -1)
        x = jax.nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc6")(x))
        x = jax.nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc7")(x))
        cls = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return cls, reg.reshape(R, self.num_classes, 4)


class MaskHead(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: Array):  # (R, 14, 14, C) → (R, 28, 28, num_classes)
        x = rois
        for i in range(4):
            x = jax.nn.relu(
                nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name=f"fcn{i}")(x)
            )
        x = jax.nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv")(x)
        )
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="logits")(x)


class KeypointHead(nn.Module):
    """KeypointRCNN heads+predictor (ref mask_rcnn.py:255-296 keypoint branch
    / torchvision KeypointRCNNHeads 8×512 + deconv predictor): (R, 14, 14, C)
    → (R, 56, 56, num_keypoints) heatmap logits."""

    num_keypoints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois: Array) -> Array:
        x = rois
        for i in range(8):
            x = jax.nn.relu(
                nn.Conv(512, (3, 3), padding="SAME", dtype=self.dtype, name=f"kp{i}")(x)
            )
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype, name="deconv")(x)
        # torchvision interpolates the 28² deconv output ×2 → 56² heatmaps
        R, H, W, K = x.shape
        return jax.image.resize(x.astype(jnp.float32), (R, 2 * H, 2 * W, K), "bilinear")


class MaskRCNN(nn.Module):
    """Per-task Mask R-CNN header over FPN features.

    Static capacities: pre_nms_topk anchors → num_proposals RPN outputs →
    num_detections final detections.
    """

    num_classes: int                       # foreground classes (no bg)
    strides: Tuple[float, ...] = (4.0, 8.0, 16.0, 32.0)
    anchor_sizes: Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    pre_nms_topk: int = 1024
    num_proposals: int = 256
    num_detections: int = 100
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    rpn_nms_thresh: float = 0.7
    # the reference RPN's BoxCoder uses unit weights (torchvision rpn), the
    # RoI head uses BBOX_REG_WEIGHTS — keeping both makes torch-trained
    # checkpoints transplant exactly
    rpn_box_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    with_masks: bool = True
    num_keypoints: int = 0          # >0 enables the KeypointRCNN branch
    dtype: Any = jnp.float32

    def setup(self):
        A = len(self.aspect_ratios)
        self.rpn_head = RPNHead(A, dtype=self.dtype)
        self.box_head = BoxHead(self.num_classes + 1, dtype=self.dtype)
        if self.with_masks:
            self.mask_head = MaskHead(self.num_classes + 1, dtype=self.dtype)
        if self.num_keypoints > 0:
            self.keypoint_head = KeypointHead(self.num_keypoints, dtype=self.dtype)

    # ------------------------------------------------------------------- RPN
    def _propose(self, feats, image_size):
        level_shapes = [f.shape[1:3] for f in feats]
        anchors = jnp.concatenate(
            generate_anchors(level_shapes, self.strides, self.anchor_sizes,
                             self.aspect_ratios)
        )  # (N, 4)
        logits, deltas = self.rpn_head(feats)  # (B, N), (B, N, 4)

        def per_image(lg, dl):
            scores, sel = jax.lax.top_k(lg, min(self.pre_nms_topk, lg.shape[0]))
            boxes = decode_deltas(anchors[sel], dl[sel],
                                  weights=self.rpn_box_weights)
            boxes = clip_boxes(boxes, image_size)
            ok = (boxes[:, 2] - boxes[:, 0] > 1e-3) & (boxes[:, 3] - boxes[:, 1] > 1e-3)
            idx, keep = nms_padded(boxes, scores, ok, self.rpn_nms_thresh,
                                   self.num_proposals)
            return jnp.take(boxes, idx, axis=0), keep

        proposals, pvalid = jax.vmap(per_image)(
            logits.astype(jnp.float32), deltas.astype(jnp.float32)
        )
        return anchors, logits, deltas, proposals, pvalid

    def _pool(self, feats, boxes, output_size):
        """FPN level assignment (torchvision: lvl = 4+log2(√area/224), here
        relative to available levels) + multiscale ROI align, per image."""
        area = jnp.sqrt(
            jnp.maximum((boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1]), 1e-6)
        )
        # torchvision LevelMapper: floor(4 + log2(s/224) + eps), eps OUTSIDE
        # the log (golden-matched); stride-4 level rebased to 0
        lvl = jnp.floor(4.0 + jnp.log2(area / 224.0) + 1e-6) - 2
        lvl = jnp.clip(lvl, 0, len(self.strides) - 1).astype(jnp.int32)
        pooled = multiscale_roi_align_batched(
            list(feats), boxes, lvl, self.strides, output_size
        )
        return pooled, lvl

    # --------------------------------------------------------------- forward
    def __call__(
        self,
        feats: Sequence[Array],
        image_size: Tuple[int, int],
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
    ):
        losses: Dict[str, Array] = {}
        outputs: Dict[str, Array] = {}
        if targets is not None:
            losses = self.compute_losses(feats, image_size, targets)
        if not train:
            outputs = self.infer(feats, image_size)
        return losses, outputs

    def compute_losses(
        self,
        feats: Sequence[Array],
        image_size: Tuple[int, int],
        targets: Dict[str, Array],
        image_weight: Optional[Array] = None,
    ) -> Dict[str, Array]:
        """RPN + RoI-head losses; ``image_weight`` (B,) down-weights padded
        virtual images (invalid annotation-ROI slots) to zero."""
        anchors, rpn_logits, rpn_deltas, proposals, pvalid = self._propose(
            feats, image_size
        )
        gt_boxes = targets["boxes"] * jnp.asarray(
            [image_size[1], image_size[0], image_size[1], image_size[0]], jnp.float32
        )
        gt_valid = targets["valid"]
        if self.num_keypoints > 0 and "keypoints" in targets:
            # keypoints follow the boxes' normalized-xy convention
            targets = {**targets, "keypoints": targets["keypoints"]
                       * jnp.asarray([image_size[1], image_size[0], 1.0], jnp.float32)}
        losses = self._rpn_loss(
            anchors, rpn_logits, rpn_deltas, gt_boxes, gt_valid, image_weight
        )
        # train RoI heads on proposals ∪ GT boxes (torchvision adds GT)
        roi_boxes = jnp.concatenate([proposals, gt_boxes], axis=1)
        roi_valid = jnp.concatenate([pvalid, gt_valid], axis=1)
        losses.update(
            self._roi_loss(feats, roi_boxes, roi_valid, gt_boxes, gt_valid, targets,
                           image_weight)
        )
        return losses

    def infer(self, feats: Sequence[Array], image_size: Tuple[int, int]):
        """Detection outputs (always available — also during training, for
        cross-header losses; the reference's pass 1, mask_rcnn.py:419-435)."""
        _, _, _, proposals, pvalid = self._propose(feats, image_size)
        return self._inference(feats, proposals, pvalid, image_size)

    @staticmethod
    def _wmean(per_image: Array, weight: Optional[Array]) -> Array:
        if weight is None:
            return per_image.mean()
        w = weight.astype(per_image.dtype)
        return jnp.sum(per_image * w) / jnp.maximum(jnp.sum(w), 1.0)

    def _rpn_loss(self, anchors, logits, deltas, gt_boxes, gt_valid, image_weight=None):
        def per_image(lg, dl, gb, gv):
            labels, match = assign_targets(anchors, gb, gv, 0.7, 0.3)
            obj = balanced_bce(lg.astype(jnp.float32), labels)
            tgt = encode_deltas(anchors, gb[match], weights=self.rpn_box_weights)
            pos = (labels == 1).astype(jnp.float32)
            # torchvision rpn.compute_loss: smooth_l1 SUM over sampled
            # positives / total sampled count (not per-positive mean)
            _, p_pos, n_sampled = sampler_weights(
                pos, (labels == 0).astype(jnp.float32), 256.0, 0.5)
            reg = jnp.sum(smooth_l1(dl - tgt).sum(-1) * pos) * p_pos / n_sampled
            return obj, reg

        obj, reg = jax.vmap(per_image)(logits, deltas.astype(jnp.float32), gt_boxes, gt_valid)
        return {
            "rpn_obj_loss": self._wmean(obj, image_weight),
            "rpn_reg_loss": self._wmean(reg, image_weight),
        }

    def _roi_loss(self, feats, roi_boxes, roi_valid, gt_boxes, gt_valid, targets,
                  image_weight=None):
        pooled, _ = self._pool(feats, roi_boxes, 7)
        B, R = roi_boxes.shape[:2]
        cls_logits, box_deltas = self.box_head(
            pooled.reshape(B * R, *pooled.shape[2:])
        )
        cls_logits = cls_logits.reshape(B, R, -1).astype(jnp.float32)
        box_deltas = box_deltas.reshape(B, R, self.num_classes + 1, 4).astype(jnp.float32)

        def per_image(rb, rv, gb, gv, glabels, cl, bd):
            labels_m, match = assign_targets(rb, gb, gv, 0.5, 0.5, anchor_valid=rv)
            fg = (labels_m == 1) & rv
            bg = (labels_m == 0) & rv
            cls_target = jnp.where(fg, glabels[match], 0)  # bg class = 0
            logp = jax.nn.log_softmax(cl, -1)
            ce = -jnp.take_along_axis(logp, cls_target[:, None], 1)[:, 0]
            # torchvision fastrcnn_loss under the expectation sampler
            # (budget 512, f=0.25, utils_det.py:45-46): CE mean over the
            # sample; box smooth_l1 SUM over sampled fg / sampled count
            w, p_fg, n_sampled = sampler_weights(
                fg.astype(jnp.float32), bg.astype(jnp.float32), 512.0, 0.25)
            cls_loss = jnp.sum(ce * w) / n_sampled
            tgt = encode_deltas(rb, gb[match])
            d = jnp.take_along_axis(bd, cls_target[:, None, None].repeat(4, -1), 1)[:, 0]
            reg_loss = jnp.sum(smooth_l1(d - tgt).sum(-1) * fg) * p_fg / n_sampled
            return cls_loss, reg_loss, fg, match

        glabels = jnp.clip(targets["labels"], 0, self.num_classes)
        cls_l, reg_l, fg, match = jax.vmap(per_image)(
            roi_boxes, roi_valid, gt_boxes, gt_valid, glabels, cls_logits, box_deltas
        )
        losses = {
            "roi_cls_loss": self._wmean(cls_l, image_weight),
            "roi_reg_loss": self._wmean(reg_l, image_weight),
        }

        if self.with_masks and "masks" in targets:
            # mask loss on up to num_detections fg ROIs per image
            K = min(self.num_detections, roi_boxes.shape[1])
            score = jnp.where(fg, 1.0, -jnp.inf)
            _, sel = jax.lax.top_k(score, K)
            take = lambda x: jnp.take_along_axis(x, sel, axis=1)
            mb = jnp.take_along_axis(roi_boxes, sel[..., None], axis=1)
            mv = jnp.take_along_axis(fg, sel, axis=1)
            if image_weight is not None:
                mv = mv & (image_weight > 0)[:, None]
            mmatch = take(match)
            pooled_m, _ = self._pool(feats, mb, 14)
            B = mb.shape[0]
            mlogits = self.mask_head(pooled_m.reshape(B * K, *pooled_m.shape[2:]))
            mlogits = mlogits.reshape(B, K, 28, 28, -1).astype(jnp.float32)
            mcls = jnp.take_along_axis(jnp.clip(glabels, 0, self.num_classes), mmatch, 1)
            sel_log = jnp.take_along_axis(
                mlogits, mcls[..., None, None, None], axis=-1
            )[..., 0]
            gt_m = jnp.take_along_axis(
                targets["masks"], mmatch[..., None, None], axis=1
            ).astype(jnp.float32)
            bce = jnp.maximum(sel_log, 0) - sel_log * gt_m + jnp.log1p(jnp.exp(-jnp.abs(sel_log)))
            per = bce.mean((-1, -2))
            losses["mask_loss"] = jnp.sum(per * mv) / jnp.maximum(jnp.sum(mv), 1.0)

        if self.num_keypoints > 0 and "keypoints" in targets:
            # heatmap CE over fg ROIs (ref mask_rcnn.py:270-283
            # keypointrcnn_loss): GT keypoint discretized into the ROI's 56²
            # grid, cross-entropy on the spatial softmax, visible-only
            K = min(self.num_detections, roi_boxes.shape[1])
            score = jnp.where(fg, 1.0, -jnp.inf)
            _, sel = jax.lax.top_k(score, K)
            kb = jnp.take_along_axis(roi_boxes, sel[..., None], axis=1)   # (B,K,4)
            kv = jnp.take_along_axis(fg, sel, axis=1)
            if image_weight is not None:
                kv = kv & (image_weight > 0)[:, None]
            kmatch = jnp.take_along_axis(match, sel, axis=1)
            gt_kp = jnp.take_along_axis(
                targets["keypoints"].astype(jnp.float32),
                kmatch[..., None, None], axis=1,
            )  # (B, K, nk, 3)
            pooled_k, _ = self._pool(feats, kb, 14)
            B = kb.shape[0]
            hm = self.keypoint_head(pooled_k.reshape(B * K, *pooled_k.shape[2:]))
            S = hm.shape[1]                                 # 56
            nk = self.num_keypoints
            hm = hm.reshape(B, K, S, S, nk)
            w = jnp.maximum(kb[..., 2] - kb[..., 0], 1e-6)[..., None]
            h = jnp.maximum(kb[..., 3] - kb[..., 1], 1e-6)[..., None]
            u = jnp.floor((gt_kp[..., 0] - kb[..., 0][..., None]) / w * S)
            v = jnp.floor((gt_kp[..., 1] - kb[..., 1][..., None]) / h * S)
            inside = (u >= 0) & (u < S) & (v >= 0) & (v < S)
            visible = (gt_kp[..., 2] > 0) & inside & kv[..., None]
            flat_idx = (jnp.clip(v, 0, S - 1) * S + jnp.clip(u, 0, S - 1)).astype(jnp.int32)
            logits = hm.transpose(0, 1, 4, 2, 3).reshape(B, K, nk, S * S)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, flat_idx[..., None], axis=-1)[..., 0]
            losses["keypoint_loss"] = jnp.sum(ce * visible) / jnp.maximum(
                jnp.sum(visible), 1.0
            )
        return losses

    def _inference(self, feats, proposals, pvalid, image_size):
        pooled, _ = self._pool(feats, proposals, 7)
        B, R = proposals.shape[:2]
        cls_logits, box_deltas = self.box_head(pooled.reshape(B * R, *pooled.shape[2:]))
        probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1).reshape(B, R, -1)
        box_deltas = box_deltas.reshape(B, R, self.num_classes + 1, 4).astype(jnp.float32)

        def per_image(pb, pv, pr, bd):
            # best foreground class per proposal (class-aware NMS after)
            fg_probs = pr[:, 1:]
            label = jnp.argmax(fg_probs, -1)
            score = jnp.take_along_axis(fg_probs, label[:, None], 1)[:, 0]
            d = jnp.take_along_axis(bd, (label + 1)[:, None, None].repeat(4, -1), 1)[:, 0]
            boxes = clip_boxes(decode_deltas(pb, d), image_size)
            ok = pv & (score > self.score_thresh)
            idx, keep = batched_nms_padded(
                boxes, score, label, ok, self.nms_thresh, self.num_detections
            )
            take = lambda x: jnp.take(x, idx, axis=0)
            return {
                "boxes": take(boxes) * keep[:, None],
                "scores": take(score) * keep,
                "labels": jnp.where(keep, take(label) + 1, -100),
                "valid": keep,
            }

        out = jax.vmap(per_image)(proposals, pvalid, probs, box_deltas)
        if self.with_masks:
            pooled_m, _ = self._pool(feats, out["boxes"], 14)
            K = out["boxes"].shape[1]
            ml = self.mask_head(pooled_m.reshape(B * K, *pooled_m.shape[2:]))
            ml = jax.nn.sigmoid(ml.astype(jnp.float32)).reshape(B, K, 28, 28, -1)
            ch = jnp.clip(out["labels"], 0, self.num_classes)
            out["masks"] = jnp.take_along_axis(ml, ch[..., None, None, None], -1)[..., 0]
            out["masks"] = out["masks"] * out["valid"][..., None, None]
        if self.num_keypoints > 0:
            # heatmap argmax → box-frame xy + prob (keypointrcnn_inference)
            K = out["boxes"].shape[1]
            pooled_k, _ = self._pool(feats, out["boxes"], 14)
            hm = self.keypoint_head(pooled_k.reshape(B * K, *pooled_k.shape[2:]))
            S = hm.shape[1]
            nk = self.num_keypoints
            logits = hm.reshape(B, K, S, S, nk).transpose(0, 1, 4, 2, 3)
            flat = logits.reshape(B, K, nk, S * S)
            prob = jax.nn.softmax(flat, axis=-1)
            idx = jnp.argmax(flat, axis=-1)
            u = (idx % S).astype(jnp.float32) + 0.5
            v = (idx // S).astype(jnp.float32) + 0.5
            bx = out["boxes"]
            w = jnp.maximum(bx[..., 2] - bx[..., 0], 1e-6)[..., None]
            h = jnp.maximum(bx[..., 3] - bx[..., 1], 1e-6)[..., None]
            kx = bx[..., 0][..., None] + u / S * w
            ky = bx[..., 1][..., None] + v / S * h
            ks = jnp.max(prob, axis=-1)
            out["keypoints"] = jnp.stack([kx, ky, ks], -1)  # (B, D, nk, 3)
            out["keypoints"] = out["keypoints"] * out["valid"][..., None, None]
        return out
