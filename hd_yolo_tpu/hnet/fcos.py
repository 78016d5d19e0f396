"""FCOS: fully-convolutional one-stage anchor-free detection header.

Behavioral reference: ``/root/reference/hnet/detection/fcos.py:1-224``
(FCOSHead cls/bbox towers with GroupNorm, per-level learnable Scale,
focal-prior bias init, ``norm_reg_targets``/``centerness_on_reg`` semantics,
and FCOSModule's per-level location grids).  The reference's loss and
postprocessor live in the external ``fcos_core`` package (unavailable even to
the reference); they are re-derived here from the FCOS algorithm the header
implements: per-location ltrb regression gated by per-level size-of-interest
ranges, min-area ambiguity resolution, sigmoid focal classification loss,
IoU regression loss weighted by centerness targets, and BCE centerness.

TPU-first formulation:
  * location grids are trace-time iota — no persistent buffers;
  * target assignment is one dense (locations × targets) mask computation per
    level batch — no per-image Python loops, no boolean filtering;
  * inference reuses the padded top-k + batched-NMS kernel stack (static
    shapes end to end).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes
from ..ops.nms import batched_nms_padded

Array = jnp.ndarray

# per-level object size-of-interest ranges (FCOS paper §3.2); level l keeps
# targets whose max ltrb extent falls in [lo_l, hi_l)
_INF = 1e8


def _size_ranges(num_levels: int, base: float = 64.0) -> Tuple[Tuple[float, float], ...]:
    edges = [0.0] + [base * (2.0 ** i) for i in range(num_levels - 1)] + [_INF]
    return tuple((edges[i], edges[i + 1]) for i in range(num_levels))


class Scale(nn.Module):
    """Per-level learnable scalar multiplier (fcos.py:95 ``Scale(1.0)``)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = self.param("scale", lambda k: jnp.asarray(self.init_value, jnp.float32))
        return x * s.astype(x.dtype)


class FCOSTower(nn.Module):
    """num_convs × [3×3 conv + GroupNorm(32) + relu] (fcos.py:30-62)."""

    channels: int
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_convs):
            x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.01), name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn{i}")(x)
            x = jax.nn.relu(x)
        return x


class FCOS(nn.Module):
    """FCOS header over an FPN pyramid.

    Same engine interface as :class:`MaskRCNN` (``infer`` /
    ``compute_losses``) so it drops into HNet's double-pass machinery and the
    'fcos' header type.
    """

    num_classes: int                      # foreground classes (labels 1..nc)
    strides: Sequence[float] = (8.0, 16.0, 32.0, 64.0)
    num_convs: int = 4
    prior_prob: float = 0.01              # focal bias init (fcos.py:88-90)
    norm_reg_targets: bool = True
    centerness_on_reg: bool = True
    center_sample_radius: float = 1.5     # 0 = whole-box sampling
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    pre_nms_topk: int = 512               # per image, across levels
    num_detections: int = 100
    size_base: float = 64.0
    dtype: Any = jnp.float32

    def setup(self):
        self.cls_tower = FCOSTower(256, self.num_convs, dtype=self.dtype, name="cls_tower")
        self.bbox_tower = FCOSTower(256, self.num_convs, dtype=self.dtype, name="bbox_tower")
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        self.cls_logits = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias), name="cls_logits",
        )
        self.bbox_pred = nn.Conv(
            4, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="bbox_pred",
        )
        self.ctr_pred = nn.Conv(
            1, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="centerness",
        )
        self.scales = [Scale(1.0, name=f"scale{i}") for i in range(len(self.strides))]

    # ------------------------------------------------------------------ head
    def _head(self, feats: Sequence[Array]):
        """Per level: (B, H, W, nc) logits, (B, H, W, 4) ltrb px, (B, H, W) ctr."""
        logits, regs, ctrs = [], [], []
        for i, f in enumerate(feats):
            ct = self.cls_tower(f)
            bt = self.bbox_tower(f)
            logits.append(self.cls_logits(ct).astype(jnp.float32))
            ctr_src = bt if self.centerness_on_reg else ct
            ctrs.append(self.ctr_pred(ctr_src).astype(jnp.float32)[..., 0])
            r = self.scales[i](self.bbox_pred(bt)).astype(jnp.float32)
            if self.norm_reg_targets:
                r = jax.nn.relu(r) * self.strides[i]
            else:
                r = jnp.exp(r)
            regs.append(r)
        return logits, regs, ctrs

    def _locations(self, shapes: Sequence[Tuple[int, int]]) -> List[Array]:
        """Per level (H·W, 2) pixel centers (fcos.py:190-208)."""
        out = []
        for (h, w), s in zip(shapes, self.strides):
            ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * s + s / 2
            xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * s + s / 2
            out.append(jnp.stack([xs, ys], -1).reshape(h * w, 2))
        return out

    # ---------------------------------------------------------------- engine
    def __call__(
        self,
        feats: Sequence[Array],
        image_size: Tuple[int, int],
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
        image_weight: Optional[Array] = None,
    ):
        losses = (
            self.compute_losses(feats, image_size, targets, image_weight)
            if targets is not None else {}
        )
        outputs = {} if train else self.infer(feats, image_size)
        return losses, outputs

    def compute_losses(
        self,
        feats: Sequence[Array],
        image_size: Tuple[int, int],
        targets: Dict[str, Array],          # boxes (B,T,4) normalized xyxy,
        image_weight: Optional[Array] = None,  # labels (B,T) 1..nc, valid (B,T)
    ) -> Dict[str, Array]:
        H, W = image_size
        logits, regs, ctrs = self._head(feats)
        locs = self._locations([f.shape[1:3] for f in feats])
        ranges = _size_ranges(len(feats), self.size_base)

        gt = targets["boxes"] * jnp.asarray([W, H, W, H], jnp.float32)  # (B,T,4) px
        glabels = jnp.clip(targets["labels"], 0, self.num_classes)      # (B,T)
        gvalid = targets["valid"] & (glabels > 0)

        cls_l, reg_l, ctr_l = [], [], []
        for lvl in range(len(feats)):
            l_cls, l_reg, l_ctr = self._level_loss(
                locs[lvl], logits[lvl], regs[lvl], ctrs[lvl],
                gt, gvalid, glabels, ranges[lvl], self.strides[lvl],
            )
            cls_l.append(l_cls)
            reg_l.append(l_reg)
            ctr_l.append(l_ctr)

        def wmean(per_img_terms):
            v = sum(per_img_terms)
            if image_weight is not None:
                w = image_weight.astype(v.dtype)
                return jnp.sum(v * w) / jnp.maximum(jnp.sum(w), 1.0)
            return jnp.mean(v)

        # normalize by total positives across levels (fcos_core convention)
        return {
            "fcos_cls_loss": wmean(cls_l),
            "fcos_reg_loss": wmean(reg_l),
            "fcos_ctr_loss": wmean(ctr_l),
        }

    def _level_loss(self, loc, logits, reg, ctr, gt, gvalid, glabels, rng, stride):
        """Dense per-location assignment + losses for one level.

        loc (L, 2); logits (B, H, W, nc); reg (B, H, W, 4); ctr (B, H, W);
        gt (B, T, 4) px; returns per-image (B,) loss terms.
        """
        B = logits.shape[0]
        L = loc.shape[0]
        nc = self.num_classes
        logits = logits.reshape(B, L, nc)
        reg = reg.reshape(B, L, 4)
        ctr = ctr.reshape(B, L)

        # ltrb offsets of every location to every target: (B, L, T, 4)
        xs, ys = loc[:, 0], loc[:, 1]
        l_ = xs[None, :, None] - gt[:, None, :, 0]
        t_ = ys[None, :, None] - gt[:, None, :, 1]
        r_ = gt[:, None, :, 2] - xs[None, :, None]
        b_ = gt[:, None, :, 3] - ys[None, :, None]
        ltrb = jnp.stack([l_, t_, r_, b_], -1)
        in_box = jnp.min(ltrb, -1) > 0.0                       # (B, L, T)
        if self.center_sample_radius > 0:  # center sampling (FCOS-plus)
            cx = (gt[..., 0] + gt[..., 2]) * 0.5
            cy = (gt[..., 1] + gt[..., 3]) * 0.5
            rr = self.center_sample_radius * stride
            near = (
                (jnp.abs(xs[None, :, None] - cx[:, None, :]) < rr)
                & (jnp.abs(ys[None, :, None] - cy[:, None, :]) < rr)
            )
            in_box = in_box & near
        maxd = jnp.max(ltrb, -1)
        fits = (maxd >= rng[0]) & (maxd < rng[1])              # size-of-interest
        cand = in_box & fits & gvalid[:, None, :]

        area = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])  # (B, T)
        cand_area = jnp.where(cand, area[:, None, :], _INF)
        best_t = jnp.argmin(cand_area, -1)                     # (B, L) min-area wins
        is_fg = jnp.any(cand, -1)                              # (B, L)

        tgt_ltrb = jnp.take_along_axis(ltrb, best_t[..., None, None].repeat(4, -1), 2)[:, :, 0]
        tgt_label = jnp.take_along_axis(glabels, best_t, 1)    # (B, L) 1..nc

        # focal classification loss over all locations
        onehot = jax.nn.one_hot(jnp.where(is_fg, tgt_label - 1, nc), nc)  # bg → all-zero
        p = jax.nn.sigmoid(logits)
        alpha, gamma = 0.25, 2.0
        pt = p * onehot + (1 - p) * (1 - onehot)
        af = alpha * onehot + (1 - alpha) * (1 - onehot)
        bce = -jnp.log(jnp.clip(pt, 1e-8))
        focal = af * (1 - pt) ** gamma * bce                   # (B, L, nc)
        n_pos = jnp.maximum(jnp.sum(is_fg, -1), 1.0)           # (B,)
        cls_loss = jnp.sum(focal, (-1, -2)) / n_pos

        # centerness target (FCOS eq. 3) + IoU regression weighted by it
        lr = tgt_ltrb[..., jnp.asarray([0, 2])]
        tb = tgt_ltrb[..., jnp.asarray([1, 3])]
        safe = lambda x: jnp.maximum(x, 1e-6)
        ctr_tgt = jnp.sqrt(
            (jnp.min(lr, -1) / safe(jnp.max(lr, -1)))
            * (jnp.min(tb, -1) / safe(jnp.max(tb, -1)))
        )
        ctr_tgt = jnp.clip(jnp.where(is_fg, ctr_tgt, 0.0), 0.0, 1.0)

        inter_w = jnp.minimum(reg[..., 0], tgt_ltrb[..., 0]) + jnp.minimum(reg[..., 2], tgt_ltrb[..., 2])
        inter_h = jnp.minimum(reg[..., 1], tgt_ltrb[..., 1]) + jnp.minimum(reg[..., 3], tgt_ltrb[..., 3])
        inter = jnp.clip(inter_w, 0) * jnp.clip(inter_h, 0)
        a_pred = (reg[..., 0] + reg[..., 2]) * (reg[..., 1] + reg[..., 3])
        a_tgt = (tgt_ltrb[..., 0] + tgt_ltrb[..., 2]) * (tgt_ltrb[..., 1] + tgt_ltrb[..., 3])
        iou = (inter + 1.0) / (safe(a_pred) + safe(a_tgt) - inter + 1.0)
        w = ctr_tgt * is_fg
        reg_loss = jnp.sum(-jnp.log(jnp.clip(iou, 1e-8)) * w, -1) / jnp.maximum(jnp.sum(w, -1), 1e-6)

        ctr_bce = (
            jnp.maximum(ctr, 0) - ctr * ctr_tgt + jnp.log1p(jnp.exp(-jnp.abs(ctr)))
        )
        ctr_loss = jnp.sum(ctr_bce * is_fg, -1) / n_pos
        return cls_loss, reg_loss, ctr_loss

    def infer(self, feats: Sequence[Array], image_size: Tuple[int, int]):
        logits, regs, ctrs = self._head(feats)
        locs = self._locations([f.shape[1:3] for f in feats])
        B = feats[0].shape[0]
        nc = self.num_classes

        rows_s, rows_b, rows_l = [], [], []
        for lvl in range(len(feats)):
            L = locs[lvl].shape[0]
            p = jax.nn.sigmoid(logits[lvl].reshape(B, L, nc))
            c = jax.nn.sigmoid(ctrs[lvl].reshape(B, L))
            score = jnp.sqrt(jnp.max(p, -1) * c)               # ctr-weighted (fcos_core)
            label = jnp.argmax(p, -1)
            r = regs[lvl].reshape(B, L, 4)
            xy = locs[lvl][None]
            boxes = jnp.stack(
                [xy[..., 0] - r[..., 0], xy[..., 1] - r[..., 1],
                 xy[..., 0] + r[..., 2], xy[..., 1] + r[..., 3]], -1,
            )
            rows_s.append(score)
            rows_b.append(boxes)
            rows_l.append(label)
        score = jnp.concatenate(rows_s, 1)
        boxes = clip_boxes(jnp.concatenate(rows_b, 1), image_size)
        label = jnp.concatenate(rows_l, 1)

        K = min(self.pre_nms_topk, score.shape[1])
        top_s, sel = jax.lax.top_k(score, K)
        take = lambda x: jnp.take_along_axis(x, sel.reshape(B, K, *([1] * (x.ndim - 2))), 1)
        boxes_k = take(boxes)
        label_k = jnp.take_along_axis(label, sel, 1)

        def per_image(bx, sc, lb):
            ok = sc > self.score_thresh
            idx, keep = batched_nms_padded(
                bx, sc, lb, ok, self.nms_thresh, self.num_detections
            )
            g = lambda x: jnp.take(x, idx, axis=0)
            return {
                "boxes": g(bx) * keep[:, None],
                "scores": g(sc) * keep,
                "labels": jnp.where(keep, g(lb) + 1, -100),
                "valid": keep,
            }

        return jax.vmap(per_image)(boxes_k, top_s, label_k)
