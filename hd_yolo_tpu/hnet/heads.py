"""hnet task headers: panoptic segmentation + hierarchical confliction loss.

Behavioral reference:
  * ``PanopticSeg`` (``/root/reference/hnet/segmentation/panoptic_seg.py:3-43``):
    panoptic connector → 1×1 conv → softmax, soft-dice (soft IoU) loss;
  * ``ConstrainModule`` (``/root/reference/hnet/hnet.py:18-101``) — the
    "hierarchical conflict-resolution loss" of the README: a bipartite
    (seg class, det class) edge set; each detected object's box is projected
    into the segmentation frame, the seg probability map is ROI-pooled on the
    box, and P(consistent) = Σ_edges p_area(seg_i)·p_class(det_j) is pushed
    to 1 with BCE.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.roi_align import roi_align
from .fpn import PanopticFeatureConnector

Array = jnp.ndarray


def soft_iou_loss(probs: Array, onehot: Array, eps: float = 1e-6) -> Array:
    """1 − soft-IoU, averaged over classes present (panoptic_seg.py:12-22)."""
    inter = jnp.sum(probs * onehot, axis=(1, 2))
    union = jnp.sum(probs + onehot, axis=(1, 2)) - inter
    present = jnp.sum(onehot, axis=(1, 2)) > 0
    iou = (inter + eps) / (union + eps)
    num = jnp.sum(jnp.where(present, 1.0 - iou, 0.0))
    return num / jnp.maximum(jnp.sum(present), 1)


class PanopticSegHead(nn.Module):
    """Panoptic-FPN semantic segmentation header.

    ``scale_factor`` mirrors the reference's pre-softmax bilinear upsample
    (panoptic_seg.py:14-21: Upsample(scale_factor) → 1×1 conv → softmax):
    the class map is predicted FINER than the fused feature grid, which is
    what makes few-cell structures (nuclei at 10× power are 1-2 stride-16
    cells) segmentable at all.  The loss also follows the reference in
    resizing the prediction to the target's resolution before scoring
    (panoptic_seg.py:37-40 interpolate-to-mask-size), so GT can be supplied
    at any stride.
    """

    num_classes: int
    channels: int = 128
    scale_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[Array],
        targets: Optional[Array] = None,   # (B, H, W) int labels, any stride
        train: bool = False,
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        x = PanopticFeatureConnector(self.channels, dtype=self.dtype, name="connector")(
            feats, train
        )
        if self.scale_factor and self.scale_factor != 1:
            B, H, W, C = x.shape
            x = jax.image.resize(
                x, (B, H * self.scale_factor, W * self.scale_factor, C),
                "bilinear")
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="logits")(x)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        losses: Dict[str, Array] = {}
        if targets is not None:
            th, tw = targets.shape[1:3]
            p = probs
            if p.shape[1:3] != (th, tw):
                p = jax.image.resize(p, (p.shape[0], th, tw, p.shape[-1]),
                                     "bilinear")
            onehot = jax.nn.one_hot(targets, self.num_classes)
            losses["seg_loss"] = soft_iou_loss(p, onehot)
        return losses, {"probs": probs, "logits": logits}


class ClassificationHead(nn.Module):
    """Whole-ROI classification header (the reference's 'cl' tasks,
    hnet_new.py:157-166): global-pool the coarsest pyramid level → MLP."""

    num_classes: int
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[Array],
        targets: Optional[Array] = None,   # (B,) int labels
        train: bool = False,
    ) -> Tuple[Dict[str, Array], Dict[str, Array]]:
        x = jnp.mean(feats[-1], axis=(1, 2))  # (B, C) global average pool
        x = jax.nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        logits = logits.astype(jnp.float32)
        losses: Dict[str, Array] = {}
        if targets is not None:
            logp = jax.nn.log_softmax(logits, -1)
            ce = -jnp.take_along_axis(logp, jnp.clip(targets, 0)[:, None], 1)[:, 0]
            valid = targets >= 0
            losses["cl_loss"] = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
        return losses, {"logits": logits, "probs": jax.nn.softmax(logits, -1)}


class ConstrainModule(nn.Module):
    """Cross-header consistency loss between a seg map and a det header.

    ``edges``: ((seg_class, det_class), ...) pairs considered consistent.
    """

    edges: Tuple[Tuple[int, int], ...]
    pool_size: int = 7

    def __call__(
        self,
        seg_probs: Array,       # (B, Hs, Ws, n_seg) softmax output
        det_boxes: Array,       # (B, D, 4) xyxy in the *image* frame
        det_scores: Array,      # (B, D, n_det) per-class scores (incl. col 0 bg/obj)
        det_valid: Array,       # (B, D) bool
        seg_stride: float = 1.0,  # image px per seg cell
    ) -> Array:
        """Mean BCE(P_consistent, 1) over valid detections (hnet.py:45-101)."""
        B, D = det_valid.shape

        def per_image(probs, boxes, scores, valid):
            pooled = roi_align(
                probs, boxes, self.pool_size, spatial_scale=1.0 / seg_stride, chunk=128
            )  # (D, P, P, n_seg)
            p_area = jnp.mean(pooled, axis=(1, 2))  # (D, n_seg)
            p = jnp.zeros((D,), jnp.float32)
            for seg_c, det_c in self.edges:
                p = p + p_area[:, seg_c] * scores[:, det_c]
            p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
            bce = -jnp.log(p)
            return jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1)

        per = jax.vmap(per_image)(seg_probs, det_boxes, det_scores, det_valid)
        return jnp.mean(per)


class DynamicConstrainModule(nn.Module):
    """Mask-weighted cross-header consistency — the active ConstrainModule of
    the dynamic strategy (``/root/reference/hnet/hnet_dynamic_strategy.py:26-110``).

    Instead of box-mean pooling, each detection's predicted instance mask
    weights the seg probabilities inside its box:

        P(det d consistent) = Σ_edges v_e ·
            (Σ_px seg_{i_e}(px)·mask_d(px)) / Σ_px mask_d(px) · p_class(j_e, d)

    pushed to 1 with BCE over valid detections.  ``values`` are per-edge
    weights (the reference's sparse bipartite-graph ``values``; default 1).
    """

    edges: Tuple[Tuple[int, int], ...]
    values: Tuple[float, ...] = ()

    def __call__(
        self,
        seg_probs: Array,       # (B, Hs, Ws, n_seg) softmax output
        det_boxes: Array,       # (B, D, 4) xyxy in the *image* frame
        det_scores: Array,      # (B, D, n_det) per-class scores
        det_masks: Array,       # (B, D, m, m) in-box instance mask probs
        det_valid: Array,       # (B, D) bool
        seg_stride: float = 1.0,
    ) -> Array:
        vals = self.values or (1.0,) * len(self.edges)
        m = det_masks.shape[-1]

        def per_image(probs, boxes, scores, masks, valid):
            pooled = roi_align(
                probs, boxes, m, spatial_scale=1.0 / seg_stride, chunk=128
            )  # (D, m, m, n_seg) — seg probs sampled on each box at mask res
            masks = masks.astype(jnp.float32)
            msum = jnp.maximum(jnp.sum(masks, axis=(-1, -2)), 1e-6)  # (D,)
            p = jnp.zeros(valid.shape, jnp.float32)
            for (seg_c, det_c), v in zip(self.edges, vals):
                area = jnp.sum(pooled[..., seg_c] * masks, axis=(-1, -2)) / msum
                p = p + float(v) * area * scores[:, det_c]
            p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
            bce = -jnp.log(p)
            return jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1)

        per = jax.vmap(per_image)(seg_probs, det_boxes, det_scores, det_masks, det_valid)
        return jnp.mean(per)
