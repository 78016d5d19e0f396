"""Fixed-shape, on-device Non-Maximum Suppression.

TPU-native replacement for ``torchvision.ops.nms`` / ``batched_nms`` (used by the
reference at ``/root/reference/metayolo/models/utils_general.py:299-356``
``nms_per_image`` and ``/root/reference/metayolo/models/yolo.py:195``).

Algorithm (exact greedy NMS, reformulated for a systolic/vector machine):
  1. sort boxes by score (stable, desc) — ties keep lower original index,
     matching torchvision's stable sort;
  2. precompute the strict-upper-triangle conflict matrix
     ``M[i, j] = IoU(i, j) > thr  (i < j)``;
  3. process boxes in tiles of ``TILE`` columns, sequentially over tiles:
       a. *cross-tile* suppression of the tile by all already-decided kept
          boxes — one (1, K) x (K, TILE) masked matmul (rides the MXU);
       b. *within-tile* exact fixpoint self-suppression: iterate
          ``active[j] = valid[j] and not any(i<j: M[i,j] and active[i])``
          until convergence.  After k iterations every box whose suppression
          chain depth is <= k has its final value, so this converges in
          max-chain-depth iterations (<= TILE, typically 2-4) — far fewer
          sequential steps than the classic per-box loop.
  4. compact the first ``max_det`` survivors into fixed-size outputs with a
     cumsum scatter.

Everything is static-shaped; invalid slots are masked, never filtered.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import box_iou

Array = jnp.ndarray


def _self_suppression_fixpoint(conflict: Array, valid: Array) -> Array:
    """Exact greedy NMS inside one tile.

    conflict: (B, B) strict-upper-triangle bool (conflict[i, j], i < j).
    valid:    (B,) bool — candidate mask after cross-tile suppression.
    Returns the (B,) bool keep mask of the sequential greedy algorithm.
    """
    conflict_f = conflict.astype(jnp.float32)

    def cond(state):
        active, prev_active, it = state
        return jnp.logical_and(jnp.any(active != prev_active), it < conflict.shape[0])

    def body(state):
        active, _, it = state
        # suppressed[j] = any_i (conflict[i, j] & active[i])
        suppressed = (active.astype(jnp.float32) @ conflict_f) > 0.0
        new_active = valid & ~suppressed
        return new_active, active, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    # Seed prev_active as ~valid so the loop runs at least once when any box is valid.
    active, _, _ = lax.while_loop(cond, body, init)
    return active


@functools.partial(jax.jit, static_argnames=("max_det", "tile", "presorted"))
def nms_padded(
    boxes: Array,
    scores: Array,
    valid: Array,
    iou_threshold: float,
    max_det: int,
    tile: int = 128,
    presorted: bool = False,
) -> Tuple[Array, Array]:
    """Greedy NMS over a padded box set.

    Args:
      boxes:  (K, 4) xyxy.
      scores: (K,) — NMS ranking score.
      valid:  (K,) bool — padding mask.
      iou_threshold: suppression threshold (strictly-greater comparison, like torchvision).
      max_det: fixed output capacity.
      tile: column-tile size for the sequential sweep.

    Returns:
      (indices, keep): ``indices`` (max_det,) int32 into the *original* box order
      (clamped to 0 for invalid slots) and ``keep`` (max_det,) bool validity.
    """
    K = boxes.shape[0]
    if presorted:  # caller guarantees score-desc order (e.g. straight from top_k)
        order = lax.broadcasted_iota(jnp.int32, (K,), 0)
        sboxes, svalid = boxes, valid
    else:
        neg_inf = jnp.array(-jnp.inf, scores.dtype)
        masked_scores = jnp.where(valid, scores, neg_inf)
        order = jnp.argsort(-masked_scores, stable=True)  # desc, stable → torchvision tie-break
        sboxes = jnp.take(boxes, order, axis=0)
        svalid = jnp.take(valid, order, axis=0)

    iou = box_iou(sboxes, sboxes)
    row = lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = lax.broadcasted_iota(jnp.int32, (K, K), 1)
    conflict = (iou > iou_threshold) & (row < col) & svalid[:, None] & svalid[None, :]
    conflict_f = conflict.astype(jnp.float32)

    n_tiles = (K + tile - 1) // tile
    pad = n_tiles * tile - K
    if pad:
        conflict_f = jnp.pad(conflict_f, ((0, pad), (0, pad)))
        svalid_p = jnp.pad(svalid, (0, pad))
    else:
        svalid_p = svalid
    Kp = n_tiles * tile

    def tile_body(t, active):
        start = t * tile
        # (a) cross-tile: conflicts from already-decided earlier boxes.
        cols = lax.dynamic_slice(conflict_f, (0, start), (Kp, tile))
        tile_mask = lax.broadcasted_iota(jnp.int32, (Kp,), 0) < start
        prev_active = jnp.where(tile_mask, active, False)
        cross = (prev_active.astype(jnp.float32) @ cols) > 0.0
        cand = lax.dynamic_slice(svalid_p, (start,), (tile,)) & ~cross
        # (b) within-tile exact fixpoint.
        block = lax.dynamic_slice(conflict_f, (start, start), (tile, tile)) > 0.0
        keep_tile = _self_suppression_fixpoint(block, cand)
        return lax.dynamic_update_slice(active, keep_tile, (start,))

    active0 = jnp.zeros((Kp,), jnp.bool_)
    kept_sorted = lax.fori_loop(0, n_tiles, tile_body, active0)[:K]

    # Compact first max_det survivors (already in score order).
    pos = jnp.cumsum(kept_sorted.astype(jnp.int32)) - 1
    pos = jnp.where(kept_sorted & (pos < max_det), pos, max_det)
    out_idx = jnp.full((max_det + 1,), 0, jnp.int32).at[pos].set(order.astype(jnp.int32), mode="drop")
    n_kept = jnp.minimum(jnp.sum(kept_sorted.astype(jnp.int32)), max_det)
    keep = lax.broadcasted_iota(jnp.int32, (max_det,), 0) < n_kept
    return out_idx[:max_det], keep


def batched_nms_padded(
    boxes: Array,
    scores: Array,
    labels: Array,
    valid: Array,
    iou_threshold: float,
    max_det: int,
    tile: int = 128,
) -> Tuple[Array, Array]:
    """Class-aware NMS via the coordinate-offset trick (torchvision.ops.batched_nms)."""
    span = jnp.max(jnp.where(valid[..., None], boxes, 0.0)) + 1.0
    offsets = labels.astype(boxes.dtype)[..., None] * span
    return nms_dispatch(boxes + offsets, scores, valid, iou_threshold, max_det, tile=tile)


PALLAS_NMS_MIN_K = 2048


def nms_dispatch(boxes, scores, valid, iou_threshold, max_det, tile: int = 128,
                 presorted: bool = False):
    """``nms_padded``, with the Pallas sweep on TPU for LARGE box sets.

    The Pallas kernel keeps conflict tiles VMEM-resident instead of
    materializing the (K, K) matrix in HBM; measured on v5e it is ~14% faster
    at WSI stitching scale (K=4096) and break-even at the per-image K=1024 —
    while adding minutes of Mosaic compile time when instantiated hundreds of
    times inside a vmapped model graph.  So it dispatches only above
    ``PALLAS_NMS_MIN_K`` (the WSI global-stitch regime); the per-image
    inference path stays on the XLA formulation.  Both are exact greedy NMS
    with identical outputs (differential-tested).  ``presorted`` skips the
    argsort when the caller guarantees score-descending order (e.g. straight
    out of ``lax.top_k``)."""
    if jax.default_backend() == "tpu" and boxes.shape[0] >= PALLAS_NMS_MIN_K:
        from .pallas_nms import nms_padded_pallas

        return nms_padded_pallas(boxes, scores, valid, iou_threshold, max_det,
                                 presorted=presorted)
    return nms_padded(boxes, scores, valid, iou_threshold, max_det, tile=tile,
                      presorted=presorted)


def nms_per_image(
    preds: Array,
    nc: int,
    conf_thres: float = 0.15,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: Optional[int] = None,
    min_box_size: float = 2.0,
):
    """Objectness-driven per-image NMS over concatenated multi-level proposals.

    Mirrors ``utils_general.py:299-356``: rank and suppress by *objectness*
    (column 4), keep the full ``(1+nc)`` score vector and trailing ``extra``
    columns (level id).  Operates on one image; ``jax.vmap`` for a batch.

    Args:
      preds: (K, 5 + nc + E) rows = [cx, cy, w, h, obj, cls..., extra...].
    Returns dict of fixed-shape arrays:
      boxes (max_det, 4) xyxy, scores (max_det, 1+nc), extra (max_det, E),
      valid (max_det,) bool.
    """
    from .boxes import remove_small_boxes_mask, xywh2xyxy

    boxes = xywh2xyxy(preds[:, :4])
    scores = preds[:, 4 : 5 + nc]
    extra = preds[:, 5 + nc :]
    obj = scores[:, 0]

    ok = remove_small_boxes_mask(boxes, min_box_size) & (obj > conf_thres)

    if pre_nms_topk is not None and pre_nms_topk < boxes.shape[0]:
        sel_scores, sel = lax.top_k(jnp.where(ok, obj, -jnp.inf), pre_nms_topk)
        boxes = jnp.take(boxes, sel, axis=0)
        scores = jnp.take(scores, sel, axis=0)
        extra = jnp.take(extra, sel, axis=0)
        ok = jnp.take(ok, sel, axis=0)
        obj = sel_scores

    # after the masked top_k, rows are already score-descending with invalid
    # slots (-inf) at the tail — the argsort inside NMS is redundant
    idx, keep = nms_dispatch(boxes, obj, ok, iou_thres, max_det,
                             presorted=pre_nms_topk is not None
                             and pre_nms_topk < preds.shape[0])
    return {
        "boxes": jnp.take(boxes, idx, axis=0) * keep[:, None],
        "scores": jnp.take(scores, idx, axis=0) * keep[:, None],
        "extra": jnp.take(extra, idx, axis=0) * keep[:, None],
        "valid": keep,
    }
