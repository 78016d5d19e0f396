"""Fused Pallas NMS kernel: the tiled greedy-suppression sweep of
``ops/nms.py`` with every intermediate VMEM-resident.

The XLA formulation materializes the full (K, K) conflict matrix in HBM and
re-slices it per tile; this kernel never forms it — each 128-column tile
computes its (K, 128) cross-conflict strip and (128, 128) self-block in
registers/VMEM, reads the running keep mask for the cross-suppression matmul
(MXU, (1,K)x(K,128)), runs the exact within-tile fixpoint, and writes 128
decisions.  Semantics are bit-identical to ``nms_padded`` (exact greedy NMS,
strictly-greater IoU comparison like torchvision) — differential-tested in
interpret mode and on hardware.

Used per image on score-sorted boxes; ``jax.vmap`` adds the batch grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE = 128


def _nms_kernel(iou_thr_ref, boxes_ref, boxest_ref, valid_ref, validc_ref, keep_ref):
    """boxes (K, 4) score-sorted xyxy; boxest (4, K) its transpose;
    valid (1, K) f32 (+ its (K, 1) column copy, avoiding an in-kernel
    transpose); keep (1, K) f32 out — the greedy keep mask."""
    K = boxes_ref.shape[0]
    thr = iou_thr_ref[0]
    keep_ref[:] = jnp.zeros((1, K), jnp.float32)

    def conflict_strip(r0, nr, start):
        """(nr, TILE) conflict of rows [r0, r0+nr) vs cols [start, start+TILE):
        IoU > thr, strictly-upper-triangle (global row < col), both valid."""
        x1c = boxes_ref[pl.ds(r0, nr), 0:1]
        y1c = boxes_ref[pl.ds(r0, nr), 1:2]
        x2c = boxes_ref[pl.ds(r0, nr), 2:3]
        y2c = boxes_ref[pl.ds(r0, nr), 3:4]
        area_c = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)
        x1r = boxest_ref[0:1, pl.ds(start, TILE)]
        y1r = boxest_ref[1:2, pl.ds(start, TILE)]
        x2r = boxest_ref[2:3, pl.ds(start, TILE)]
        y2r = boxest_ref[3:4, pl.ds(start, TILE)]
        ar = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
        vr = valid_ref[0:1, pl.ds(start, TILE)]
        iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
        ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(area_c + ar - inter, 1e-12)
        rows = r0 + lax.broadcasted_iota(jnp.int32, (nr, TILE), 0)
        cols = start + lax.broadcasted_iota(jnp.int32, (nr, TILE), 1)
        vc = validc_ref[pl.ds(r0, nr), 0:1]
        return jnp.where(
            (iou > thr) & (rows < cols), 1.0, 0.0
        ) * vc * vr

    n_tiles = K // TILE

    def tile_body(t, _):
        start = pl.multiple_of(t * TILE, TILE)
        # cross-tile suppression: one (1, K) x (K, TILE) matmul on the MXU
        strip = conflict_strip(0, K, start)                       # (K, TILE)
        active = keep_ref[:]                                      # (1, K)
        cross = jnp.dot(active, strip, preferred_element_type=jnp.float32)
        vr = valid_ref[0:1, pl.ds(start, TILE)]
        cand = vr * jnp.where(cross > 0.0, 0.0, 1.0)              # (1, TILE)
        # exact within-tile greedy fixpoint (block recomputed from refs —
        # cheaper than dynamic-slicing the big strip value)
        block = conflict_strip(start, TILE, start)

        def cond(s):
            a, prev = s
            return jnp.any(a != prev)

        def body(s):
            a, _ = s
            sup = jnp.dot(a, block, preferred_element_type=jnp.float32)
            return cand * jnp.where(sup > 0.0, 0.0, 1.0), a

        a, _ = lax.while_loop(cond, body, (cand, 1.0 - cand))
        keep_ref[0:1, pl.ds(start, TILE)] = a
        return 0

    lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nms_keep_sorted(sboxes: Array, svalid: Array, iou_threshold, interpret: bool = False):
    """Keep mask for SCORE-SORTED boxes (K, 4) + valid (K,); K % 128 == 0."""
    K = sboxes.shape[0]
    assert K % TILE == 0, K
    bb = sboxes.astype(jnp.float32)
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        jnp.asarray([iou_threshold], jnp.float32),
        bb,
        bb.T,
        svalid.astype(jnp.float32).reshape(1, K),
        svalid.astype(jnp.float32).reshape(K, 1),
    )
    return keep[0] > 0.0


def nms_padded_pallas(
    boxes: Array,
    scores: Array,
    valid: Array,
    iou_threshold: float,
    max_det: int,
    interpret: bool = False,
    presorted: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in for ``ops.nms.nms_padded`` with the Pallas sweep.

    Same contract: (indices into original order, keep validity), stable
    score-descending greedy semantics.
    """
    K = boxes.shape[0]
    if presorted:
        order = lax.broadcasted_iota(jnp.int32, (K,), 0)
        sboxes, svalid = boxes, valid
    else:
        neg_inf = jnp.array(-jnp.inf, scores.dtype)
        masked_scores = jnp.where(valid, scores, neg_inf)
        order = jnp.argsort(-masked_scores, stable=True)
        sboxes = jnp.take(boxes, order, axis=0)
        svalid = jnp.take(valid, order, axis=0)

    pad = (-K) % TILE
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        svalid = jnp.pad(svalid, (0, pad))

    kept_sorted = _nms_keep_sorted(sboxes, svalid, iou_threshold,
                                   interpret=interpret)[:K]

    pos = jnp.cumsum(kept_sorted.astype(jnp.int32)) - 1
    pos = jnp.where(kept_sorted & (pos < max_det), pos, max_det)
    out_idx = jnp.full((max_det + 1,), 0, jnp.int32).at[pos].set(
        order.astype(jnp.int32), mode="drop"
    )
    n_kept = jnp.minimum(jnp.sum(kept_sorted.astype(jnp.int32)), max_det)
    keep = lax.broadcasted_iota(jnp.int32, (max_det,), 0) < n_kept
    return out_idx[:max_det], keep
