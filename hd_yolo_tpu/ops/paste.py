"""Paste per-ROI masks into full-image frames.

Replacement for torchvision's ``paste_masks_in_image`` (used by the reference
at ``/root/reference/val_nuclei.py:169-176``, ``evaluation.py:122``,
``datasets.py:797``).  Implemented as a dense inverse warp: for every output
pixel, sample the ROI mask bilinearly at the corresponding normalized ROI
coordinate — one fused vectorized op per mask, no scatter, static shapes.

torchvision semantics reproduced: masks are conceptually padded by 1 zero
pixel on each side and the box is mapped to the unpadded extent with
``align_corners=False``-style sampling (TO_REMOVE = 1 convention is *not*
used by the modern implementation; we match the current torchvision
``_do_paste_mask`` math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _paste_one(mask: Array, box: Array, im_h: int, im_w: int) -> Array:
    """mask: (M, M) probs; box: (4,) xyxy. Returns (im_h, im_w)."""
    M = mask.shape[-1]
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    w = jnp.maximum(x2 - x1, 1e-6)
    h = jnp.maximum(y2 - y1, 1e-6)

    ys = (jnp.arange(im_h, dtype=mask.dtype) + 0.5 - y1) / h * M - 0.5
    xs = (jnp.arange(im_w, dtype=mask.dtype) + 0.5 - x1) / w * M - 0.5

    def lerp_1d(coord, size):
        in_range = (coord > -1.0) & (coord < size)
        c = jnp.clip(coord, 0.0, size - 1)
        low = jnp.floor(c).astype(jnp.int32)
        high = jnp.minimum(low + 1, size - 1)
        lw = c - low.astype(coord.dtype)
        return low, high, jnp.where(in_range, 1 - lw, 0.0), jnp.where(in_range, lw, 0.0)

    yl, yh, wyl, wyh = lerp_1d(ys, M)
    xl, xh, wxl, wxh = lerp_1d(xs, M)
    rows = mask[yl] * wyl[:, None] + mask[yh] * wyh[:, None]
    return rows[:, xl] * wxl[None, :] + rows[:, xh] * wxh[None, :]


@functools.partial(jax.jit, static_argnames=("im_h", "im_w", "chunk"))
def paste_masks_in_image(
    masks: Array, boxes: Array, im_h: int, im_w: int, chunk: int = 32
) -> Array:
    """(K, M, M) mask probs + (K, 4) xyxy boxes → (K, im_h, im_w) pasted probs.

    Memory note: output is K*H*W — chunked over K. Threshold at 0.5 downstream
    for binary masks.
    """
    K = masks.shape[0]
    one = functools.partial(_paste_one, im_h=im_h, im_w=im_w)
    if K <= chunk:
        return jax.vmap(one)(masks, boxes)
    pad = (-K) % chunk
    masks_p = jnp.pad(masks, ((0, pad), (0, 0), (0, 0))).reshape(-1, chunk, *masks.shape[1:])
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0))).reshape(-1, chunk, 4)
    out = lax.map(lambda mb: jax.vmap(one)(mb[0], mb[1]), (masks_p, boxes_p))
    return out.reshape(-1, im_h, im_w)[:K]
