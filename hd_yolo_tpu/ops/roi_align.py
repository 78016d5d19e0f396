"""Bilinear ROI-align — TPU-native replacement for ``torchvision.ops.roi_align``.

Used by the reference at ``/root/reference/metayolo/models/yolo_head.py:243,294``
(mask-branch feature pooling), ``/root/reference/hnet/utils.py:142,224`` (WSI
tile/ROI extraction) and ``/root/reference/data.py:303`` (GT mask cropping).

Semantics match torchvision's ``aligned=False`` legacy mode exactly (the
reference runs with ``ROI_ALIGN = False`` → ``aligned=False``,
``yolo_head.py:15,102``):
  * ``roi_{start} = coord * spatial_scale`` (no −0.5 offset),
  * ``roi_w/h = max(roi_w/h, 1.0)``,
  * bilinear samples outside ``(-1, size)`` contribute zero, in-range
    coordinates clamp to the border,
  * a fixed ``sampling_ratio × sampling_ratio`` sample grid per output bin,
    average-pooled.

Design: instead of scalar gather loops (GPU style), sampling is *separable* —
rows are gathered+lerped first, then columns — so each ROI is two gathers and
two fused multiply-adds over (S, W, C) slabs.  ROIs are processed in chunks
via ``lax.map`` to bound peak memory; everything is static-shaped, so invalid
(padding) ROIs simply produce garbage that callers mask out.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _sample_weights(coord: Array, size: int) -> Tuple[Array, Array, Array, Array]:
    """1-D bilinear sample: returns (low_idx, high_idx, low_w, high_w) with
    torchvision's out-of-range zeroing and border clamping."""
    in_range = (coord > -1.0) & (coord < size)
    c = jnp.clip(coord, 0.0, size - 1)
    low = jnp.floor(c).astype(jnp.int32)
    high = jnp.minimum(low + 1, size - 1)
    lw = c - low.astype(coord.dtype)
    w_low = jnp.where(in_range, 1.0 - lw, 0.0)
    w_high = jnp.where(in_range, lw, 0.0)
    return low, high, w_low, w_high


def _roi_align_one(
    features: Array,  # (H, W, C)
    box: Array,  # (4,) xyxy
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int,
    aligned: bool,
) -> Array:
    H, W, C = features.shape
    M, n = output_size, sampling_ratio
    offset = 0.5 if aligned else 0.0
    x1 = box[0] * spatial_scale - offset
    y1 = box[1] * spatial_scale - offset
    x2 = box[2] * spatial_scale - offset
    y2 = box[3] * spatial_scale - offset
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w, bin_h = roi_w / M, roi_h / M

    s = jnp.arange(M * n, dtype=features.dtype)
    # sample centers: start + (bin * n + iy + 0.5) * bin/n  — flattened over (bin, sub).
    ys = y1 + (s + 0.5) * (bin_h / n)
    xs = x1 + (s + 0.5) * (bin_w / n)

    yl, yh, wyl, wyh = _sample_weights(ys, H)
    xl, xh, wxl, wxh = _sample_weights(xs, W)

    # Separable: rows first → (S, W, C), then columns → (S, S, C).
    rows = features[yl] * wyl[:, None, None] + features[yh] * wyh[:, None, None]
    vals = rows[:, xl] * wxl[None, :, None] + rows[:, xh] * wxh[None, :, None]

    # Average-pool the n x n sample grid per bin → (M, M, C).
    vals = vals.reshape(M, n, M, n, C)
    return jnp.mean(vals, axis=(1, 3))


@functools.partial(
    jax.jit, static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned", "chunk")
)
def roi_align(
    features: Array,
    boxes: Array,
    output_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    chunk: int = 64,
) -> Array:
    """ROI-align ``(K, 4)`` boxes against one image's ``(H, W, C)`` feature map.

    Returns ``(K, M, M, C)``.  ``vmap`` over a leading batch dim for batched use.
    ``chunk`` bounds peak memory: ROIs are mapped in groups of this size.
    """
    K = boxes.shape[0]
    one = functools.partial(
        _roi_align_one,
        features,
        output_size=output_size,
        spatial_scale=spatial_scale,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
    )
    if K <= chunk:
        return jax.vmap(one)(boxes)
    pad = (-K) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    grouped = boxes_p.reshape(-1, chunk, 4)
    out = lax.map(jax.vmap(one), grouped)
    return out.reshape(-1, output_size, output_size, features.shape[-1])[:K]


def multiscale_roi_align(
    features: Sequence[Array],
    boxes: Array,
    levels: Array,
    strides: Sequence[float],
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = False,
    chunk: int = 64,
) -> Array:
    """Multi-level ROI-align with per-ROI level selection.

    Mirrors ``Detect.multiscale_roi_align`` (``yolo_head.py:279-299``): each box
    is pooled from the pyramid level it was detected on.  Static-shape strategy:
    pool every ROI at every level and one-hot-select — the pyramid sums to only
    ~1.33x the finest level's cost, so this stays cheap while avoiding
    data-dependent partitions.

    Args:
      features: list of (H_l, W_l, C) maps, finest first.
      boxes: (K, 4) xyxy in input-image coordinates.
      levels: (K,) int level index per ROI.
      strides: per-level feature strides (spatial_scale = 1/stride).
    Returns (K, M, M, C).
    """
    out = None
    for i, (fmap, stride) in enumerate(zip(features, strides)):
        pooled = roi_align(
            fmap,
            boxes,
            output_size,
            spatial_scale=1.0 / float(stride),
            sampling_ratio=sampling_ratio,
            aligned=aligned,
            chunk=chunk,
        )
        sel = (levels == i).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out
