"""Box geometry + IoU family — pure jnp, fully jit/vmap-compatible.

Behavioral reference: ``/root/reference/metayolo/models/utils_general.py:109-297``
(xywh2xyxy and friends, bbox_iou GIoU/DIoU/CIoU, box_iou, mask_iou, paired_box_iou).
All functions are functional (no in-place mutation) and shape-polymorphic over
leading batch dims where noted; coordinates are float, ``xyxy`` = (x1, y1, x2, y2),
``xywh`` = (cx, cy, w, h).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax


Array = jnp.ndarray


def xywh2xyxy(x: Array) -> Array:
    """(..., 4) center-format → corner-format."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: Array) -> Array:
    """(..., 4) corner-format → center-format."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x: Array, w: float = 640.0, h: float = 640.0, padw: float = 0.0, padh: float = 0.0) -> Array:
    """Normalized center-format → pixel corner-format."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x: Array, w: float = 640.0, h: float = 640.0, clip: bool = False, eps: float = 0.0) -> Array:
    """Pixel corner-format → normalized center-format."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h], axis=-1
    )


def clip_boxes(boxes: Array, shape: Tuple[float, float]) -> Array:
    """Clip xyxy boxes to image (height, width)."""
    h, w = shape
    x1 = jnp.clip(boxes[..., 0:1], 0.0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0.0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0.0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0.0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def scale_coords(
    img1_shape: Union[int, Tuple[int, int]],
    coords: Array,
    img0_shape: Union[int, Tuple[int, int]],
    ratio_pad=None,
) -> Array:
    """Rescale xyxy coords from ``img1_shape`` (model input) back to ``img0_shape`` (original).

    Mirrors ``utils_general.py:161-178`` (letterbox-aware: undo center pad, then gain).
    """
    if isinstance(img1_shape, int):
        img1_shape = (img1_shape, img1_shape)
    if isinstance(img0_shape, int):
        img0_shape = (img0_shape, img0_shape)
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2, (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    x1, y1, x2, y2 = jnp.split(coords[..., :4], 4, axis=-1)
    out = jnp.concatenate(
        [(x1 - pad[0]) / gain, (y1 - pad[1]) / gain, (x2 - pad[0]) / gain, (y2 - pad[1]) / gain],
        axis=-1,
    )
    return clip_boxes(out, img0_shape)


def box_area(box: Array) -> Array:
    """(..., 4) xyxy → area."""
    return (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])


def box_iou(box1: Array, box2: Array) -> Array:
    """Pairwise IoU matrix: (N, 4) × (M, 4) xyxy → (N, M)."""
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:4], box2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(box1)[..., :, None] + box_area(box2)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def paired_box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Row-wise IoU: (N, 4) × (N, 4) xyxy → (N,). Mirrors utils_general.py:283-296."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-12)


def wh_iou(wh1: Array, wh2: Array) -> Array:
    """(N, 2) × (M, 2) → (N, M) IoU of width-height pairs anchored at origin."""
    inter = jnp.prod(jnp.minimum(wh1[:, None], wh2[None]), axis=2)
    return inter / (jnp.prod(wh1, axis=1)[:, None] + jnp.prod(wh2, axis=1)[None] - inter)


def bbox_iou(
    box1: Array,
    box2: Array,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> Array:
    """Elementwise (broadcasting) IoU / GIoU / DIoU / CIoU of box1 vs box2, last dim = 4.

    Exact semantics of ``utils_general.py:193-231`` (incl. the CIoU alpha term with
    stopped gradient).  Returns shape = broadcast of inputs minus last dim, keepdims=1
    like the reference's chunk-based version: (..., 1).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, axis=-1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, axis=-1)
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0.0) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0.0
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def mask_iou(y_pred: Array, y_true: Array, factor: Union[str, float] = 0.0,
             axis: Sequence[int] = (-2, -1), eps: float = 0.0) -> Array:
    """Soft dice (factor=0) / IoU (factor=-1) over mask axes. Mirrors utils_general.py:268-280."""
    if factor == "dice":
        factor = 0.0
    elif factor == "iou":
        factor = -1.0
    prod = jnp.sum(y_true * y_pred, axis=tuple(axis))
    plus = jnp.sum(y_true + y_pred, axis=tuple(axis))
    return (2 + factor) * prod / (plus + factor * prod + eps)


def remove_small_boxes_mask(boxes: Array, min_size: float) -> Array:
    """Validity mask for boxes with both sides >= min_size (torchvision.ops.remove_small_boxes)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w >= min_size) & (h >= min_size)


def make_divisible(x: float, divisor: int) -> int:
    """Round channel count up to the nearest multiple (utils_general.py:41-44)."""
    return int(math.ceil(x / divisor) * divisor)
