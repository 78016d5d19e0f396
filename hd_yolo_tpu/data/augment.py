"""Host-side augmentations operating on (image, per-task annotation) pairs.

Behavioral reference:
  * HSV LUT jitter / ColorJitter / ColorDodge stain jitter
    (``/root/reference/metayolo/engines/image_utils.py:493-701``),
  * ``random_projective`` affine/perspective warp of image + polygon masks
    with box recomputation and candidate filtering (``datasets.py:308-343``,
    ``image_utils.py:223-277``, ``augmentations.py:124-217``),
  * flips/transpose (``datasets.py:417-427``),
  * ``box_candidates`` filter (``augmentations.py:279``).

Annotations are dicts: {'boxes': (N,4) xyxy px float, 'labels': (N,) int,
'masks': [Mask|None]*N}.  The batch-uniform color ops also exist on device
(data/preproc.py); these run in loader workers where per-sample geometry is
cheaper on host.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from .mask import Mask

Ann = Dict[str, object]


def random_hsv(img: np.ndarray, hgain=0.015, sgain=0.7, vgain=0.4, p=1.0) -> np.ndarray:
    """uint8 HSV LUT jitter (image_utils.py:598-613)."""
    if random.random() >= p:
        return img
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(img.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)


def color_dodge(img: np.ndarray, global_mean=0.01, channel_mean=0.01,
                channel_sigma=0.2, p=1.0) -> np.ndarray:
    """Pathology stain jitter: per-channel affine perturbation in float space
    (ColorDodge, image_utils.py:493-537 — re-derived, not copied: a global
    brightness shift + per-channel gain/offset noise)."""
    if random.random() >= p:
        return img
    x = img.astype(np.float32) / 255.0
    g = np.random.normal(0, global_mean)
    mu = np.random.normal(0, channel_mean, 3)
    sigma = np.random.normal(1.0, channel_sigma, 3).clip(0.5, 1.5)
    x = (x * sigma + mu + g).clip(0, 1)
    return (x * 255).astype(np.uint8)


def projective_matrix(size: Tuple[int, int], degrees=10.0, translate=0.1, scale=0.5,
                      shear=2.0, perspective=0.0) -> np.ndarray:
    """Random 3×3 projective matrix centered on the image
    (augmentations.py:124-165 parameterization)."""
    h, w = size
    C = np.eye(3)
    C[0, 2], C[1, 2] = -w / 2, -h / 2
    P = np.eye(3)
    P[2, 0] = random.uniform(-perspective, perspective)
    P[2, 1] = random.uniform(-perspective, perspective)
    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * h
    return T @ S @ R @ P @ C


def box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr=2, ar_thr=20,
                   area_thr=0.1, eps=1e-16) -> np.ndarray:
    """Keep boxes that survived the warp (augmentations.py:279-285)."""
    w1, h1 = box1[:, 2] - box1[:, 0], box1[:, 3] - box1[:, 1]
    w2, h2 = box2[:, 2] - box2[:, 0], box2[:, 3] - box2[:, 1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (
        (w2 > wh_thr) & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)
    )


def warp_boxes(boxes: np.ndarray, M: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Warp xyxy boxes through M via their 4 corners, clip to size."""
    n = len(boxes)
    if n == 0:
        return boxes
    corners = np.ones((n * 4, 3))
    corners[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(n * 4, 2)
    pts = corners @ M.T
    pts = (pts[:, :2] / np.maximum(pts[:, 2:3], 1e-9)).reshape(n, 8)
    x = pts[:, [0, 2, 4, 6]]
    y = pts[:, [1, 3, 5, 7]]
    out = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], 1)
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, size[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, size[0])
    return out.astype(np.float32)


def random_projective(img: np.ndarray, ann: Ann, hyp: Dict) -> Tuple[np.ndarray, Ann]:
    """Warp image + masks, recompute boxes from warped masks where available
    (datasets.py:308-343 semantics: polygon-accurate boxes post-warp)."""
    size = img.shape[:2]
    M = projective_matrix(
        size,
        degrees=hyp.get("degrees", 0.0),
        translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5),
        shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
    )
    warped = cv2.warpPerspective(img, M, (size[1], size[0]),
                                 borderValue=(114, 114, 114))
    boxes = np.asarray(ann["boxes"], np.float32).reshape(-1, 4)
    masks: List[Optional[Mask]] = list(ann.get("masks", [None] * len(boxes)))
    new_boxes = warp_boxes(boxes, M, size)
    new_masks = []
    for i, m in enumerate(masks):
        if m is None:
            new_masks.append(None)
            continue
        wm = m.warp(M, size)
        new_masks.append(wm)
        b = wm.box()
        if b[2] > b[0] and b[3] > b[1]:  # polygon-accurate box
            new_boxes[i] = np.clip(b, [0, 0, 0, 0], [size[1], size[0], size[1], size[0]])
    keep = box_candidates(boxes, new_boxes)
    out = {
        "boxes": new_boxes[keep],
        "labels": np.asarray(ann["labels"])[keep],
        "masks": [m for m, k in zip(new_masks, keep) if k],
    }
    return warped, out


def random_flips(img: np.ndarray, ann: Ann, p_ud=0.5, p_lr=0.5) -> Tuple[np.ndarray, Ann]:
    h, w = img.shape[:2]
    boxes = np.asarray(ann["boxes"], np.float32).reshape(-1, 4).copy()
    masks = list(ann.get("masks", [None] * len(boxes)))
    if random.random() < p_lr:
        img = np.ascontiguousarray(img[:, ::-1])
        boxes = np.stack([w - boxes[:, 2], boxes[:, 1], w - boxes[:, 0], boxes[:, 3]], 1) if len(boxes) else boxes
        masks = [m.flip(horizontal=True) if m is not None else None for m in masks]
    if random.random() < p_ud:
        img = np.ascontiguousarray(img[::-1])
        boxes = np.stack([boxes[:, 0], h - boxes[:, 3], boxes[:, 2], h - boxes[:, 1]], 1) if len(boxes) else boxes
        masks = [m.flip(vertical=True) if m is not None else None for m in masks]
    return img, {"boxes": boxes, "labels": np.asarray(ann["labels"]), "masks": masks}


def train_proc(img: np.ndarray, ann: Ann, hyp: Dict) -> Tuple[np.ndarray, Ann]:
    """Per-tile train augmentation chain (datasets.py:522-539): color →
    projective → flips."""
    color_aug = hyp.get("color_aug", "hsv")
    if color_aug == "hsv":
        img = random_hsv(img, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4))
    elif color_aug == "dodge":
        img = color_dodge(img)
    img, ann = random_projective(img, ann, hyp)
    img, ann = random_flips(img, ann, hyp.get("flipud", 0.5), hyp.get("fliplr", 0.5))
    return img, ann
