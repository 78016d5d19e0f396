"""Box ops with torchvision's public semantics, in pure TorchScript-able torch.

Covers exactly the surface the reference uses (SURVEY.md §2.3):
``nms`` (utils_general.py:342,507, yolo.py:195), ``batched_nms``,
``box_iou`` (metrics.py:416, utils_nucls.py:499), ``remove_small_boxes``
(utils_general.py:332), ``clip_boxes_to_image`` (utils_o.py:60).
"""

from typing import Tuple

import torch
from torch import Tensor


def box_area(boxes: Tensor) -> Tensor:
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def box_iou(boxes1: Tensor, boxes2: Tensor) -> Tensor:
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    return inter / (area1[:, None] + area2[None, :] - inter)


def nms(boxes: Tensor, scores: Tensor, iou_threshold: float) -> Tensor:
    """Greedy NMS: returns kept indices sorted by descending score."""
    order = torch.argsort(scores, descending=True)
    boxes = boxes[order]
    n = boxes.shape[0]
    areas = box_area(boxes)
    suppressed = torch.zeros(n, dtype=torch.bool, device=boxes.device)
    keep = torch.zeros(n, dtype=torch.bool, device=boxes.device)
    for i in range(n):
        if bool(suppressed[i]):
            continue
        keep[i] = True
        rest = boxes[i + 1:]
        lt = torch.max(boxes[i, :2], rest[:, :2])
        rb = torch.min(boxes[i, 2:], rest[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / (areas[i] + areas[i + 1:] - inter)
        suppressed[i + 1:] |= iou > iou_threshold
    return order[keep]


def batched_nms(boxes: Tensor, scores: Tensor, idxs: Tensor,
                iou_threshold: float) -> Tensor:
    """Category-aware NMS via the coordinate-offset trick."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64, device=boxes.device)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1.0).to(boxes))
    boxes_for_nms = boxes + offsets[:, None]
    return nms(boxes_for_nms, scores, iou_threshold)


def remove_small_boxes(boxes: Tensor, min_size: float) -> Tensor:
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    keep = (ws >= min_size) & (hs >= min_size)
    return torch.where(keep)[0]


def clip_boxes_to_image(boxes: Tensor, size: Tuple[int, int]) -> Tensor:
    h, w = size[0], size[1]
    x = boxes[..., 0::2].clamp(min=0, max=float(w))
    y = boxes[..., 1::2].clamp(min=0, max=float(h))
    out = torch.stack((x[..., 0], y[..., 0], x[..., 1], y[..., 1]), dim=-1)
    return out.reshape(boxes.shape)
