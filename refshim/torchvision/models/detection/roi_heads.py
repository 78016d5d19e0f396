"""``paste_masks_in_image`` with torchvision's public semantics: pad the
MxM mask by ``padding``, scale the box by (M+2p)/M, bilinear-resize the mask
to the integer box extent (+1 px, ``TO_REMOVE`` convention), and paste the
intersection into the image canvas.  Reference call sites:
val_nuclei.py:169-175, evaluation.py:122, datasets.py:797."""

from typing import List, Tuple

import torch
import torch.nn.functional as F
from torch import Tensor


def _expand_boxes(boxes: Tensor, scale: float) -> Tensor:
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x_c = (boxes[:, 2] + boxes[:, 0]) * 0.5
    y_c = (boxes[:, 3] + boxes[:, 1]) * 0.5
    out = torch.zeros_like(boxes)
    out[:, 0] = x_c - w_half
    out[:, 2] = x_c + w_half
    out[:, 1] = y_c - h_half
    out[:, 3] = y_c + h_half
    return out


def _expand_masks(mask: Tensor, padding: int) -> Tuple[Tensor, float]:
    M = mask.shape[-1]
    scale = float(M + 2 * padding) / M
    padded_mask = F.pad(mask, (padding, padding, padding, padding))
    return padded_mask, scale


def _paste_mask_in_image(mask: Tensor, box: Tensor, im_h: int, im_w: int) -> Tensor:
    TO_REMOVE = 1
    w = int(box[2] - box[0] + TO_REMOVE)
    h = int(box[3] - box[1] + TO_REMOVE)
    w = max(w, 1)
    h = max(h, 1)
    mask = mask.expand((1, 1, -1, -1))
    mask = F.interpolate(mask, size=(h, w), mode="bilinear", align_corners=False)
    mask = mask[0][0]
    im_mask = torch.zeros((im_h, im_w), dtype=mask.dtype, device=mask.device)
    x_0 = max(int(box[0]), 0)
    x_1 = min(int(box[2]) + 1, im_w)
    y_0 = max(int(box[1]), 0)
    y_1 = min(int(box[3]) + 1, im_h)
    im_mask[y_0:y_1, x_0:x_1] = mask[
        (y_0 - int(box[1])):(y_1 - int(box[1])),
        (x_0 - int(box[0])):(x_1 - int(box[0])),
    ]
    return im_mask


def paste_masks_in_image(masks: Tensor, boxes: Tensor, img_shape: Tuple[int, int],
                         padding: int = 1) -> Tensor:
    masks, scale = _expand_masks(masks, padding=padding)
    boxes = _expand_boxes(boxes, scale).to(dtype=torch.int64)
    im_h, im_w = int(img_shape[0]), int(img_shape[1])
    res: List[Tensor] = [
        _paste_mask_in_image(m[0], b, im_h, im_w) for m, b in zip(masks, boxes)
    ]
    if len(res) > 0:
        return torch.stack(res, dim=0)[:, None]
    return masks.new_empty((0, 1, im_h, im_w))
