"""Functional transforms subset (only resize is referenced, commented-out in
evaluation.py:98 — provided for completeness)."""

from typing import List, Union

import torch
import torch.nn.functional as F
from torch import Tensor


def resize(img: Tensor, size: Union[int, List[int]], antialias: bool = True) -> Tensor:
    if isinstance(size, int):
        size = [size]
    h, w = img.shape[-2:]
    if len(size) == 1:
        s = size[0]
        if h < w:
            new_h, new_w = s, int(round(w * s / h))
        else:
            new_h, new_w = int(round(h * s / w)), s
    else:
        new_h, new_w = size
    batched = img if img.dim() == 4 else img[None]
    out = F.interpolate(batched.float(), size=(new_h, new_w), mode="bilinear",
                        align_corners=False, antialias=antialias)
    return out if img.dim() == 4 else out[0]


def to_tensor(pic):
    from . import ToTensor

    return ToTensor()(pic)
