"""Subset of torchvision.models.detection.transform used by the reference's
hnet/transform.py wildcard import: resize/normalize helpers and
GeneralizedRCNNTransform (public torchvision contract, minimal batch logic)."""

import math
from typing import Dict, List, Optional, Tuple

import torch
import torch.nn.functional as F
from torch import Tensor, nn

from .image_list import ImageList

__all__ = ["GeneralizedRCNNTransform", "ImageList", "resize_boxes",
           "resize_keypoints", "paste_masks_in_image"]

from .roi_heads import paste_masks_in_image  # noqa: E402  (re-export parity)


def resize_boxes(boxes: Tensor, original_size: List[int], new_size: List[int]) -> Tensor:
    ratio_h = float(new_size[0]) / float(original_size[0])
    ratio_w = float(new_size[1]) / float(original_size[1])
    xmin, ymin, xmax, ymax = boxes.unbind(1)
    return torch.stack((xmin * ratio_w, ymin * ratio_h,
                        xmax * ratio_w, ymax * ratio_h), dim=1)


def resize_keypoints(keypoints: Tensor, original_size: List[int],
                     new_size: List[int]) -> Tensor:
    ratio_h = float(new_size[0]) / float(original_size[0])
    ratio_w = float(new_size[1]) / float(original_size[1])
    resized = keypoints.clone()
    resized[..., 0] *= ratio_w
    resized[..., 1] *= ratio_h
    return resized


class GeneralizedRCNNTransform(nn.Module):
    def __init__(self, min_size, max_size, image_mean, image_std, **kwargs):
        super().__init__()
        if not isinstance(min_size, (list, tuple)):
            min_size = (min_size,)
        self.min_size = min_size
        self.max_size = max_size
        self.image_mean = image_mean
        self.image_std = image_std
        self.size_divisible = kwargs.get("size_divisible", 32)

    def max_by_axis(self, the_list: List[List[int]]) -> List[int]:
        maxes = the_list[0]
        for sublist in the_list[1:]:
            for index, item in enumerate(sublist):
                maxes[index] = max(maxes[index], item)
        return maxes

    def normalize(self, image: Tensor) -> Tensor:
        dtype, device = image.dtype, image.device
        mean = torch.as_tensor(self.image_mean, dtype=dtype, device=device)
        std = torch.as_tensor(self.image_std, dtype=dtype, device=device)
        return (image - mean[:, None, None]) / std[:, None, None]

    def resize(self, image: Tensor,
               target: Optional[Dict[str, Tensor]] = None):
        h, w = image.shape[-2:]
        size = float(self.min_size[-1])
        scale = min(size / min(h, w), float(self.max_size) / max(h, w))
        image = F.interpolate(image[None], scale_factor=scale, mode="bilinear",
                              align_corners=False, recompute_scale_factor=True)[0]
        if target is not None and "boxes" in target:
            target["boxes"] = resize_boxes(target["boxes"], [h, w],
                                           list(image.shape[-2:]))
        return image, target

    def batch_images(self, images: List[Tensor]) -> Tensor:
        max_h = max(img.shape[-2] for img in images)
        max_w = max(img.shape[-1] for img in images)
        stride = float(self.size_divisible)
        max_h = int(math.ceil(max_h / stride) * stride)
        max_w = int(math.ceil(max_w / stride) * stride)
        batched = images[0].new_zeros((len(images), images[0].shape[0], max_h, max_w))
        for img, pad in zip(images, batched):
            pad[..., :img.shape[-2], :img.shape[-1]].copy_(img)
        return batched

    def forward(self, images: List[Tensor],
                targets: Optional[List[Dict[str, Tensor]]] = None):
        images = [img for img in images]
        image_sizes: List[Tuple[int, int]] = []
        for i in range(len(images)):
            t = targets[i] if targets is not None else None
            img = self.normalize(images[i])
            img, t = self.resize(img, t)
            images[i] = img
            image_sizes.append((img.shape[-2], img.shape[-1]))
            if targets is not None and t is not None:
                targets[i] = t
        tensors = self.batch_images(images)
        return ImageList(tensors, image_sizes), targets

    def postprocess(self, result, image_shapes, original_image_sizes):
        for i, (pred, im_s, o_im_s) in enumerate(
                zip(result, image_shapes, original_image_sizes)):
            if "boxes" in pred:
                result[i]["boxes"] = resize_boxes(pred["boxes"], im_s, o_im_s)
        return result
