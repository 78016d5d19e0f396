"""ImageList (hnet/transform.py:10): batched tensor + per-image sizes."""

from typing import List, Tuple

from torch import Tensor


class ImageList:
    def __init__(self, tensors: Tensor, image_sizes: List[Tuple[int, int]]):
        self.tensors = tensors
        self.image_sizes = image_sizes

    def to(self, device) -> "ImageList":
        return ImageList(self.tensors.to(device), self.image_sizes)
