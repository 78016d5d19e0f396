"""``MultiScaleRoIAlign`` shim: the FPN pooler of Lin et al. (FPN paper
eq. 1) as torchvision exposes it — infer per-level scales from feature vs
image size, map each box to a pyramid level by sqrt-area, and ROI-align it
from that level.  Used by the reference's Box/Mask/Keypoint predictors
(`/root/reference/hnet/detection/utils_det.py:243-246`)."""

import math
from typing import Dict, List, Optional, Tuple, Union

import torch
from torch import Tensor, nn

from ._roi_align import roi_align


def initLevelMapper(k_min: int, k_max: int, canonical_scale: int = 224,
                    canonical_level: int = 4, eps: float = 1e-6):
    return LevelMapper(k_min, k_max, canonical_scale, canonical_level, eps)


class LevelMapper:
    """FPN eq. 1: k = floor(k0 + log2(sqrt(area) / 224)), clamped."""

    def __init__(self, k_min: int, k_max: int, canonical_scale: int = 224,
                 canonical_level: int = 4, eps: float = 1e-6):
        self.k_min = k_min
        self.k_max = k_max
        self.s0 = canonical_scale
        self.lvl0 = canonical_level
        self.eps = eps

    def __call__(self, boxlists: List[Tensor]) -> Tensor:
        s = torch.sqrt(torch.cat(
            [(b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) for b in boxlists]))
        target_lvls = torch.floor(
            self.lvl0 + torch.log2(s / self.s0)
            + torch.tensor(self.eps, dtype=s.dtype))
        target_lvls = torch.clamp(target_lvls, min=self.k_min, max=self.k_max)
        return (target_lvls.to(torch.int64) - self.k_min).to(torch.int64)


def _convert_to_roi_format(boxes: List[Tensor]) -> Tensor:
    concat_boxes = torch.cat(boxes, dim=0)
    device, dtype = concat_boxes.device, concat_boxes.dtype
    ids = torch.cat([
        torch.full_like(b[:, :1], i, dtype=dtype,
                        layout=torch.strided, device=device)
        for i, b in enumerate(boxes)
    ], dim=0)
    return torch.cat([ids, concat_boxes], dim=1)


def _infer_scale(feature: Tensor, original_size: List[int]) -> float:
    # assumption: the scale is of the form 2 ** (-k), with k integer
    possible_scales: List[float] = []
    for s1, s2 in zip(feature.shape[-2:], original_size):
        approx_scale = float(s1) / float(s2)
        scale = 2 ** float(torch.tensor(approx_scale).log2().round())
        possible_scales.append(scale)
    assert possible_scales[0] == possible_scales[1]
    return possible_scales[0]


class MultiScaleRoIAlign(nn.Module):
    def __init__(self, featmap_names: List[str],
                 output_size: Union[int, Tuple[int], List[int]],
                 sampling_ratio: int, *, canonical_scale: int = 224,
                 canonical_level: int = 4):
        super().__init__()
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.featmap_names = featmap_names
        self.sampling_ratio = sampling_ratio
        self.output_size = tuple(output_size)
        self.scales: Optional[List[float]] = None
        self.map_levels: Optional[LevelMapper] = None
        self.canonical_scale = canonical_scale
        self.canonical_level = canonical_level

    def setup_scales(self, features: List[Tensor],
                     image_shapes: List[Tuple[int, int]]) -> None:
        assert len(image_shapes) != 0
        max_x = max(shape[0] for shape in image_shapes)
        max_y = max(shape[1] for shape in image_shapes)
        original_input_shape = (max_x, max_y)

        scales = [_infer_scale(feat, original_input_shape)
                  for feat in features]
        # min/max levels from the finest/coarsest scales
        lvl_min = -math.log2(scales[0])
        lvl_max = -math.log2(scales[-1])
        self.scales = scales
        self.map_levels = initLevelMapper(
            int(lvl_min), int(lvl_max),
            canonical_scale=self.canonical_scale,
            canonical_level=self.canonical_level)

    def forward(self, x: Dict[str, Tensor], boxes: List[Tensor],
                image_shapes: List[Tuple[int, int]]) -> Tensor:
        x_filtered = [v for k, v in x.items() if k in self.featmap_names]
        num_levels = len(x_filtered)
        rois = _convert_to_roi_format(boxes)
        if self.scales is None:
            self.setup_scales(x_filtered, image_shapes)
        assert self.scales is not None

        if num_levels == 1:
            return roi_align(
                x_filtered[0], rois, output_size=self.output_size,
                spatial_scale=self.scales[0],
                sampling_ratio=self.sampling_ratio)

        assert self.map_levels is not None
        levels = self.map_levels(boxes)

        num_rois = len(rois)
        num_channels = x_filtered[0].shape[1]
        dtype, device = x_filtered[0].dtype, x_filtered[0].device
        result = torch.zeros(
            (num_rois, num_channels) + self.output_size,
            dtype=dtype, device=device)
        for level, (per_level_feature, scale) in enumerate(
                zip(x_filtered, self.scales)):
            idx_in_level = torch.where(levels == level)[0]
            rois_per_level = rois[idx_in_level]
            result_idx_in_level = roi_align(
                per_level_feature, rois_per_level,
                output_size=self.output_size, spatial_scale=scale,
                sampling_ratio=self.sampling_ratio)
            result[idx_in_level] = result_idx_in_level.to(result.dtype)
        return result
