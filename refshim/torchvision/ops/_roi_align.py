"""`roi_align` with torchvision's exact public semantics in pure torch.

The algorithm (average-pooled bilinear samples on a per-bin grid, the
``aligned`` half-pixel offset, the un-aligned min-size-1 clamp, adaptive
``sampling_ratio=-1`` grids, and the (-1, H)/(-1, W) border zeroing) follows
the published torchvision operator contract; the implementation here is
vectorized over ROIs in chunks so the reference model runs on CPU without
the compiled torchvision extension.  Reference call sites:
yolo_head.py:243,294 (sampling_ratio=2), utils_o.py:142,224 (aligned=True,
adaptive), evaluation/export paths.
"""

from typing import List, Tuple, Union

import torch
from torch import Tensor


def _to_roi_format(boxes: Union[Tensor, List[Tensor]]) -> Tensor:
    if isinstance(boxes, Tensor):
        assert boxes.dim() == 2 and boxes.size(1) == 5, (
            "Tensor boxes must be (K, 5) [batch_idx, x1, y1, x2, y2]"
        )
        return boxes
    out = []
    for i, b in enumerate(boxes):
        idx = torch.full((b.shape[0], 1), float(i), dtype=b.dtype, device=b.device)
        out.append(torch.cat([idx, b], dim=1))
    if len(out) == 0:
        return torch.zeros((0, 5))
    return torch.cat(out, dim=0)


def _roi_align_fixed_grid(feat: Tensor, rois: Tensor, ph: int, pw: int,
                          scale: float, gh: int, gw: int, aligned: bool) -> Tensor:
    """All ROIs share one (gh, gw) sampling grid -> fully vectorized.

    Torchvision's sampling rule is border-clamped bilinear with exact zero
    for points outside (-1, H)/(-1, W) — identical to
    ``grid_sample(padding_mode='border', align_corners=False)`` times an
    in-range mask (a clamped point interpolates the border pixel either
    way).  Per image, all ROIs pack along the output-H axis into ONE
    grid_sample call, and the per-bin sample average is a strided
    ``avg_pool2d`` (each ROI block spans ph·gh rows, so pooling windows
    never straddle ROIs).  Both ops have native C++ forward AND backward —
    the previous 6-D reshape+mean formulation materialized the full sample
    tensor in autograd and its backward dominated the reference's whole
    CPU train step (the mask path pools every matched candidate,
    yolo_head.py:243)."""
    K = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    batch_idx = rois[:, 0].long()
    x1 = rois[:, 1] * scale - offset
    y1 = rois[:, 2] * scale - offset
    x2 = rois[:, 3] * scale - offset
    y2 = rois[:, 4] * scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = roi_w.clamp(min=1.0)
        roi_h = roi_h.clamp(min=1.0)
    bin_h = roi_h / ph
    bin_w = roi_w / pw
    iy = torch.arange(gh, device=feat.device, dtype=feat.dtype)
    ix = torch.arange(gw, device=feat.device, dtype=feat.dtype)
    py = torch.arange(ph, device=feat.device, dtype=feat.dtype)
    px = torch.arange(pw, device=feat.device, dtype=feat.dtype)
    # (K, ph, gh) / (K, pw, gw) sample coordinates
    ys = (y1[:, None, None] + py[None, :, None] * bin_h[:, None, None]
          + (iy[None, None, :] + 0.5) * (bin_h[:, None, None] / gh)
          ).reshape(K, ph * gh)
    xs = (x1[:, None, None] + px[None, :, None] * bin_w[:, None, None]
          + (ix[None, None, :] + 0.5) * (bin_w[:, None, None] / gw)
          ).reshape(K, pw * gw)
    N, C, H, W = feat.shape
    Sy, Sx = ph * gh, pw * gw
    valid = ((ys > -1.0) & (ys < float(H)))[:, :, None] & \
            ((xs > -1.0) & (xs < float(W)))[:, None, :]
    all_valid = bool(valid.all())  # train-path GT boxes never leave the image
    # normalized sample-center coords (align_corners=False convention)
    gy = (ys + 0.5) * (2.0 / H) - 1.0              # (K, Sy)
    gx = (xs + 0.5) * (2.0 / W) - 1.0              # (K, Sx)
    out = torch.empty((K, C, ph, pw), dtype=feat.dtype, device=feat.device)
    chunk = max(1, 32_000_000 // max(1, C * Sy * Sx))
    for n in torch.unique(batch_idx):
        sel_n = torch.where(batch_idx == n)[0]
        for s in range(0, sel_n.numel(), chunk):
            sel = sel_n[s: s + chunk]
            k = sel.numel()
            grid = torch.stack(
                [gx[sel][:, None, :].expand(k, Sy, Sx),
                 gy[sel][:, :, None].expand(k, Sy, Sx)], dim=-1
            ).reshape(1, k * Sy, Sx, 2)
            v = torch.nn.functional.grid_sample(
                feat[int(n): int(n) + 1], grid, mode="bilinear",
                padding_mode="border", align_corners=False,
            )                                      # (1, C, k*Sy, Sx)
            if not all_valid:
                v = v * valid[sel].reshape(1, 1, k * Sy, Sx).to(v.dtype)
            if gh == 1 and gw == 1:
                p = v
            else:
                p = torch.nn.functional.avg_pool2d(v, (gh, gw))
            out[sel] = p.reshape(C, k, ph, pw).transpose(0, 1)
    return out


def roi_align(input: Tensor, boxes: Union[Tensor, List[Tensor]],
              output_size: Union[int, Tuple[int, int]],
              spatial_scale: float = 1.0, sampling_ratio: int = -1,
              aligned: bool = False) -> Tensor:
    rois = _to_roi_format(boxes).to(input.dtype)
    if isinstance(output_size, int):
        ph, pw = output_size, output_size
    else:
        ph, pw = int(output_size[0]), int(output_size[1])
    if rois.shape[0] == 0:
        return torch.zeros((0, input.shape[1], ph, pw),
                           dtype=input.dtype, device=input.device)
    if sampling_ratio > 0:
        return _roi_align_fixed_grid(input, rois, ph, pw, spatial_scale,
                                     sampling_ratio, sampling_ratio, aligned)
    # adaptive grid: ceil(roi_h / ph) per ROI -> bucket ROIs by grid size so
    # each bucket still runs vectorized
    offset = 0.5 if aligned else 0.0
    roi_w = (rois[:, 3] - rois[:, 1]) * spatial_scale
    roi_h = (rois[:, 4] - rois[:, 2]) * spatial_scale
    if not aligned:
        roi_w = roi_w.clamp(min=1.0)
        roi_h = roi_h.clamp(min=1.0)
    gh_all = torch.ceil(roi_h / ph).long().clamp(min=1)
    gw_all = torch.ceil(roi_w / pw).long().clamp(min=1)
    del offset
    K = rois.shape[0]
    out = torch.zeros((K, input.shape[1], ph, pw),
                      dtype=input.dtype, device=input.device)
    key = gh_all * 100_000 + gw_all
    for k in torch.unique(key):
        sel = torch.where(key == k)[0]
        gh = int(gh_all[sel[0]])
        gw = int(gw_all[sel[0]])
        out[sel] = _roi_align_fixed_grid(input, rois[sel], ph, pw,
                                         spatial_scale, gh, gw, aligned)
    return out
