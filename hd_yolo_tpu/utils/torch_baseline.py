"""FLOPs-matched PyTorch-CPU baseline for the benchmark ratio.

The reference framework is PyTorch on CPU for deployment benchmarking
(``/root/reference/evaluation.py:97-104,150`` — ``time_per_image`` on the
``cpu`` default device).  The reference itself cannot run in this image
(torchvision/torch_scatter absent), so the baseline is reconstructed from our
parsed NetworkSpec as an architecture-identical torch conv graph (same layer
topology, channels, kernels — the trunk + det convs that dominate FLOPs).
This gives an honest same-FLOPs CPU tiles/sec figure to compare against.
"""

from __future__ import annotations

import math
import time
from typing import List

import torch
import torch.nn as nn

from ..models.builder import NetworkSpec


class _Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
        super().__init__()
        if p is None:
            p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
        self.conv = nn.Conv2d(c1, c2, k, s, p, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class _Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = _Conv(c1, c2, 1)
        self.cv2 = _Conv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class _C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = _Conv(c1, c_, 1)
        self.cv2 = _Conv(c1, c_, 1)
        self.cv3 = _Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(_Bottleneck(c_, c_, shortcut) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class _SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = _Conv(c1, c_, 1)
        self.cv2 = _Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class _MaskHead(nn.Module):
    """Torch mirror of the reference mask branch (yolo_head.py:114-130):
    MaskRCNNHeads(256x4) + deconv predictor, fed by bilinear ROI sampling
    (grid_sample stands in for torchvision.ops.roi_align, same FLOPs class)."""

    def __init__(self, dim_reduced: int = 256, nc_masks: int = 2, rois: int = 100,
                 pool: int = 14):
        super().__init__()
        self.rois, self.pool = rois, pool
        self.fcn = nn.Sequential(
            *[m for _ in range(4) for m in (nn.Conv2d(dim_reduced, dim_reduced, 3, padding=1), nn.ReLU())]
        )
        self.deconv = nn.ConvTranspose2d(dim_reduced, dim_reduced, 2, 2)
        self.logits = nn.Conv2d(dim_reduced, nc_masks, 1)
        # fixed pseudo-ROI sampling grid: R boxes bilinearly pooled to pool**2
        g = torch.linspace(-1, 1, pool)
        gy, gx = torch.meshgrid(g, g, indexing="ij")
        base = torch.stack([gx, gy], -1)  # (p, p, 2)
        scale = torch.linspace(0.05, 0.5, rois).view(rois, 1, 1, 1)
        self.register_buffer("grid", base.unsqueeze(0) * scale)  # (R, p, p, 2)

    def forward(self, feat):  # feat: (1, C, H, W) finest seg feature
        pooled = nn.functional.grid_sample(
            feat.expand(self.rois, -1, -1, -1), self.grid, align_corners=False
        )  # (R, C, p, p) — the roi_align equivalent
        x = self.fcn(pooled)
        x = nn.functional.relu(self.deconv(x))
        return self.logits(x)


class TorchTrunk(nn.Module):
    """Torch mirror of the parsed trunk graph + per-level det convs
    (+ optionally the seg convs and per-ROI mask head, so the baseline covers
    the same compute as the masked benchmark)."""

    def __init__(self, spec: NetworkSpec, masks: bool = False, max_masks: int = 100):
        super().__init__()
        self.spec = spec
        ch = {-1: spec.ch_in}
        mods: List[nn.Module] = []
        for l in spec.layers:
            cin = ch[l.from_idx if isinstance(l.from_idx, int) else l.from_idx[0]]
            args = list(l.args)
            if l.module == "Conv":
                m = _Conv(cin, *args)
            elif l.module in ("C3", "C3TR", "C3SPP", "C3Ghost", "BottleneckCSP"):
                m = _C3(cin, args[0], args[1] if len(args) > 1 else 1,
                        args[2] if len(args) > 2 else True)
            elif l.module == "SPPF":
                m = _SPPF(cin, *args)
            elif l.module == "Upsample":
                m = nn.Upsample(scale_factor=args[0], mode=args[1])
            elif l.module == "Concat":
                m = None
            else:
                m = nn.Identity()
            mods.append(m if m is not None else nn.Identity())
            ch[l.index] = l.out_channels
            ch[-1] = l.out_channels
        self.blocks = nn.ModuleList(mods)
        self.det = nn.ModuleList(
            [nn.Conv2d(c, (h.nc + 5) * (len(h.anchors[0]) // 2), 1)
             for h in spec.headers for c in h.in_channels]
        )
        self.seg = None
        if masks:
            nc_masks = max((max(dict(h.masks).values(), default=0)
                            for h in spec.headers), default=0) + 1
            self.seg = nn.ModuleList(
                [_Conv(c, 256, 3) for h in spec.headers for c in h.in_channels]
            )
            self.mask_head = _MaskHead(256, nc_masks, rois=max_masks)

    def forward(self, x):
        saved = {}
        cur = x
        for l, m in zip(self.spec.layers, self.blocks):
            if l.module == "Concat":
                cur = torch.cat(
                    [cur if j == -1 else saved[j] for j in l.from_idx], 1
                )
            else:
                inp = cur if l.from_idx == -1 else saved[l.from_idx]
                cur = m(inp)
            if l.index in self.spec.save:
                saved[l.index] = cur
        outs = []
        i = 0
        for h in self.spec.headers:
            for j in h.from_idx:
                outs.append(self.det[i](saved[j]))
                i += 1
        if self.seg is not None:
            i = 0
            seg_feats = []
            for h in self.spec.headers:
                for j in h.from_idx:
                    seg_feats.append(self.seg[i](saved[j]))
                    i += 1
            outs.append(self.mask_head(seg_feats[0]))
        return outs


def measure_cpu_tiles_per_sec(spec: NetworkSpec, img_size: int = 640, n_warm: int = 1,
                              n_iter: int = 3, masks: bool = False,
                              max_masks: int = 100) -> float:
    """Reference-equivalent CPU throughput (fp32, torch inference mode).

    ``masks=True`` mirrors the benchmark's masked path: per-level seg convs +
    the 4-conv/deconv mask head over ``max_masks`` bilinearly pooled ROIs —
    the same compute classes the TPU number includes (NMS excluded on both
    sides of neither: the TPU number INCLUDES NMS, the CPU baseline gets it
    free, so the reported ratio is conservative)."""
    model = TorchTrunk(spec, masks=masks, max_masks=max_masks).eval()
    x = torch.randn(1, spec.ch_in, img_size, img_size)
    with torch.inference_mode():
        for _ in range(n_warm):
            model(x)
        t0 = time.time()
        for _ in range(n_iter):
            model(x)
        dt = (time.time() - t0) / n_iter
    return 1.0 / dt
