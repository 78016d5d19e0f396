"""Feature pyramid network (+ dynamic per-ROI variant) + panoptic connector.

Behavioral reference:
  * ``BasicFeaturePyramidNetwork`` (``/root/reference/hnet/backbones.py:102-105``,
    torchvision FPN + optional P6/P7 extra blocks),
  * ``DynamicFeaturePyramidNetwork`` (``/root/reference/hnet/backbones.py:107-159``):
    the lateral/top-down/output convs run on per-annotation ROI *crops* of the
    raw backbone levels instead of the full maps, so FPN compute scales with
    ROI area — ``get_result_from_inner_blocks`` roi_aligns each level to the
    task's per-level roi size before the 1×1 lateral conv,
  * ``PanopticFeatureConnector`` (``/root/reference/hnet/segmentation/
    utils_seg.py:5-58``): Panoptic-FPN upsample-and-sum to a common stride.

TPU-first: both paths share one parameter set (the reference subclasses the
same torchvision FPN).  The per-ROI path crops every level to an exact
power-of-two ladder ``S_l = roi_size >> l`` so the top-down upsample is a
static 2× repeat — no dynamic shapes, and the (B·R) ROI batch rides the MXU
as one big conv batch.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class FeaturePyramidNetwork(nn.Module):
    """Lateral 1×1 + top-down sum + 3×3 output convs; optional P6/P7.

    ``__call__`` consumes full feature maps; :meth:`forward_rois` consumes the
    same backbone levels but fuses only per-ROI crops (the reference's
    DynamicFeaturePyramidNetwork forward) with the *same parameters*.
    """

    out_channels: int = 256
    extra_blocks: int = 0  # 0 = none, 1 = P6 (maxpool), 2 = P6+P7 (convs)
    num_levels: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        C = self.out_channels
        self.lateral_convs = [
            nn.Conv(C, (1, 1), dtype=self.dtype, name=f"lateral{i}")
            for i in range(self.num_levels)
        ]
        self.out_convs = [
            nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype, name=f"out{i}")
            for i in range(self.num_levels)
        ]
        if self.extra_blocks >= 2:
            # explicit (1,1) pad: flax SAME pads (0,1) on stride-2 even
            # inputs, torchvision's padding=1 pads both sides (golden-matched)
            self.p6_conv = nn.Conv(C, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)),
                                   dtype=self.dtype, name="p6")
            self.p7_conv = nn.Conv(C, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)),
                                   dtype=self.dtype, name="p7")

    def _fuse(self, feats: Sequence[Array]) -> List[Array]:
        """Shared lateral + top-down + output stack over any level shapes
        related by exact 2× (full maps or ROI-crop ladders)."""
        laterals = [conv(f) for conv, f in zip(self.lateral_convs, feats)]
        for i in range(len(laterals) - 2, -1, -1):
            up = jnp.repeat(jnp.repeat(laterals[i + 1], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2]]
            laterals[i] = laterals[i] + up
        outs = [conv(l) for conv, l in zip(self.out_convs, laterals)]
        if self.extra_blocks == 1:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        elif self.extra_blocks >= 2:
            # P6 from P5 (not raw C5): torchvision LastLevelP6P7 with
            # in_channels == out_channels (the reference's configuration,
            # hnet.py:131-133) sets use_P5=True — golden-matched
            p6 = self.p6_conv(outs[-1])
            p7 = self.p7_conv(jax.nn.relu(p6))
            outs.extend([p6, p7])
        return outs

    def __call__(self, feats: Sequence[Array], train: bool = False) -> List[Array]:
        assert len(feats) == self.num_levels, (
            f"FPN built for {self.num_levels} levels, got {len(feats)}"
        )
        return self._fuse(feats)

    def forward_rois(
        self,
        feats: Sequence[Array],       # raw backbone levels (B, H_l, W_l, C_l)
        rois_px: Array,               # (B, R, 4) xyxy image pixels
        strides: Sequence[float],
        roi_size: int,                # level-0 crop resolution (feature cells)
        train: bool = False,
    ) -> List[Array]:
        """ROI-align-inside-FPN (backbones.py:109-159): crop every raw level
        to its ladder size, then run the shared FPN convs on the (B·R) crop
        batch.  Returns per level (B·R, S_l, S_l, out_channels)."""
        from .feature_mosaic import extract_roi_feature_maps

        assert len(feats) == self.num_levels
        crops = extract_roi_feature_maps(
            list(feats), rois_px, strides, roi_size=roi_size, amplification=1.0
        )
        B, R = rois_px.shape[:2]
        crops = [c.reshape((B * R,) + c.shape[2:]) for c in crops]
        return self._fuse(crops)


class PanopticFeatureConnector(nn.Module):
    """Upsample every level to the finest stride, 3×3 conv + GN + relu per
    hop, and sum (Panoptic-FPN fusion)."""

    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> Array:
        target_h, target_w = feats[0].shape[1:3]
        acc = None
        for i, f in enumerate(feats):
            x = f
            hop = 0
            while x.shape[1] < target_h:
                x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"conv{i}_{hop}")(x)
                x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn{i}_{hop}")(x)
                x = jax.nn.relu(x)
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                hop += 1
            if x.shape[-1] != self.out_channels or hop == 0:
                x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"conv{i}_{hop}")(x)
                x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn{i}_{hop}")(x)
                x = jax.nn.relu(x)
            x = x[:, :target_h, :target_w]
            acc = x if acc is None else acc + x
        return acc
