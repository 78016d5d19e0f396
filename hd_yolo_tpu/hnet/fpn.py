"""Feature pyramid network + panoptic connector.

Behavioral reference:
  * ``BasicFeaturePyramidNetwork`` (``/root/reference/hnet/backbones.py:102-105``,
    torchvision FPN + optional P6/P7 extra blocks),
  * ``PanopticFeatureConnector`` (``/root/reference/hnet/segmentation/
    utils_seg.py:5-58``): Panoptic-FPN upsample-and-sum to a common stride.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class FeaturePyramidNetwork(nn.Module):
    """Lateral 1×1 + top-down sum + 3×3 output convs; optional P6/P7."""

    out_channels: int = 256
    extra_blocks: int = 0  # 0 = none, 1 = P6 (maxpool), 2 = P6+P7 (convs)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array], train: bool = False) -> List[Array]:
        C = self.out_channels
        laterals = [
            nn.Conv(C, (1, 1), dtype=self.dtype, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway
        for i in range(len(laterals) - 2, -1, -1):
            up = jnp.repeat(jnp.repeat(laterals[i + 1], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2]]
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype, name=f"out{i}")(l)
            for i, l in enumerate(laterals)
        ]
        if self.extra_blocks >= 1:
            if self.extra_blocks == 1:
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                p6 = nn.Conv(C, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name="p6")(feats[-1])
                p7 = nn.Conv(C, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name="p7")(jax.nn.relu(p6))
                outs.extend([p6, p7])
        return outs


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
