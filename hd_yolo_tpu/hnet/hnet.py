"""HNet container: backbone → FPN → per-task headers + cross-task constraints.

Behavioral reference: ``/root/reference/hnet/hnet.py:104-292`` /
``hnet_new.py:100-302``: config-driven backbone (swin/darknet) →
``BasicFeaturePyramidNetwork`` (+P6P7) → per-task headers (PanopticSeg /
MaskRCNN) at different amplifications → ``constrains`` dict of
ConstrainModule per hierarchy edge set.

TPU-first: the reference's manual model parallelism (``backbone.cuda(0);
headers.cuda(2)`` + activation hops, hnet.py:177-179,221) is replaced by one
pure module — shard with pjit if it ever outgrows a chip.  Per-task
amplification is expressed as ROI-align resampling of the shared pyramid
(``extract_roi_feature_maps`` semantics, hnet/utils.py:65-147) with static
ROI counts.

Config schema (mirrors hnet_new.py:100-179):
  {'backbone': {'type': 'swin'|'darknet', ...},
   'fpn': {'out_channels': 256, 'extra_blocks': 0},
   'headers': {task_id: {'type': 'maskrcnn'|'panoptic', 'num_classes': n,
                         'amplification': a, ...}},
   'constrains': {edge_id: {'seg_task': ..., 'det_task': ...,
                            'edges': [[seg_c, det_c], ...]}}}
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.builder import parse_model_cfg
from ..ops.roi_align import roi_align
from .fpn import FeaturePyramidNetwork
from .heads import ConstrainModule, PanopticSegHead
from .mask_rcnn import MaskRCNN
from .swin import SwinTransformer

Array = jnp.ndarray


def _freeze_cfg(cfg):
    if isinstance(cfg, dict):
        return tuple(sorted((k, _freeze_cfg(v)) for k, v in cfg.items()))
    if isinstance(cfg, (list, tuple)):
        return tuple(_freeze_cfg(v) for v in cfg)
    return cfg


def _thaw(frozen):
    if isinstance(frozen, tuple) and all(
        isinstance(t, tuple) and len(t) == 2 and isinstance(t[0], str) for t in frozen
    ):
        return {k: _thaw(v) for k, v in frozen}
    if isinstance(frozen, tuple):
        return [_thaw(v) for v in frozen]
    return frozen


class DarkNetBackbone(nn.Module):
    """CSP trunk reusing the metayolo layer kit (hnet_new.py:114-126 darknet path)."""

    width: float = 0.5
    depth: float = 0.33
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        from ..models.layers import C3, ConvBnAct

        outs = []
        chs = [64, 128, 256, 512, 1024]
        c = lambda v: max(int(v * self.width // 8) * 8, 8)
        x = ConvBnAct(c(64), 6, 2, 2, dtype=self.dtype)(x, train)  # /2
        for i, ch in enumerate(chs[1:]):
            x = ConvBnAct(c(ch), 3, 2, dtype=self.dtype)(x, train)
            x = C3(c(ch), max(round(3 * self.depth), 1), dtype=self.dtype)(x, train)
            if i >= 1:  # keep the /8, /16, /32 stages (3 levels)
                outs.append(x)
        return outs


class HNet(nn.Module):
    cfg_frozen: Any
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg: Dict, **kw) -> "HNet":
        return cls(cfg_frozen=_freeze_cfg(cfg), **kw)

    @property
    def cfg(self) -> Dict:
        return _thaw(self.cfg_frozen)

    def setup(self):
        cfg = self.cfg
        b = cfg.get("backbone", {"type": "swin"})
        if b.get("type", "swin") == "swin":
            self.backbone = SwinTransformer(
                embed_dim=b.get("embed_dim", 96),
                depths=tuple(b.get("depths", (2, 2, 6, 2))),
                num_heads=tuple(b.get("num_heads", (3, 6, 12, 24))),
                window_size=b.get("window_size", 7),
                dtype=self.dtype,
            )
            self.backbone_strides = (4.0, 8.0, 16.0, 32.0)
        else:
            self.backbone = DarkNetBackbone(
                width=b.get("width", 0.5), depth=b.get("depth", 0.33), dtype=self.dtype
            )
            # darknet emits 3 levels (/8,/16,/32); stride list must match the
            # feature count or MaskRCNN._pool assigns ROIs to a missing level
            self.backbone_strides = (8.0, 16.0, 32.0)

        f = cfg.get("fpn", {})
        self.fpn = FeaturePyramidNetwork(
            out_channels=f.get("out_channels", 256),
            extra_blocks=f.get("extra_blocks", 0),
            dtype=self.dtype,
        )

        headers = {}
        for task_id, h in cfg.get("headers", {}).items():
            kind = h.get("type", "maskrcnn")
            if kind == "maskrcnn":
                headers[task_id] = MaskRCNN(
                    num_classes=h["num_classes"],
                    strides=tuple(self.backbone_strides),
                    anchor_sizes=tuple(h.get("anchor_sizes", (32.0, 64.0, 128.0, 256.0))),
                    pre_nms_topk=h.get("pre_nms_topk", 1024),
                    num_proposals=h.get("num_proposals", 256),
                    num_detections=h.get("num_detections", 100),
                    with_masks=h.get("with_masks", True),
                    dtype=self.dtype,
                    name=f"header_{task_id}",
                )
            elif kind == "panoptic":
                headers[task_id] = PanopticSegHead(
                    num_classes=h["num_classes"],
                    channels=h.get("channels", 128),
                    dtype=self.dtype,
                    name=f"header_{task_id}",
                )
            elif kind in ("cl", "classification"):
                from .heads import ClassificationHead

                headers[task_id] = ClassificationHead(
                    num_classes=h["num_classes"],
                    hidden=h.get("hidden", 256),
                    dtype=self.dtype,
                    name=f"header_{task_id}",
                )
            else:
                raise ValueError(f"unknown header type {kind!r}")
        self.headers = headers
        self.header_cfg = cfg.get("headers", {})

        self.constrains = {
            cid: ConstrainModule(edges=tuple(tuple(e) for e in c["edges"]))
            for cid, c in cfg.get("constrains", {}).items()
        }
        self.constrain_cfg = cfg.get("constrains", {})

    def extract_amplified(self, feats: Sequence[Array], amp: float) -> List[Array]:
        """Resample the shared pyramid to a task amplification (the static
        analog of extract_roi_feature_maps' scale factor, hnet/utils.py:65-147)."""
        if amp == 1.0:
            return list(feats)
        out = []
        for f in feats:
            B, H, W, C = f.shape
            out.append(
                jax.image.resize(f, (B, int(H * amp), int(W * amp), C), "bilinear")
            )
        return out

    def __call__(
        self,
        x: Array,
        targets: Optional[Dict[str, Dict[str, Array]]] = None,
        train: bool = False,
        compute_masks: bool = True,  # accepted for engine compatibility; masks
    ):                               # are governed by per-header with_masks
        H, W = x.shape[1:3]
        feats = self.backbone(x, train=train)
        feats = self.fpn(feats, train=train)

        losses: Dict[str, Dict[str, Array]] = {}
        outputs: Dict[str, Dict[str, Array]] = {}
        for task_id, header in self.headers.items():
            hcfg = self.header_cfg[task_id]
            amp = float(hcfg.get("amplification", 1.0))
            task_feats = self.extract_amplified(feats, amp)
            t = targets.get(task_id) if targets is not None else None
            if isinstance(header, MaskRCNN):
                l, o = header(task_feats, (int(H * amp), int(W * amp)), t, train=train)
                if o:
                    o = dict(o)
                    o["boxes"] = o["boxes"] / amp  # back to input frame
            elif self.header_cfg[task_id].get("type") in ("cl", "classification"):
                cl_t = t.get("label") if t is not None else None
                l, o = header(task_feats, cl_t, train=train)
            else:
                seg_t = t.get("seg_map") if t is not None else None
                l, o = header(task_feats, seg_t, train=train)
            losses[task_id] = l
            outputs[task_id] = o

        # cross-header confliction losses (README's hierarchical conflict loss)
        if targets is not None and self.constrains:
            for cid, cm in self.constrains.items():
                ccfg = self.constrain_cfg[cid]
                seg_o = outputs.get(ccfg["seg_task"], {})
                det_o = outputs.get(ccfg["det_task"], {})
                if "probs" in seg_o and "boxes" in det_o:
                    seg_stride = float(self.backbone_strides[0])
                    scores = jax.nn.one_hot(
                        jnp.clip(det_o["labels"], 0, None), seg_o["probs"].shape[-1]
                    ) * det_o["scores"][..., None]
                    losses.setdefault("constrains", {})[cid] = cm(
                        seg_o["probs"], det_o["boxes"], scores,
                        det_o["valid"], seg_stride=seg_stride,
                    )
        return losses, outputs

    def total_loss(self, losses: Dict[str, Dict[str, Array]], mask_weight: float = 1.0) -> Array:
        total = 0.0
        for task, task_losses in losses.items():
            for k, v in task_losses.items():
                w = mask_weight if "mask" in k else 1.0
                total = total + w * v
        return total
