"""Model container: backbone → neck → multi-task headers, from a parsed spec.

Behavioral reference: ``Model`` (``/root/reference/metayolo/models/yolo.py:26-107``)
and the CSPDarkNet/FPN executors (``yolov5.py:47-77``): the backbone is a
sequential chain with a save-list, the neck is a from-index graph, and each
header consumes its own feature subset.

TPU-first: one pure flax module; the whole forward (including NMS + mask
branch) is a single jittable function.  The reference's per-annotation feature
replication (``yolo.py:64-70`` keep_idx) becomes batch-wide processing with
per-image ``active`` masks — images without a task's annotations contribute
zero loss for that task, keeping the grad tree dense (SURVEY.md §5.2).

The TorchScript ``Deploy`` concept (yolo.py:110-143) maps to jitting
``Model.apply`` with ``train=False`` — see engines/evaluate.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .builder import NetworkSpec, parse_model_cfg
from . import layers as L
from .detect_head import Detect

Array = jnp.ndarray

_MODULES = {
    "Conv": L.ConvBnAct,
    "DWConv": L.DWConv,
    "Bottleneck": L.Bottleneck,
    "BottleneckCSP": L.BottleneckCSP,
    "C3": L.C3,
    "C3TR": L.C3TR,
    "C3SPP": L.C3SPP,
    "C3Ghost": L.C3Ghost,
    "SPP": L.SPP,
    "SPPF": L.SPPF,
    "Focus": L.Focus,
    "GhostConv": L.GhostConv,
    "GhostBottleneck": L.GhostBottleneck,
    "CrossConv": L.CrossConv,
    "Contract": L.Contract,
    "Expand": L.Expand,
    "Concat": L.Concat,
    "Upsample": L.Upsample,
    "BatchNorm2d": L.BatchNorm2d,
    "MixConv2d": L.MixConv2d,
    "MaxPool2d": L.MaxPool2d,
    "ZeroPad2d": L.ZeroPad2d,
}
_NO_DTYPE = {"Contract", "Expand", "Concat", "Upsample", "MaxPool2d", "ZeroPad2d"}


class Model(nn.Module):
    """Config-driven multi-task detector.

    Construct via ``Model.from_cfg('yolov5l6-mask', hyp)`` or directly with a
    parsed ``NetworkSpec``.
    """

    spec: NetworkSpec
    dtype: Any = jnp.float32
    pre_nms_topk: int = 1024
    max_masks: int = 100
    mask_rois: int = 64
    dim_reduced: int = 256   # mask-branch channel width (yolo_head.py:114)
    # opt-in mask-pool window (feature px); exact for boxes spanning ≤ w−2
    # cells at their level — see ops.roi_align.multiscale_roi_align_batched
    mask_window: Any = None
    # occupancy packing: global cross-batch mask-ROI budget (None = legacy
    # per-image capacity) — see Detect.mask_budget
    mask_budget: Any = None

    @classmethod
    def from_cfg(cls, cfg, hyp=None, **kwargs) -> "Model":
        return cls(spec=parse_model_cfg(cfg, hyp), **kwargs)

    def setup(self):
        mods = []
        for l in self.spec.layers:
            klass = _MODULES[l.module]
            kwargs = {} if l.module in _NO_DTYPE else {"dtype": self.dtype}
            if l.n > 1:
                mods.append([klass(*l.args, **kwargs) for _ in range(l.n)])
            else:
                mods.append(klass(*l.args, **kwargs))
        self.blocks = mods
        headers = {}
        for h in self.spec.headers:
            if h.kind == "anchor_free":
                from .anchor_free_head import AnchorFreeDetect

                headers[h.tag] = AnchorFreeDetect(
                    nc=h.nc,
                    strides=h.strides,
                    nms_params=h.nms_params or AnchorFreeDetect.nms_params,
                    pre_nms_topk=self.pre_nms_topk,
                    dtype=self.dtype,
                    name=f"header_{h.tag}",
                )
            else:
                headers[h.tag] = Detect(
                    spec=h,
                    dtype=self.dtype,
                    pre_nms_topk=self.pre_nms_topk,
                    max_masks=self.max_masks,
                    mask_rois=self.mask_rois,
                    mask_window=self.mask_window,
                    mask_budget=self.mask_budget,
                    dim_reduced=self.dim_reduced,
                    name=f"header_{h.tag}",
                )
        self.headers = headers

    @property
    def task_ids(self) -> List[str]:
        return [h.tag for h in self.spec.headers]

    def trunk(self, x: Array, train: bool = False) -> Dict[int, Array]:
        """backbone + neck; returns {layer_idx: feature} for saved indices.

        uint8 input is normalized ON DEVICE (x/255): the data pipeline ships
        raw bytes so host→device transfer is 4× smaller — decisive on the
        tunneled chip, and still free bandwidth on co-located hosts."""
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.float32) / 255.0
        saved: Dict[int, Array] = {}
        save = set(self.spec.save)
        cur = x
        for l, mod in zip(self.spec.layers, self.blocks):
            if l.from_idx == -1:
                inp = cur
            elif isinstance(l.from_idx, int):
                inp = saved[l.from_idx]
            else:
                inp = [cur if j == -1 else saved[j] for j in l.from_idx]
            if isinstance(mod, (list, tuple)):
                for m in mod:
                    inp = m(inp, train=train)
                cur = inp
            else:
                cur = mod(inp, train=train)
            if l.index in save:
                saved[l.index] = cur
        return saved

    def __call__(
        self,
        x: Array,                                   # (B, H, W, 3) float
        targets: Optional[Dict[str, Dict[str, Array]]] = None,  # task → target dict
        train: bool = False,
        compute_masks: bool = True,
    ):
        feats = self.trunk(x, train=train)
        losses: Dict[str, Dict] = {}
        outputs: Dict[str, Dict] = {}
        for h in self.spec.headers:
            header = self.headers[h.tag]
            task_targets = targets.get(h.tag) if targets is not None else None
            l, o = header(
                [feats[j] for j in h.from_idx],
                task_targets,
                train=train,
                compute_masks=compute_masks,
            )
            losses[h.tag] = l
            outputs[h.tag] = o
        return losses, outputs

    def total_loss(self, losses: Dict[str, Dict], mask_weight: float = 1.0) -> Array:
        """Σ over tasks of det + mask loss (train.py:458-467 semantics)."""
        total = 0.0
        for task_losses in losses.values():
            total = total + task_losses["det_loss"] + mask_weight * task_losses["mask_loss"]
        return total
