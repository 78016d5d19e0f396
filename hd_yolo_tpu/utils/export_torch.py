"""Export flax variables into a reference-layout torch ``state_dict``.

Exact inverse of :mod:`hd_yolo_tpu.utils.import_torch` (same key map,
reversed): lets weights trained by THIS framework run inside the reference
model (``/root/reference/metayolo/models/yolo.py``) so the reference's own
``evaluation.run`` / ``val_nuclei.run`` metric code can score them — the
quality-parity leg of the measured baseline (VERDICT r2 items 1b/6).

Tensor layout conversions (mirror of import_torch.py):
  flax conv kernel (kh,kw,I,O)      → torch Conv2d weight (O,I,kh,kw)
  flax ConvTranspose (kh,kw,I,O)    → torch (I,O,kh,kw), spatially re-flipped
  bn {scale,bias} + stats {mean,var} → weight/bias/running_mean/running_var
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..models.builder import NetworkSpec


def _np(x) -> np.ndarray:
    return np.asarray(x)


class _Reader:
    def __init__(self, params: Dict, stats: Dict):
        self.params = params
        self.stats = stats
        self.sd: Dict[str, np.ndarray] = {}

    def _get(self, tree, path):
        for k in path:
            if k not in tree:
                return None
            tree = tree[k]
        return tree

    def conv(self, tkey, *fpath):
        node = self._get(self.params, fpath)
        if node is None:
            return
        self.sd[tkey + ".weight"] = _np(node["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in node:
            self.sd[tkey + ".bias"] = _np(node["bias"])

    def deconv(self, tkey, *fpath):
        node = self._get(self.params, fpath)
        if node is None:
            return
        # flax (kh,kw,I,O), unflipped on the flax side ⇒ flip back then
        # transpose to torch ConvTranspose2d (I,O,kh,kw)
        w = _np(node["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
        self.sd[tkey + ".weight"] = np.ascontiguousarray(w)
        if "bias" in node:
            self.sd[tkey + ".bias"] = _np(node["bias"])

    def bn(self, tkey, *fpath):
        p = self._get(self.params, fpath)
        s = self._get(self.stats, fpath)
        if p is None or s is None:
            return
        self.sd[tkey + ".weight"] = _np(p["scale"])
        self.sd[tkey + ".bias"] = _np(p["bias"])
        self.sd[tkey + ".running_mean"] = _np(s["mean"])
        self.sd[tkey + ".running_var"] = _np(s["var"])


def _export_conv_block(r: _Reader, tkey, fpath):
    r.conv(tkey + ".conv", *fpath, "conv")
    r.bn(tkey + ".bn", *fpath, "bn")


def _export_bottleneck(r, tkey, fpath):
    _export_conv_block(r, tkey + ".cv1", fpath + ("ConvBnAct_0",))
    _export_conv_block(r, tkey + ".cv2", fpath + ("ConvBnAct_1",))


def _export_c3(r, tkey, fpath, n):
    _export_conv_block(r, tkey + ".cv1", fpath + ("cv1",))
    _export_conv_block(r, tkey + ".cv2", fpath + ("cv2",))
    _export_conv_block(r, tkey + ".cv3", fpath + ("cv3",))
    for j in range(n):
        _export_bottleneck(r, f"{tkey}.m.{j}", fpath + (f"Bottleneck_{j}",))


def export_state_dict(
    variables: Dict,
    spec: NetworkSpec,
    tag_map: Optional[Dict[str, str]] = None,
) -> Dict[str, np.ndarray]:
    """{'params','batch_stats'} → reference-layout numpy state_dict.

    ``tag_map`` renames header tags on export (e.g. {'detSC': 'det'} to fit
    the deployed-checkpoint convention build_model expects,
    evaluation.py:42)."""
    tag_map = tag_map or {}
    r = _Reader(variables.get("params", {}), variables.get("batch_stats", {}))
    n_backbone = spec.n_backbone
    for l in spec.layers:
        if l.module in ("Concat", "Upsample", "Contract", "Expand"):
            continue
        tkey = (f"backbone.{l.index}" if l.index < n_backbone
                else f"neck.{l.index - n_backbone}")
        fpath = (f"blocks_{l.index}",)
        if l.module in ("Conv", "DWConv"):
            _export_conv_block(r, tkey, fpath)
        elif l.module in ("C3", "C3Ghost", "C3TR"):
            n = int(l.args[1]) if len(l.args) > 1 else 1
            _export_c3(r, tkey, fpath, n)
        elif l.module == "SPPF":
            _export_conv_block(r, tkey + ".cv1", fpath + ("cv1",))
            _export_conv_block(r, tkey + ".cv2", fpath + ("cv2",))
        elif l.module == "SPP":
            _export_conv_block(r, tkey + ".cv1", fpath + ("ConvBnAct_0",))
            _export_conv_block(r, tkey + ".cv2", fpath + ("ConvBnAct_1",))
        elif l.module == "Focus":
            _export_conv_block(r, tkey + ".conv", fpath + ("ConvBnAct_0",))
        elif l.module == "BatchNorm2d":
            r.bn(tkey, *fpath, "BatchNorm_0")

    for h in spec.headers:
        tag = tag_map.get(h.tag, h.tag)
        hkey = f"headers.{tag}"
        fh = f"header_{h.tag}"
        nl = len(h.strides)
        for l in range(nl):
            r.conv(f"{hkey}.m.{l}", fh, f"det{l}")
        for k in range(nl):
            # reference seg list is built top-down: seg.k ↔ level nl-1-k
            _export_conv_block(r, f"{hkey}.seg.{k}", (fh, f"seg{nl - 1 - k}"))
        for j in range(4):
            r.conv(f"{hkey}.seg_h.maskrcnn_heads.mask_fcn{j + 1}",
                   fh, "mask_head", f"fcn{j}")
        r.deconv(f"{hkey}.seg_h.maskrcnn_preds.conv5_mask",
                 fh, "mask_head", "deconv")
        r.conv(f"{hkey}.seg_h.maskrcnn_preds.mask_fcn_logits",
               fh, "mask_head", "logits")
    return r.sd


def load_any_into_reference(ref_model, path: str,
                            tag_map: Optional[Dict[str, str]] = None,
                            spec: Optional[NetworkSpec] = None) -> int:
    """Load weights from ``path`` into a built reference torch Model.

    Accepts a pickled flax variables tree ({'params', 'batch_stats'} — e.g.
    engines/checkpoint.save_inference output), or a torch .pt state_dict.
    Returns the number of tensors loaded."""
    import pickle

    import torch

    if path.endswith((".pt", ".pth")):
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict):
            for key in ("ema", "model"):
                if key in ckpt and ckpt[key] is not None:
                    obj = ckpt[key]
                    ckpt = obj.state_dict() if hasattr(obj, "state_dict") else obj
                    break
        sd = {k: torch.as_tensor(np.asarray(v)) for k, v in ckpt.items()}
    else:
        with open(path, "rb") as f:
            variables = pickle.load(f)
        if spec is None:
            from ..config import load_cfg
            from ..models.builder import parse_model_cfg

            spec = parse_model_cfg("yolov5l6-mask", load_cfg("hyp-nuclei"))
        if tag_map is None:
            tag_map = {h.tag: "det" for h in spec.headers
                       if h.tag != "det"} if len(spec.headers) == 1 else {}
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in export_state_dict(variables, spec, tag_map).items()}
    ref_sd = ref_model.state_dict()
    hits = {k: v for k, v in sd.items()
            if k in ref_sd and tuple(ref_sd[k].shape) == tuple(v.shape)}
    ref_model.load_state_dict(hits, strict=False)
    return len(hits)
