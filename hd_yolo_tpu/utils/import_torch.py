"""Import reference PyTorch checkpoints into flax variables.

Replaces ``convert_yolo_weights`` (``/root/reference/metayolo/engines/
general.py:530-559``): instead of remapping ultralytics indices into torch
modules, we map a torch ``state_dict`` straight into the flax params /
batch_stats trees.

Key layout (reference side, ``metayolo``):
  backbone.{i}.*         i = global layer index < n_backbone
  neck.{j}.*             j = global index − n_backbone
  headers.{tag}.m.{l}.*  1×1 det convs
  headers.{tag}.seg.{k}.*       per-level mask convs — NOTE: built top-down
                                 (yolo_head.py:123-124), so seg.k ↔ level nl−1−k
  headers.{tag}.seg_h.maskrcnn_heads.mask_fcn{1..4}.*
  headers.{tag}.seg_h.maskrcnn_preds.{conv5_mask, mask_fcn_logits}.*

Tensor layout conversions:
  Conv2d weight (O,I,kh,kw) → flax kernel (kh,kw,I,O)
  ConvTranspose2d weight (I,O,kh,kw) → flax (kh,kw,I,O)  [see caveat in code]
  BatchNorm weight/bias/running_mean/running_var → scale/bias + batch_stats

Ultralytics-official checkpoints (``model.{i}.*``) are first renumbered into
the backbone/neck/headers split, like convert_yolo_weights did.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import LOGGER
from ..models.builder import NetworkSpec


def _t(x) -> np.ndarray:
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _deconv(sd, prefix) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d stores (I, O, kh, kw); flax ConvTranspose expects
    # (kh, kw, I, O) and — unlike torch — does not spatially flip the kernel,
    # so flip here for numerical parity.
    w = _t(sd[prefix + ".weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}
    stats = {"mean": _t(sd[prefix + ".running_mean"]), "var": _t(sd[prefix + ".running_var"])}
    return params, stats


class _Writer:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}
        self.used: set = set()

    def put_conv(self, sd, tkey, *fpath):
        self._set(self.params, fpath, _conv(sd, tkey))
        self.used.update({tkey + ".weight"} | ({tkey + ".bias"} & set(sd)))

    def put_deconv(self, sd, tkey, *fpath):
        self._set(self.params, fpath, _deconv(sd, tkey))
        self.used.update({tkey + ".weight", tkey + ".bias"} & set(sd) | {tkey + ".weight"})

    def put_bn(self, sd, tkey, *fpath):
        p, s = _bn(sd, tkey)
        self._set(self.params, fpath, p)
        self._set(self.stats, fpath, s)
        self.used.update({tkey + k for k in (".weight", ".bias", ".running_mean", ".running_var")})

    @staticmethod
    def _set(tree, path, value):
        for k in path[:-1]:
            tree = tree.setdefault(k, {})
        tree[path[-1]] = value


def _import_conv_block(w: _Writer, sd, tkey: str, fpath: Tuple[str, ...]):
    """reference Conv = conv + bn."""
    w.put_conv(sd, tkey + ".conv", *fpath, "conv")
    w.put_bn(sd, tkey + ".bn", *fpath, "bn")


def _import_bottleneck(w, sd, tkey, fpath):
    _import_conv_block(w, sd, tkey + ".cv1", fpath + ("ConvBnAct_0",))
    _import_conv_block(w, sd, tkey + ".cv2", fpath + ("ConvBnAct_1",))


def _import_c3(w, sd, tkey, fpath, n: int):
    _import_conv_block(w, sd, tkey + ".cv1", fpath + ("cv1",))
    _import_conv_block(w, sd, tkey + ".cv2", fpath + ("cv2",))
    _import_conv_block(w, sd, tkey + ".cv3", fpath + ("cv3",))
    for j in range(n):
        _import_bottleneck(w, sd, f"{tkey}.m.{j}", fpath + (f"Bottleneck_{j}",))


def _import_sppf(w, sd, tkey, fpath):
    _import_conv_block(w, sd, tkey + ".cv1", fpath + ("cv1",))
    _import_conv_block(w, sd, tkey + ".cv2", fpath + ("cv2",))


def _import_spp(w, sd, tkey, fpath):
    _import_conv_block(w, sd, tkey + ".cv1", fpath + ("ConvBnAct_0",))
    _import_conv_block(w, sd, tkey + ".cv2", fpath + ("ConvBnAct_1",))


def _import_focus(w, sd, tkey, fpath):
    _import_conv_block(w, sd, tkey + ".conv", fpath + ("ConvBnAct_0",))


def renumber_ultralytics(sd: Dict) -> Dict:
    """ultralytics 'model.{i}.*' keys → backbone/neck/headers split, assuming
    the Detect row is last (convert_yolo_weights semantics)."""
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("model.")})
    if not idxs:
        return sd
    out = {}
    last = idxs[-1]
    for k, v in sd.items():
        if not k.startswith("model."):
            out[k] = v
            continue
        i = int(k.split(".")[1])
        rest = k.split(".", 2)[2]
        if i == last:  # Detect
            out[f"headers.det.{rest}"] = v
        else:
            out[f"model_layer.{i}.{rest}"] = v
    return out


def import_state_dict(
    sd: Dict,
    spec: NetworkSpec,
    strict: bool = False,
) -> Dict[str, Dict]:
    """torch state_dict → {'params': ..., 'batch_stats': ...} for Model(spec)."""
    if any(k.startswith("model.") for k in sd):
        sd = renumber_ultralytics(sd)
    w = _Writer()
    n_backbone = spec.n_backbone
    for l in spec.layers:
        if l.module in ("Concat", "Upsample", "Contract", "Expand"):
            continue
        if l.index < n_backbone:
            tkey = f"backbone.{l.index}"
        else:
            tkey = f"neck.{l.index - n_backbone}"
        if f"model_layer.{l.index}.conv.weight" in sd or any(
            k.startswith(f"model_layer.{l.index}.") for k in sd
        ):
            tkey = f"model_layer.{l.index}"
        fpath = (f"blocks_{l.index}",)
        if l.module == "Conv" or l.module == "DWConv":
            _import_conv_block(w, sd, tkey, fpath)
        elif l.module in ("C3", "C3Ghost", "C3TR"):
            n = l.args[1] if len(l.args) > 1 else 1
            _import_c3(w, sd, tkey, fpath, int(n))
        elif l.module == "SPPF":
            _import_sppf(w, sd, tkey, fpath)
        elif l.module == "SPP":
            _import_spp(w, sd, tkey, fpath)
        elif l.module == "Focus":
            _import_focus(w, sd, tkey, fpath)
        elif l.module == "BatchNorm2d":
            w.put_bn(sd, tkey, *fpath, "BatchNorm_0")
        else:
            msg = f"no importer for module {l.module} at layer {l.index}"
            if strict:
                raise KeyError(msg)
            LOGGER.warning(msg)

    for h in spec.headers:
        hkey = f"headers.{h.tag}"
        fh = f"header_{h.tag}"
        nl = len(h.strides)
        for l in range(nl):
            tk = f"{hkey}.m.{l}"
            if tk + ".weight" in sd:
                w.put_conv(sd, tk, fh, f"det{l}")
        # mask branch (optional)
        if f"{hkey}.seg.0.conv.weight" in sd:
            for k in range(nl):
                # reference seg list is built top-down: seg.k ↔ level nl-1-k
                _import_conv_block(w, sd, f"{hkey}.seg.{k}", (fh, f"seg{nl - 1 - k}"))
            for j in range(4):
                w.put_conv(sd, f"{hkey}.seg_h.maskrcnn_heads.mask_fcn{j + 1}",
                           fh, "mask_head", f"fcn{j}")
            w.put_deconv(sd, f"{hkey}.seg_h.maskrcnn_preds.conv5_mask",
                         fh, "mask_head", "deconv")
            w.put_conv(sd, f"{hkey}.seg_h.maskrcnn_preds.mask_fcn_logits",
                       fh, "mask_head", "logits")

    unused = [k for k in sd if k not in w.used and not k.endswith("num_batches_tracked")
              and "anchor" not in k]
    if unused:
        LOGGER.info(f"importer: {len(unused)} torch keys unused (first: {unused[:5]})")
    return {"params": w.params, "batch_stats": w.stats}


def load_torch_weights(path: str, spec: NetworkSpec) -> Dict[str, Dict]:
    """Load a .pt state_dict (or ckpt dict with 'model'/'ema' state_dicts)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("ema", "model"):
            if key in ckpt and ckpt[key] is not None:
                obj = ckpt[key]
                ckpt = obj.state_dict() if hasattr(obj, "state_dict") else obj
                break
    return import_state_dict(ckpt, spec)
