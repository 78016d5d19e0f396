"""Import timm/Microsoft-layout Swin Transformer weights into the flax Swin.

The reference loads pretrained Swin checkpoints through mmcv
(``/root/reference/hnet/swin_transformer.py:15-16, 436+``); here the standard
upstream key layout maps onto ``hnet/swin.py``:

  patch_embed.proj.{weight,bias}        → patch_embed (conv, OIHW→HWIO)
  patch_embed.norm.*                    → patch_norm
  layers.{i}.blocks.{j}.norm1.*         → stage{i}_block{j}.norm1
  …attn.qkv.{weight,bias}               → …attn.qkv (Dense, (O,I)→(I,O))
  …attn.proj.*                          → …attn.proj
  …attn.relative_position_bias_table    → …attn.relative_position_bias_table
  …norm2.* / mlp.fc1.* / mlp.fc2.*      → norm2 / fc1 / fc2
  layers.{i}.downsample.reduction/norm  → merge{i}.reduction / merge{i}.norm
  norm{k}.* (out norms, mmdet style)    → out_norm{k}

PatchMerging channel-order caveat: upstream concatenates
(x0, x1, x2, x3) = (0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2) along
C — the same order as hnet/swin.py's PatchMerging, so reduction weights map
directly.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from .. import LOGGER


def _t(x) -> np.ndarray:
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _dense(sd, key):
    out = {"kernel": _t(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _ln(sd, key):
    return {"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])}


def import_swin_state_dict(sd: Dict, depths: Tuple[int, ...] = (2, 2, 6, 2)) -> Dict:
    """timm/microsoft Swin state_dict → params tree for hnet.swin.SwinTransformer."""
    sd = {k[len("backbone."):] if k.startswith("backbone.") else k: v for k, v in sd.items()}
    p: Dict = {}
    p["patch_embed"] = {
        "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    if "patch_embed.norm.weight" in sd:
        p["patch_norm"] = _ln(sd, "patch_embed.norm")

    used = {"patch_embed.proj.weight", "patch_embed.proj.bias",
            "patch_embed.norm.weight", "patch_embed.norm.bias"}
    for i, depth in enumerate(depths):
        for j in range(depth):
            base = f"layers.{i}.blocks.{j}"
            blk = {
                "norm1": _ln(sd, base + ".norm1"),
                "norm2": _ln(sd, base + ".norm2"),
                "fc1": _dense(sd, base + ".mlp.fc1"),
                "fc2": _dense(sd, base + ".mlp.fc2"),
                "attn": {
                    "qkv": _dense(sd, base + ".attn.qkv"),
                    "proj": _dense(sd, base + ".attn.proj"),
                    "relative_position_bias_table": _t(
                        sd[base + ".attn.relative_position_bias_table"]
                    ),
                },
            }
            p[f"stage{i}_block{j}"] = blk
            used.update(
                base + s for s in (
                    ".norm1.weight", ".norm1.bias", ".norm2.weight", ".norm2.bias",
                    ".mlp.fc1.weight", ".mlp.fc1.bias", ".mlp.fc2.weight", ".mlp.fc2.bias",
                    ".attn.qkv.weight", ".attn.qkv.bias",
                    ".attn.proj.weight", ".attn.proj.bias",
                    ".attn.relative_position_bias_table",
                )
            )
        dkey = f"layers.{i}.downsample"
        if dkey + ".reduction.weight" in sd:
            p[f"merge{i}"] = {
                "reduction": {"kernel": _t(sd[dkey + ".reduction.weight"]).T},
                "norm": _ln(sd, dkey + ".norm"),
            }
            used.update(dkey + s for s in (".reduction.weight", ".norm.weight", ".norm.bias"))

    for k in list(sd):
        m = re.fullmatch(r"norm(\d)\.(weight|bias)", k)
        if m:
            stage = int(m.group(1))
            p.setdefault(f"out_norm{stage}", {})[
                "scale" if m.group(2) == "weight" else "bias"
            ] = _t(sd[k])
            used.add(k)

    unused = [k for k in sd if k not in used
              and "relative_position_index" not in k and "attn_mask" not in k]
    if unused:
        LOGGER.info(f"swin importer: {len(unused)} keys unused (first: {unused[:4]})")
    return p
