"""Import torch Mask R-CNN weights into the flax ``hnet.mask_rcnn.MaskRCNN``.

Key layout follows torchvision's GeneralizedRCNN as the reference container
exposes it (``/root/reference/hnet/detection/mask_rcnn.py:330-370``:
``rpn.head.*``, ``roi_heads.box_head.*``, ``roi_heads.box_predictor.*``,
and — when present — ``roi_heads.mask_head.*`` / ``mask_predictor.*``).

Because the flax header uses the same anchor convention, the same BoxCoder
weights, and the same head shapes as torchvision, a transplanted checkpoint
reproduces the torch raw head outputs bit-for-bit
(tests/test_reference_golden_hnet.py).

Conversions: conv OIHW→HWIO; dense (O,I)→(I,O); the box head's fc6 input
columns are additionally permuted (C,7,7)→(7,7,C) because the flax pooler
flattens NHWC ROIs.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _conv(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[key + ".weight"]).transpose(2, 3, 1, 0)}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _deconv(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d weight is (in, out, kh, kw) → flax (kh, kw, in, out)
    out = {"kernel": _t(sd[key + ".weight"]).transpose(2, 3, 0, 1)}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _dense(sd: Dict, key: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[key + ".weight"]).T,
            "bias": _t(sd[key + ".bias"])}


def _dense_nchw_in(sd: Dict, key: str, channels: int, hw: int) -> Dict[str, np.ndarray]:
    """Dense whose torch input was a flattened (C, h, w) ROI; flax flattens
    (h, w, C) — permute the input columns accordingly."""
    w = _t(sd[key + ".weight"])  # (O, C*h*w)
    O = w.shape[0]
    w = w.reshape(O, channels, hw, hw).transpose(0, 2, 3, 1).reshape(O, -1)
    return {"kernel": w.T, "bias": _t(sd[key + ".bias"])}


def import_maskrcnn_state_dict(sd: Dict, in_channels: int = 256,
                               box_roi_size: int = 7) -> Dict:
    """torch (reference/torchvision-layout) Mask R-CNN state_dict → params
    tree for ``hnet.mask_rcnn.MaskRCNN``.  Box branch always; mask branch
    when ``roi_heads.mask_head`` keys are present."""
    sd = {k: v for k, v in sd.items()}
    p: Dict = {
        "rpn_head": {
            "conv": _conv(sd, "rpn.head.conv"),
            "cls": _conv(sd, "rpn.head.cls_logits"),
            "reg": _conv(sd, "rpn.head.bbox_pred"),
        },
        "box_head": {
            "fc6": _dense_nchw_in(sd, "roi_heads.box_head.fc6",
                                  in_channels, box_roi_size),
            "fc7": _dense(sd, "roi_heads.box_head.fc7"),
            "cls_score": _dense(sd, "roi_heads.box_predictor.cls_score"),
            "bbox_pred": _dense(sd, "roi_heads.box_predictor.bbox_pred"),
        },
    }
    if "roi_heads.mask_head.mask_fcn1.weight" in sd:
        mh = {f"fcn{i}": _conv(sd, f"roi_heads.mask_head.mask_fcn{i + 1}")
              for i in range(4)}
        mh["deconv"] = _deconv(sd, "roi_heads.mask_predictor.conv5_mask")
        mh["logits"] = _conv(sd, "roi_heads.mask_predictor.mask_fcn_logits")
        p["mask_head"] = mh
    return p


def import_fpn_state_dict(sd: Dict, prefix: str = "fpn.",
                          num_levels: int = 4, p6p7: bool = True) -> Dict:
    """torchvision FeaturePyramidNetwork (+LastLevelP6P7) state_dict →
    params tree for ``hnet.fpn.FeaturePyramidNetwork`` (reference neck,
    hnet/hnet.py:128-134): inner_blocks→lateral, layer_blocks→out,
    extra_blocks.p6/p7→p6/p7."""
    p: Dict = {}
    for i in range(num_levels):
        p[f"lateral{i}"] = _conv(sd, f"{prefix}inner_blocks.{i}")
        p[f"out{i}"] = _conv(sd, f"{prefix}layer_blocks.{i}")
    if p6p7 and f"{prefix}extra_blocks.p6.weight" in sd:
        p["p6"] = _conv(sd, f"{prefix}extra_blocks.p6")
        p["p7"] = _conv(sd, f"{prefix}extra_blocks.p7")
    return p
