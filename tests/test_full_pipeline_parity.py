"""End-to-end output parity vs reference semantics (VERDICT r1 #6 / BASELINE
config #1): one image through a torch model in the REFERENCE layout
(trunk + det convs + seg convs + MaskRCNN-style mask head), decoded with an
independent numpy implementation of the reference inference pipeline
(``yolo_head.py:185-213`` decode → ``utils_general.py:299-356`` objectness
greedy NMS → ``yolo_head.py:473-511`` hierarchical scores/labels →
``yolo_head.py:279-299`` per-level ROI-align → mask head), and the same
weights imported into the flax Model running the full jitted inference.

Final boxes, labels, scores AND 28×28 masks must agree within numeric
tolerance (NMS tie-break differences would fail the box match)."""

import numpy as np
import pytest
import torch

from hd_yolo_tpu.models.builder import parse_model_cfg
from hd_yolo_tpu.utils.import_torch import import_state_dict
from hd_yolo_tpu.utils.torch_baseline import TorchTrunk, _Conv


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- torch side
class TorchRefModel(torch.nn.Module):
    """Trunk + det convs (TorchTrunk) + reference-layout mask branch:
    per-level ``seg`` convs (built coarsest-first like the reference) and the
    MaskRCNNHeads/Predictor stack under ``seg_h`` naming."""

    def __init__(self, spec, dim_reduced=64, nc_masks=2):
        super().__init__()
        self.trunk = TorchTrunk(spec)
        h = spec.headers[0]
        self.nl = len(h.in_channels)
        # reference builds the seg conv list top-down: seg[k] ↔ level nl-1-k
        self.seg = torch.nn.ModuleList(
            [_Conv(c, dim_reduced, 3) for c in reversed(h.in_channels)]
        )
        heads = torch.nn.Sequential()
        for j in range(4):
            heads.add_module(f"mask_fcn{j + 1}",
                             torch.nn.Conv2d(dim_reduced, dim_reduced, 3, padding=1))
            heads.add_module(f"relu{j + 1}", torch.nn.ReLU())
        preds = torch.nn.Sequential()
        preds.add_module("conv5_mask",
                         torch.nn.ConvTranspose2d(dim_reduced, dim_reduced, 2, 2))
        preds.add_module("relu", torch.nn.ReLU())
        preds.add_module("mask_fcn_logits",
                         torch.nn.Conv2d(dim_reduced, nc_masks, 1))
        self.seg_h = torch.nn.ModuleDict(
            {"maskrcnn_heads": heads, "maskrcnn_preds": preds}
        )

    def forward(self, x):
        det_maps = self.trunk(x)                       # per level (1, A·no, H, W)
        saved, cur = {}, x
        for l, m in zip(self.trunk.spec.layers, self.trunk.blocks):
            if l.module == "Concat":
                cur = torch.cat([cur if j == -1 else saved[j] for j in l.from_idx], 1)
            else:
                inp = cur if l.from_idx == -1 else saved[l.from_idx]
                cur = m(inp)
            if l.index in self.trunk.spec.save:
                saved[l.index] = cur
        h = self.trunk.spec.headers[0]
        seg_feats = [self.seg[self.nl - 1 - i](saved[j])
                     for i, j in enumerate(h.from_idx)]
        return det_maps, seg_feats


def reference_state_dict(model: TorchRefModel, tag: str):
    spec = model.trunk.spec
    sd = {}
    for k, v in model.state_dict().items():
        if k.startswith("trunk.blocks."):
            i = int(k.split(".")[2])
            rest = k.split(".", 3)[3]
            base = f"backbone.{i}" if i < spec.n_backbone else f"neck.{i - spec.n_backbone}"
            sd[f"{base}.{rest}"] = v
        elif k.startswith("trunk.det."):
            l = int(k.split(".")[2])
            sd[f"headers.{tag}.m.{l}.{k.split('.', 3)[3]}"] = v
        elif k.startswith("seg."):
            sd[f"headers.{tag}.{k}"] = v
        elif k.startswith("seg_h."):
            sd[f"headers.{tag}.{k}"] = v
    return sd


# ------------------------------------------------- numpy reference inference
def np_decode(det_maps, anchors, strides):
    """(1, A·no, H, W) logits per level → (K, no+1) rows [cx,cy,w,h,obj,cls…,lvl]."""
    rows = []
    for lvl, (d, s) in enumerate(zip(det_maps, strides)):
        d = d.detach().numpy()[0]
        a = np.asarray(anchors[lvl], np.float64).reshape(-1, 2)
        A = a.shape[0]
        no = d.shape[0] // A
        H, W = d.shape[1:]
        y = 1.0 / (1.0 + np.exp(-d.reshape(A, no, H, W).astype(np.float64)))
        gx, gy = np.meshgrid(np.arange(W), np.arange(H))
        xy = np.stack([(y[:, 0] * 2 - 0.5 + gx) * s, (y[:, 1] * 2 - 0.5 + gy) * s], 1)
        # config anchors are already in input pixels (yolo_head.py:59 divides
        # by stride into cell units, then decode multiplies back)
        wh = (y[:, 2:4] * 2) ** 2 * a[:, :, None, None]
        lvl_col = np.full((A, 1, H, W), lvl, np.float64)
        r = np.concatenate([xy, wh, y[:, 4:], lvl_col], 1)  # (A, no+1, H, W)
        rows.append(r.transpose(2, 3, 0, 1).reshape(-1, no + 1))
    return np.concatenate(rows)


def np_greedy_nms(boxes, scores, iou_thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / np.maximum(ai + a - inter, 1e-12)
        sup |= iou > iou_thr
        sup[i] = True  # self (already kept)
    return np.asarray(keep, np.int64)


def np_roi_align(feat, box, M=14, n=2, scale=1.0):
    """torchvision aligned=False single-ROI bilinear pooling; feat (C, H, W)."""
    C, H, W = feat.shape
    x1, y1, x2, y2 = [c * scale for c in box]
    w = max(x2 - x1, 1.0)
    h = max(y2 - y1, 1.0)
    out = np.zeros((M, M, C))
    for oy in range(M):
        for ox in range(M):
            acc = np.zeros(C)
            for sy in range(n):
                for sx in range(n):
                    yy = y1 + (oy * n + sy + 0.5) * h / (M * n)
                    xx = x1 + (ox * n + sx + 0.5) * w / (M * n)
                    if yy <= -1.0 or yy >= H or xx <= -1.0 or xx >= W:
                        continue
                    yy = min(max(yy, 0.0), H - 1)
                    xx = min(max(xx, 0.0), W - 1)
                    y0, x0 = int(yy), int(xx)
                    y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                    ly, lx = yy - y0, xx - x0
                    acc += ((1 - ly) * (1 - lx) * feat[:, y0, x0]
                            + (1 - ly) * lx * feat[:, y0, x1i]
                            + ly * (1 - lx) * feat[:, y1i, x0]
                            + ly * lx * feat[:, y1i, x1i])
            out[oy, ox] = acc / (n * n)
    return out  # (M, M, C)


@pytest.mark.slow
def test_full_inference_output_parity(rng):
    """Boxes, labels, scores and masks of the full flax inference must match
    the numpy+torch reference pipeline after weight import."""
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model

    spec = parse_model_cfg("yolov5s-test", "hyp-nuclei")
    h = spec.headers[0]
    tmodel = TorchRefModel(spec, dim_reduced=64, nc_masks=2).eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.eps = 1e-3
        # push objectness + class logits up so real detections survive NMS
        for d in tmodel.trunk.det:
            d.bias.zero_()
            no = h.nc + 5
            for a in range(len(h.anchors[0]) // 2):
                d.bias[a * no + 4] += 1.0       # objectness prior
                d.bias[a * no + 5:(a + 1) * no] += 0.5
            d.weight.mul_(3.0)

    sd = reference_state_dict(tmodel, h.tag)
    imported = import_state_dict(sd, spec)

    model = Model(spec=spec, dim_reduced=64, max_masks=20, pre_nms_topk=256)
    x_np = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = {"params": imported["params"], "batch_stats": imported["batch_stats"]}
    _, out = model.apply(variables, jnp.asarray(x_np), train=False, compute_masks=True)
    if h.tag in out:
        out = out[h.tag]

    # ---- numpy reference pipeline
    with torch.inference_mode():
        det_maps, seg_feats = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    p = h.nms_params if hasattr(h, "nms_params") else {}
    nmsp = dict(p)
    conf, iou_thr, max_det = nmsp.get("conf_thres", 0.15), nmsp.get("iou_thres", 0.45), 300

    rows = np_decode(det_maps, h.anchors, h.strides)
    cxcywh, obj = rows[:, :4], rows[:, 4]
    boxes = np.stack([cxcywh[:, 0] - cxcywh[:, 2] / 2, cxcywh[:, 1] - cxcywh[:, 3] / 2,
                      cxcywh[:, 0] + cxcywh[:, 2] / 2, cxcywh[:, 1] + cxcywh[:, 3] / 2], -1)
    ok = (obj > conf) & (boxes[:, 2] - boxes[:, 0] >= 2.0) & (boxes[:, 3] - boxes[:, 1] >= 2.0)
    # pre-NMS topk by objectness (the capacity knob, same as the flax path)
    idx_ok = np.nonzero(ok)[0]
    idx_ok = idx_ok[np.argsort(-obj[idx_ok], kind="stable")][:256]
    keep = np_greedy_nms(boxes[idx_ok], obj[idx_ok], iou_thr)[:max_det]
    sel = idx_ok[keep]

    score_vec = rows[sel, 4:5 + h.nc].copy()
    score_vec[:, 1:] *= score_vec[:, :1]     # default hierarchy root→classes
    cls_s = score_vec[:, 1:].max(-1)
    cls_l = score_vec[:, 1:].argmax(-1)
    confident = cls_s > conf
    ref_scores = np.where(confident, cls_s, score_vec[:, 0])
    ref_labels = np.where(confident, cls_l + 1, -100)
    ref_boxes = boxes[sel]
    levels = rows[sel, -1].astype(int)

    # ---- compare detections (order-insensitive one-to-one match: equal-score
    # candidates may swap NMS order between implementations — the allowed
    # "NMS tie-break tolerance" of BASELINE.md)
    got_valid = np.asarray(out["valid"][0])
    n = int(got_valid.sum())
    assert n > 0, "test needs real detections — raise the bias boost"
    assert abs(n - len(sel)) <= max(2, int(0.05 * len(sel))), (n, len(sel))
    got_boxes = np.asarray(out["boxes"][0][:n])
    got_labels = np.asarray(out["labels"][0][:n])
    got_scores = np.asarray(out["scores"][0][:n])
    used = np.zeros(n, bool)
    pairs = []
    for r in range(len(sel)):
        d = np.abs(got_boxes - ref_boxes[r]).max(-1)
        d[used] = np.inf
        j = int(np.argmin(d))
        if d[j] < 0.05 and got_labels[j] == ref_labels[r] and \
           abs(got_scores[j] - ref_scores[r]) < 2e-3 + 2e-3 * abs(ref_scores[r]):
            used[j] = True
            pairs.append((r, j))
    frac = len(pairs) / max(len(sel), 1)
    assert frac >= 0.95, f"only {frac:.0%} of reference detections matched"

    # ---- masks: per-level ROI-align + mask head, channel by mask label
    heads = tmodel.seg_h["maskrcnn_heads"]
    preds = tmodel.seg_h["maskrcnn_preds"]
    mask_idx = np.asarray([dict(h.masks).get(i, 0) for i in range(h.nc + 1)])
    got_masks = np.asarray(out["masks"][0])
    checked = 0
    for r, j in pairs:
        if ref_labels[r] < 0 or j >= got_masks.shape[0]:
            continue
        f = seg_feats[levels[r]].detach().numpy()[0]
        pooled = np_roi_align(f, ref_boxes[r], M=14, n=2,
                              scale=1.0 / h.strides[levels[r]])
        with torch.inference_mode():
            t = torch.from_numpy(pooled.transpose(2, 0, 1)[None]).float()
            logits = preds(heads(t)).numpy()[0]     # (nc_masks, 28, 28)
        ch = mask_idx[np.clip(ref_labels[r], 0, h.nc)]
        want = 1.0 / (1.0 + np.exp(-logits[ch]))
        np.testing.assert_allclose(got_masks[j], want, rtol=5e-3, atol=5e-3)
        checked += 1
        if checked >= 10:   # the scalar numpy roi_align is slow; 10 ROIs suffice
            break
    assert checked >= 5, "too few mask comparisons exercised"
