#!/usr/bin/env python3
"""Panoptic-seg ceiling experiment (VERDICT r3 #4): train the reference's OWN
``PanopticSeg`` header (/root/reference/hnet/segmentation/panoptic_seg.py:3-43)
on the SAME synthetic nuclei-tissue tiles the hnet quality check uses, to
establish what seg mIoU the reference architecture reaches on this data.

Upstream state worth recording: ``PanopticSeg`` references ``SoftDiceLoss``
(panoptic_seg.py:22) which is never defined anywhere in the reference tree —
the header cannot be constructed as shipped.  This tool supplies the standard
class-weighted soft-dice criterion under that name (the published Panoptic-FPN
/ V-Net formulation) so the reference module can run at all; everything else
(connector, upsample, loss-at-mask-resolution flow) is the reference's code
executing unmodified.

Setup mirrors the jax side (tools/hnet_train_check.py): 320px tiles, 10×-power
stride-16 finest features (a small learnable torch pyramid standing in for the
backbone at 0.25 amplification), stride-4 GT, held-out eval mIoU.

    python tools/panoptic_ceiling.py --steps 300
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ours(args):
    """Same experiment with THIS repo's PanopticSegHead: identical tiles,
    stride-4 GT, an equivalent small learnable pyramid (strides 16/32/64 of
    the 40x frame), single-task — isolates the header from the hnet
    multi-task interaction."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from hd_yolo_tpu.hnet.heads import PanopticSegHead
    from tools.hnet_train_check import build_split

    imgs_tr, t_tr = build_split(0, args.n_train, args.img_size, args.nuclei)
    imgs_va, t_va = build_split(1, args.n_val, args.img_size, args.nuclei)
    seg_tr = t_tr["seg10x"]["seg_map"]
    seg_va = t_va["seg10x"]["seg_map"]

    class Pyramid(nn.Module):
        c: int = 64

        @nn.compact
        def __call__(self, x10):
            def blk(x, s, name):
                x = nn.Conv(self.c, (3, 3), strides=(s, s), padding="SAME",
                            name=f"{name}_conv")(x)
                x = nn.GroupNorm(num_groups=8, name=f"{name}_gn")(x)
                return jax.nn.relu(x)
            a = blk(x10, 4, "s4")
            b = blk(a, 2, "s8")
            c = blk(b, 2, "s16")
            return [a, b, c]

    class SegNet(nn.Module):
        @nn.compact
        def __call__(self, x10, targets=None):
            feats = Pyramid(name="pyramid")(x10)
            return PanopticSegHead(num_classes=5, channels=64,
                                   scale_factor=4, name="head")(feats, targets)

    net = SegNet()
    x_tr = jax.image.resize(
        jnp.asarray(imgs_tr, jnp.float32) / 255.0,
        (args.n_train, args.img_size // 4, args.img_size // 4, 3), "bilinear")
    y_tr = jnp.asarray(seg_tr)
    variables = net.init(jax.random.PRNGKey(0), x_tr[:1], y_tr[:1])
    tx = optax.adam(args.lr)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_fn(p):
            losses, _ = net.apply({"params": p}, xb, yb)
            return losses["seg_loss"]
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    rng = np.random.default_rng(0)
    params = variables["params"]
    t0 = time.time()
    for it in range(args.steps):
        sel = rng.integers(0, args.n_train, args.batch)
        params, opt, loss = step(params, opt, x_tr[sel], y_tr[sel])
        if it % 50 == 0:
            print(f"step {it}: seg_loss={float(loss):.4f}", flush=True)
    train_s = time.time() - t0

    x_va = jax.image.resize(
        jnp.asarray(imgs_va, jnp.float32) / 255.0,
        (args.n_val, args.img_size // 4, args.img_size // 4, 3), "bilinear")
    _, out = jax.jit(lambda p, x: net.apply({"params": p}, x))(params, x_va)
    pred = np.argmax(np.asarray(out["probs"]), -1)
    inter = np.zeros(5)
    union = np.zeros(5)
    for j in range(args.n_val):
        pj, gt = pred[j], seg_va[j]
        if pj.shape != gt.shape:
            import cv2

            pj = cv2.resize(pj.astype(np.uint8), gt.shape[::-1],
                            interpolation=cv2.INTER_NEAREST)
        for c in range(5):
            inter[c] += np.sum((pj == c) & (gt == c))
            union[c] += np.sum((pj == c) | (gt == c))
    present = union > 0
    miou = float(np.mean(inter[present] / union[present]))
    row = {
        "source": "hd_yolo_tpu PanopticSegHead (scale_factor=4), same tiles/"
                  "GT/pyramid-shape as the reference leg, single-task",
        "steps": args.steps, "batch": args.batch,
        "seg_miou": round(miou, 4),
        "per_class_iou": [round(float(i / u), 4) if u else None
                          for i, u in zip(inter, union)],
        "train_s": round(train_s, 1),
    }
    print(json.dumps(row, indent=2), flush=True)
    out_p = Path(args.out)
    existing = json.loads(out_p.read_text()) if out_p.exists() else {}
    existing["ours_panoptic_seg_head"] = row
    out_p.write_text(json.dumps(existing, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--nuclei", type=int, default=30)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default="PANOPTIC_CEILING.json")
    ap.add_argument("--ours", action="store_true",
                    help="run the jax-side single-task leg instead")
    args = ap.parse_args()
    if args.ours:
        return ours(args)

    from hd_yolo_tpu.utils.reference_oracle import enable_reference

    assert enable_reference(), "reference checkout not available"
    import torch

    # ---- the missing criterion, supplied under the name the reference uses
    class SoftDiceLoss(torch.nn.Module):
        def __init__(self, class_weight=None):
            super().__init__()
            self.class_weight = class_weight

        def forward(self, probs, onehot, eps=1e-6):
            # (N, C, H, W) soft probabilities vs one-hot; 1 − mean soft IoU
            inter = (probs * onehot).sum(dim=(-1, -2))
            union = (probs + onehot).sum(dim=(-1, -2)) - inter
            iou = (inter + eps) / (union + eps)
            w = (torch.as_tensor(self.class_weight, dtype=iou.dtype)
                 if self.class_weight is not None
                 else torch.ones(iou.shape[1]))
            present = onehot.sum(dim=(-1, -2)) > 0
            w = w[None] * present
            return -(iou * w).sum() / w.sum().clamp(min=1)

    import hnet.segmentation.panoptic_seg as ps

    ps.SoftDiceLoss = SoftDiceLoss  # supply the undefined upstream name

    from tools.hnet_train_check import build_split

    imgs_tr, t_tr = build_split(0, args.n_train, args.img_size, args.nuclei)
    imgs_va, t_va = build_split(1, args.n_val, args.img_size, args.nuclei)
    seg_tr = t_tr["seg10x"]["seg_map"]          # (N, S/4, S/4) int
    seg_va = t_va["seg10x"]["seg_map"]

    # ---- small learnable pyramid: image at 10x (0.25 amp) → strides 16/32/64
    class Pyramid(torch.nn.Module):
        def __init__(self, c=64):
            super().__init__()
            def blk(i, o, s):
                return torch.nn.Sequential(
                    torch.nn.Conv2d(i, o, 3, stride=s, padding=1),
                    torch.nn.GroupNorm(8, o), torch.nn.ReLU())
            self.s4 = blk(3, c, 4)      # on the 10x image: stride 4 → 16 @40x
            self.s8 = blk(c, c, 2)
            self.s16 = blk(c, c, 2)

        def forward(self, x10):
            a = self.s4(x10)
            b = self.s8(a)
            c = self.s16(b)
            from collections import OrderedDict

            return OrderedDict([("0", a), ("1", b), ("2", c)])

    S = args.img_size
    cfg = {
        "in_channels": 64, "num_classes": 5,
        "feature_maps": {"0": None, "1": None, "2": None},
        "scale_factor": 4, "resize_mode": "bilinear",
        "class_weight": None,
    }
    torch.manual_seed(0)
    pyr = Pyramid()
    head = ps.PanopticSeg(cfg)
    params = list(pyr.parameters()) + list(head.parameters())
    opt = torch.optim.Adam(params, lr=args.lr)

    x_tr = torch.from_numpy(imgs_tr).float().permute(0, 3, 1, 2) / 255.0
    x10_tr = torch.nn.functional.interpolate(
        x_tr, scale_factor=0.25, mode="bilinear", align_corners=False)
    y_tr = torch.from_numpy(seg_tr).long()
    onehot_tr = torch.nn.functional.one_hot(y_tr, 5).permute(0, 3, 1, 2).float()

    rng = np.random.default_rng(0)
    t0 = time.time()
    head.train()
    for it in range(args.steps):
        sel = rng.integers(0, args.n_train, args.batch)
        feats = pyr(x10_tr[sel])
        targets = [[{"roi": torch.tensor([0, 0, S // 4, S // 4]),
                     "masks": onehot_tr[j]}] for j in sel]
        res, losses = head(feats, (S // 4, S // 4), None, targets=targets)
        loss = losses["soft_iou_loss"]
        opt.zero_grad(); loss.backward(); opt.step()
        if it % 50 == 0:
            print(f"step {it}: soft_iou_loss={float(loss):.4f}", flush=True)
    train_s = time.time() - t0

    # ---- held-out eval: argmax map vs stride-4 GT, per-class IoU
    head.eval()
    inter = np.zeros(5)
    union = np.zeros(5)
    with torch.no_grad():
        x_va = torch.from_numpy(imgs_va).float().permute(0, 3, 1, 2) / 255.0
        x10_va = torch.nn.functional.interpolate(
            x_va, scale_factor=0.25, mode="bilinear", align_corners=False)
        for j in range(args.n_val):
            feats = pyr(x10_va[j: j + 1])
            res, _ = head(feats, (S // 4, S // 4), (S // 4, S // 4))
            pred = res[0][0].argmax(0).numpy()   # (Hp, Wp)
            gt = seg_va[j]
            if pred.shape != gt.shape:
                import cv2

                pred = cv2.resize(pred.astype(np.uint8), gt.shape[::-1],
                                  interpolation=cv2.INTER_NEAREST)
            for c in range(5):
                inter[c] += np.sum((pred == c) & (gt == c))
                union[c] += np.sum((pred == c) | (gt == c))
    present = union > 0
    miou = float(np.mean(inter[present] / union[present]))
    row = {
        "source": "/root/reference/hnet/segmentation/panoptic_seg.py::"
                  "PanopticSeg (unmodified; SoftDiceLoss supplied — the name "
                  "is undefined in the reference tree)",
        "data": f"{args.n_train}+{args.n_val} synthetic 320px nuclei-tissue "
                "tiles (tools/hnet_train_check.build_split), stride-4 GT",
        "steps": args.steps, "batch": args.batch,
        "seg_miou": round(miou, 4),
        "per_class_iou": [round(float(i / u), 4) if u else None
                          for i, u in zip(inter, union)],
        "train_s": round(train_s, 1),
    }
    print(json.dumps(row, indent=2), flush=True)
    out = Path(args.out)
    existing = json.loads(out.read_text()) if out.exists() else {}
    existing["reference_panoptic_seg"] = row
    out.write_text(json.dumps(existing, indent=2))


if __name__ == "__main__":
    main()
