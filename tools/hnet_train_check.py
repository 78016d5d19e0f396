#!/usr/bin/env python3
"""HNet quality check on the real chip: train the full hnet-nucls stack
(Swin-T + FPN + panoptic + MaskRCNN det + cl + confliction) on DISJOINT
train/val synthetic NuCLS tiles and report held-out metrics for every task.

Counterpart of tools/flagship_train_check.py for the hnet half (BASELINE
configs #4-5; reference behavior anchor: /root/reference/hnet/hnet.py
training losses + /root/reference/hnet/detection/mask_rcnn.py:419-455
inference).  Tiles come from the same generator as the flagship check;
targets are derived per HNet's schema:

  det40x  normalized xyxy + labels (1..4) + per-instance 28x28 masks
  seg10x  tissue seg map (nucleus class c paints tissue class c), stride 16
  cl5x    tile-level label = dominant nucleus class capped to 3 classes

Eval on the held-out split: det box mAP@.5 / precision / recall via the
shared APMeter, seg mIoU, cl accuracy.

Run (real TPU):  python -u tools/hnet_train_check.py --epochs 80
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from flagship_train_check import render_tile  # noqa: E402

MAX_T = 64  # GT capacity per tile


def build_split(seed: int, n_images: int, img_size: int, nuclei: int,
                seg_stride: int = 16):
    """Render tiles → (images uint8, det/seg/cl target arrays)."""
    import cv2

    rng = np.random.default_rng(seed)
    imgs = np.zeros((n_images, img_size, img_size, 3), np.uint8)
    boxes = np.zeros((n_images, MAX_T, 4), np.float32)
    labels = np.zeros((n_images, MAX_T), np.int32)
    valid = np.zeros((n_images, MAX_T), bool)
    masks = np.zeros((n_images, MAX_T, 28, 28), np.float32)
    seg = np.zeros((n_images, img_size // seg_stride,
                    img_size // seg_stride), np.int32)
    cl = np.zeros((n_images,), np.int32)
    for i in range(n_images):
        # per-tile dominant class (60% of draws) so the cl5x tile label is
        # learnable rather than the argmax of a uniform draw
        dom = int(rng.integers(0, 4))
        probs = np.full(4, 0.4 / 3)
        probs[dom] = 0.6
        img, bxs, lbs, polys = render_tile(rng, img_size, nuclei,
                                           class_probs=probs)
        imgs[i] = img
        tissue = np.zeros((img_size, img_size), np.uint8)
        for j, (b, l, p) in enumerate(zip(bxs, lbs, polys)):
            cv2.fillPoly(tissue, [p], int(l))
            if j >= MAX_T:
                continue
            x1, y1, x2, y2 = b
            boxes[i, j] = np.asarray(b, np.float32) / img_size
            labels[i, j] = l
            valid[i, j] = True
            inst = np.zeros((img_size, img_size), np.uint8)
            cv2.fillPoly(inst, [p], 1)
            crop = inst[y1:y2 + 1, x1:x2 + 1]
            if crop.size:
                masks[i, j] = (cv2.resize(
                    crop.astype(np.float32), (28, 28),
                    interpolation=cv2.INTER_LINEAR) > 0.5)
        seg[i] = tissue[seg_stride // 2::seg_stride,
                        seg_stride // 2::seg_stride]
        counts = np.bincount([l for l in lbs], minlength=5)
        cl[i] = min(int(np.argmax(counts[1:])), 2)
    targets = {
        "det40x": {"boxes": boxes, "labels": labels, "valid": valid,
                   "masks": masks},
        "seg10x": {"seg_map": seg},
        "cl5x": {"label": cl},
    }
    return imgs, targets


def slice_targets(t, sl):
    return {task: {k: v[sl] for k, v in d.items()} for task, d in t.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--nuclei", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--out", default="HNET_QUALITY.json")
    ap.add_argument("--num-detections", type=int, default=0,
                    help="override det40x num_detections/proposals capacity "
                         "(0 = config value; r3 traded 300->100 for +53% "
                         "throughput)")
    ap.add_argument("--cl-weight", type=float, default=0.0,
                    help="cl5x loss_weight override (0 = config value)")
    ap.add_argument("--seg-weight", type=float, default=0.0,
                    help="seg10x loss_weight override (0 = config value)")
    ap.add_argument("--seg-scale", type=int, default=0,
                    help="seg10x scale_factor override (0 = config value; "
                         "4 = stride-4 loss like the single-task ceiling)")
    ap.add_argument("--seg-gt-stride", type=int, default=16,
                    help="GT seg-map stride (4 matches the single-task "
                         "ceiling measurement, PANOPTIC_CEILING.json)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState, make_train_step
    from hd_yolo_tpu.hnet import HNet
    from hd_yolo_tpu.models.metrics import APMeter
    from hd_yolo_tpu.engines.val import summarize_stats

    # disjoint seeds → disjoint tiles (generator is purely seed-driven)
    tr_imgs, tr_t = build_split(0, args.n_train, args.img, args.nuclei,
                                args.seg_gt_stride)
    va_imgs, va_t = build_split(1, args.n_val, args.img, args.nuclei,
                                args.seg_gt_stride)

    cfg = load_cfg("hnet-nucls")
    if args.num_detections:
        cfg["headers"]["det40x"]["num_detections"] = args.num_detections
        cfg["headers"]["det40x"]["num_proposals"] = max(
            args.num_detections * 2, cfg["headers"]["det40x"].get(
                "num_proposals", 512))
    if args.cl_weight:
        cfg["headers"]["cl5x"]["loss_weight"] = args.cl_weight
    if args.seg_weight:
        cfg["headers"]["seg10x"]["loss_weight"] = args.seg_weight
    if args.seg_scale:
        cfg["headers"]["seg10x"]["scale_factor"] = args.seg_scale
    model = HNet.from_cfg(cfg, dtype=jnp.bfloat16)
    k0 = jax.random.PRNGKey(0)
    B = args.batch
    x0 = jnp.asarray(tr_imgs[:B])
    t0 = jax.tree.map(jnp.asarray, slice_targets(tr_t, slice(0, B)))
    print("init...", flush=True)
    variables = jax.jit(lambda k, xx, tt: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)}, xx, tt, train=True
    ))(k0, x0, t0)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params:,}", flush=True)

    steps_per_epoch = args.n_train // B
    tx = build_optimizer(variables["params"],
                         {"lr0": args.lr, "warmup_epochs": 3.0,
                          "clip_grad_norm": 10.0},
                         epochs=args.epochs, steps_per_epoch=steps_per_epoch)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)

    # device-resident batches (the tunnel's H2D is the alternative)
    xb = [jnp.asarray(tr_imgs[i * B:(i + 1) * B]) for i in range(steps_per_epoch)]
    tb = [jax.tree.map(jnp.asarray, slice_targets(tr_t, slice(i * B, (i + 1) * B)))
          for i in range(steps_per_epoch)]

    print("train (first step compiles)...", flush=True)
    t_start = time.time()
    nan_reported = False
    for ep in range(args.epochs):
        last = None
        for i in range(steps_per_epoch):
            state, m = step(state, {"image": xb[i], "targets": tb[i]})
            last = m
        if ep % 10 == 0 or ep == args.epochs - 1:
            print(f"epoch {ep}: loss={float(last['loss']):.4f} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
        if not np.isfinite(float(last["loss"])) and not nan_reported:
            nan_reported = True
            comp = {k: float(v) for k, v in last.items()}
            bad = {k: v for k, v in comp.items() if not np.isfinite(v)}
            print(f"NON-FINITE at epoch {ep}: {json.dumps(bad)}", flush=True)
    train_s = time.time() - t_start

    # ---- eval on the held-out split
    infer = jax.jit(lambda v, xx: model.apply(v, xx, train=False)[1])
    ev = {"params": state.ema.params, "batch_stats": state.batch_stats}
    meter = APMeter()
    seg_inter = np.zeros(5)
    seg_union = np.zeros(5)
    cl_hits = 0
    for i in range(args.n_val // B):
        out = infer(ev, jnp.asarray(va_imgs[i * B:(i + 1) * B]))
        out = jax.tree.map(np.asarray, out)
        for b in range(B):
            gi = i * B + b
            ok = out["det40x"]["valid"][b].astype(bool)
            meter.add(
                {"boxes": out["det40x"]["boxes"][b][ok],
                 "scores": out["det40x"]["scores"][b][ok],
                 "labels": out["det40x"]["labels"][b][ok]},
                {"boxes": va_t["det40x"]["boxes"][gi][va_t["det40x"]["valid"][gi]]
                 * args.img,
                 "labels": va_t["det40x"]["labels"][gi][va_t["det40x"]["valid"][gi]]},
            )
            pred_seg = np.argmax(out["seg10x"]["probs"][b], -1)
            gt_seg = va_t["seg10x"]["seg_map"][gi]
            if pred_seg.shape != gt_seg.shape:  # amplification resizing
                import cv2
                pred_seg = cv2.resize(pred_seg.astype(np.uint8),
                                      gt_seg.shape[::-1],
                                      interpolation=cv2.INTER_NEAREST)
            for c in range(5):
                seg_inter[c] += np.sum((pred_seg == c) & (gt_seg == c))
                seg_union[c] += np.sum((pred_seg == c) | (gt_seg == c))
            cl_hits += int(np.argmax(out["cl5x"]["probs"][b]) ==
                           va_t["cl5x"]["label"][gi])

    det = summarize_stats(meter, "det40x", core_classes=4, verbose=True)
    present = seg_union > 0
    miou = float(np.mean(seg_inter[present] / seg_union[present]))
    res = {
        "config": {"epochs": args.epochs, "n_train": args.n_train,
                   "n_val": args.n_val, "batch": B, "img": args.img,
                   "params": int(n_params),
                   "num_detections": args.num_detections or "cfg",
                   "cl_weight": args.cl_weight or "cfg",
                   "seg_weight": args.seg_weight or "cfg",
                   "seg_scale": args.seg_scale or "cfg",
                   "seg_gt_stride": args.seg_gt_stride},
        "train_wall_s": round(train_s, 1),
        "det_map50": round(float(det["map50"]), 4),
        "det_map": round(float(det["map"]), 4),
        "det_precision": round(float(det["mp"]), 4),
        "det_recall": round(float(det["mr"]), 4),
        "det_fitness": round(float(det["fitness"]), 4),
        "seg_miou": round(miou, 4),
        "cl_acc": round(cl_hits / args.n_val, 4),
    }
    print(json.dumps(res), flush=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
