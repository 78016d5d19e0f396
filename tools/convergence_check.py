#!/usr/bin/env python3
"""End-to-end convergence check: overfit 4 synthetic images and verify the
whole stack (dataset → matcher → losses → optimizer/EMA → NMS → mask branch →
APMeter) reaches near-perfect fitness.

Measured on TPU v5e (1000 steps, ~2.5 min): box fitness 0.988 (mAP@.5 0.995,
P/R/F1 = 1.0), mask-IoU fitness 0.964.

`--hnet` runs the Mask R-CNN variant instead: overfits 2 colored squares and
asserts both are detected with correct labels (measured: boxes within ~0.3 px
of GT, scores 1.0/0.99, loss 11.7 → 0.01 in 700 steps at lr 2e-3 — note
lr 0.01 diverges to NaN on the Swin backbone; keep MaskRCNN lrs ≤ 5e-3).

Run: python tools/convergence_check.py [--steps 1000] [--hnet]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def hnet_check(steps: int = 700) -> int:
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState, make_train_step
    from hd_yolo_tpu.hnet import HNet

    cfg = {
        "backbone": {"type": "swin", "embed_dim": 32, "depths": [1, 1, 1, 1],
                     "num_heads": [1, 2, 4, 8], "window_size": 4},
        "fpn": {"out_channels": 32},
        "headers": {"det": {"type": "maskrcnn", "num_classes": 2, "pre_nms_topk": 256,
                            "num_proposals": 64, "num_detections": 16,
                            "anchor_sizes": [16.0, 32.0, 64.0, 128.0],
                            "score_thresh": 0.3}},
    }
    m = HNet.from_cfg(cfg)
    rng = np.random.default_rng(0)
    B = 2
    img = rng.uniform(0, 0.3, (B, 128, 128, 3)).astype(np.float32)
    gt = np.array([[[0.1, 0.1, 0.45, 0.45], [0.55, 0.55, 0.9, 0.9]]] * B, np.float32)
    for b in range(B):
        for (x1, y1, x2, y2), c in zip((gt[b] * 128).astype(int),
                                       ((1.0, 0.2, 0.2), (0.2, 0.2, 1.0))):
            img[b, y1:y2, x1:x2] = c
    targets = {"det": {"boxes": jnp.asarray(gt), "labels": jnp.asarray([[1, 2]] * B),
                       "masks": jnp.ones((B, 2, 28, 28), jnp.float32),
                       "valid": jnp.ones((B, 2), bool)}}
    x = jnp.asarray(img)
    v = jax.jit(lambda k: m.init(k, x, targets, train=False))(jax.random.PRNGKey(0))
    tx = build_optimizer(v["params"], {"lr0": 0.002, "momentum": 0.9,
                                       "warmup_epochs": 2.0}, 100, 10)
    state = TrainState.create({"params": v["params"], "batch_stats": {}}, tx)
    step = make_train_step(m, tx)  # hnet emits outputs in train mode now
    batch = {"image": x, "targets": targets}
    for _ in range(steps):
        state, met = step(state, batch)
    print("final loss:", float(met["loss"]))
    _, out = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False))({"params": state.params}, x)
    o = out["det"]
    val = np.asarray(o["valid"][0])
    labels = sorted(np.asarray(o["labels"][0])[val].tolist())
    print("detections:", int(val.sum()), "labels:", labels)
    ok = int(val.sum()) == 2 and labels == [1, 2]
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--min-box-fitness", type=float, default=0.9)
    p.add_argument("--min-mask-fitness", type=float, default=0.8)
    p.add_argument("--hnet", action="store_true")
    opt = p.parse_args(argv)
    if opt.hnet:
        return hnet_check(min(opt.steps, 700))

    import jax
    import jax.numpy as jnp

    from test_train_cli import make_dataset
    from hd_yolo_tpu.config import load_cfg, load_dataset_info
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset
    from hd_yolo_tpu.engines import val as val_engine
    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState, make_train_step
    from hd_yolo_tpu.models import Model

    tmp = Path(tempfile.mkdtemp())
    info = load_dataset_info(make_dataset(tmp, n_images=4))
    hyp = load_cfg("hyp-nuclei")
    hyp.update({"flipud": 0.0, "fliplr": 0.0, "scale": 0.01, "translate": 0.01,
                "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
                "transpose": 0.0, "photometric": 0.0})
    m = Model.from_cfg("yolov5s-test", hyp, mask_rois=8, max_masks=16, pre_nms_topk=256)
    ds = DetectionDataset(info["train"], {**hyp, "img_size": 128, "patch_size": 128,
                                          "k_mosaic": 1}, train=True, max_targets=16)
    vds = DetectionDataset(info["val"], {"img_size": 128}, train=False, max_targets=16)
    dl = iter(DataLoader(ds, 4, workers=2, infinite=True))
    b0 = next(dl)
    variables = jax.jit(
        lambda k: m.init(k, jnp.asarray(b0["image"]),
                         jax.tree.map(jnp.asarray, b0["targets"]),
                         train=True, compute_masks=True)
    )(jax.random.PRNGKey(0))
    tx = build_optimizer(variables["params"], {**hyp, "lr0": 0.02, "warmup_epochs": 0.5},
                         epochs=100, steps_per_epoch=10)
    state = TrainState.create(variables, tx)
    step = make_train_step(m, tx, mask_weight=1.0)
    for i in range(opt.steps):
        state, met = step(state, jax.tree.map(jnp.asarray, next(dl)))
        if i % 200 == 0:
            print(f"step {i}: loss={float(met['loss']):.3f}", flush=True)

    ev = {"params": state.params, "batch_stats": state.batch_stats}
    vd = DataLoader(vds, 4, workers=1, shuffle=False, drop_last=False)
    fit, _, _ = val_engine.run(m, ev, ((b["image"], b["targets"]) for b in vd),
                               compute_masks=True, verbose=True, core_classes=2)
    vd = DataLoader(vds, 4, workers=1, shuffle=False, drop_last=False)
    fit_m, _, _ = val_engine.run(m, ev, ((b["image"], b["targets"]) for b in vd),
                                 compute_masks=True, iou_type="masks",
                                 verbose=False, core_classes=2)
    print(f"box fitness: {fit:.4f}   mask fitness: {fit_m:.4f}")
    ok = fit >= opt.min_box_fitness and fit_m >= opt.min_mask_fitness
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
