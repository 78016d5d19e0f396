#!/usr/bin/env python3
"""End-to-end convergence check: overfit 4 synthetic images and verify the
whole stack (dataset → matcher → losses → optimizer/EMA → NMS → mask branch →
APMeter) reaches near-perfect fitness.

Measured on TPU v5e (1000 steps, ~2.5 min): box fitness 0.988 (mAP@.5 0.995,
P/R/F1 = 1.0), mask-IoU fitness 0.964.

Run: python tools/convergence_check.py [--steps 1000]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--min-box-fitness", type=float, default=0.9)
    p.add_argument("--min-mask-fitness", type=float, default=0.8)
    opt = p.parse_args(argv)

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
                "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0})
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
