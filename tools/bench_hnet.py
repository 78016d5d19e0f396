#!/usr/bin/env python3
"""HNet/Swin TPU benchmarks — BASELINE configs #4-5 (VERDICT r2 item 4).

Measures on the real chip, tunnel-safe (in-jit scan, single fetch):
  1. hnet-nucls full multi-header inference (Swin-T + FPN + panoptic +
     MaskRCNN det + cl) on 640px tiles                → tiles/s
  2. one HNet train step (all losses + confliction)   → img/s
  3. full WSI pipeline: tiled slide_inference over a synthetic slide with
     det stitching + panoptic maps                    → megapixels/s

Appends JSON lines to BENCH_HNET.json.

    python tools/bench_hnet.py [--batch 4] [--iters 10] [--skip-wsi]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_loop(fn, args_, iters, perturb):
    """Scan fn iters times inside one jit; returns seconds per iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(carry, _):
            s = fn(*a, carry * 1e-6)
            return s * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return c.reshape(1)

    float(loop(*args_)[0])       # compile + warm
    t0 = time.time()
    float(loop(*args_)[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-wsi", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false",
                    help="f32 compute (the round-3 pre-fix numbers were f32: "
                         "HNet's dtype default — half MXU peak, 2x HBM)")
    ap.add_argument("--out", default="BENCH_HNET.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.hnet import HNet

    cfg = load_cfg("hnet-nucls")
    model = HNet.from_cfg(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    B, S = args.batch, args.img
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    k0 = jax.random.PRNGKey(0)
    print("init...", flush=True)
    variables = jax.jit(lambda k, xx: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)}, xx, train=False
    ))(k0, x)
    jax.block_until_ready(jax.tree.leaves(variables)[0])
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"hnet-nucls params: {n_params:,}", flush=True)
    results = {}

    out_path = Path(args.out)

    def flush_results():
        # partial write after every leg — a crash in a later leg (long
        # remote compiles, tunnel hiccups) must not lose earlier numbers
        existing = json.loads(out_path.read_text()) if out_path.exists() else {}
        existing.update(results)
        existing["config"] = {"batch": B, "img": S, "params": int(n_params),
                              "dtype": "bf16" if args.bf16 else "f32"}
        out_path.write_text(json.dumps(existing, indent=2))

    # ---- 1. inference tiles/s
    def infer(v, xx, eps):
        _, out = model.apply(v, xx + eps, train=False)
        return jax.tree.reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

    print("bench inference (compile can take several minutes)...", flush=True)
    dt = bench_loop(infer, (variables, x), args.iters, None)
    results["hnet_infer_tiles_per_s"] = round(B / dt, 2)
    results["hnet_infer_ms_per_tile"] = round(dt / B * 1e3, 2)
    print(json.dumps(results), flush=True)
    flush_results()

    # ---- 2. train step img/s
    if not args.skip_train:
        import optax

        from hd_yolo_tpu.engines.optim import build_optimizer
        from hd_yolo_tpu.engines.train_step import TrainState, make_train_step

        T = 64
        targets = {
            "det40x": {
                "boxes": jnp.asarray(np.clip(
                    rng.uniform(0.05, 0.9, (B, T, 4)), 0, 1).astype(np.float32)),
                "labels": jnp.asarray(rng.integers(1, 5, (B, T))),
                "masks": jnp.asarray((rng.uniform(0, 1, (B, T, 28, 28)) > 0.5)
                                     .astype(np.float32)),
                "valid": jnp.ones((B, T), bool),
            },
            "seg10x": {"seg_map": jnp.asarray(
                rng.integers(0, 5, (B, S // 16, S // 16)))},
            "cl5x": {"label": jnp.asarray(rng.integers(0, 3, (B,)))},
        }
        # sanitize: xyxy with x2>x1
        bx = np.asarray(targets["det40x"]["boxes"])
        bx2 = np.stack([np.minimum(bx[..., 0], bx[..., 2]),
                        np.minimum(bx[..., 1], bx[..., 3]),
                        np.maximum(bx[..., 0], bx[..., 2]) + 0.02,
                        np.maximum(bx[..., 1], bx[..., 3]) + 0.02], -1)
        targets["det40x"]["boxes"] = jnp.asarray(np.clip(bx2, 0, 1))

        print("init train state...", flush=True)
        tv = jax.jit(lambda k, xx: model.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)}, xx,
            targets, train=True))(k0, x)
        tx = build_optimizer(tv["params"], {"lr0": 0.01, "warmup_epochs": 0.0},
                             epochs=1, steps_per_epoch=10)
        state = TrainState.create(tv, tx)
        step = make_train_step(model, tx)
        print("bench train step (compile is the long pole)...", flush=True)
        batch = {"image": x, "targets": targets}
        state, m = step(state, batch)          # compile
        float(m["loss"])
        t0 = time.time()
        n_steps = max(args.iters // 2, 3)
        for _ in range(n_steps):
            state, m = step(state, batch)
        float(m["loss"])
        dt = (time.time() - t0) / n_steps
        results["hnet_train_img_per_s"] = round(B / dt, 2)
        results["hnet_train_ms_per_step"] = round(dt * 1e3, 1)
        print(json.dumps({k: results[k] for k in results if "train" in k}),
              flush=True)
        flush_results()

    # ---- 3. WSI pipeline (tiling + stitching, det + panoptic)
    if not args.skip_wsi:
        from hd_yolo_tpu.wsi.tiling import slide_inference

        slide_px = 2560
        slide = jnp.asarray(rng.uniform(0, 1, (slide_px, slide_px, 3))
                            .astype(np.float32))
        fwd = jax.jit(lambda v, tiles: model.apply(
            v, tiles, train=False)[1]["det40x"])

        def run():
            # fused one-dispatch program + single packed fetch + band-limited
            # stitch NMS + mask-row compaction — the same treatment the
            # flagship slide path got (VERDICT r4 #4: hnet was still on the
            # streaming path with per-chunk eager dispatches)
            out = slide_inference(fwd, slide, tile=S, overlap=64, batch=B,
                                  max_total=2048, fused=True,
                                  forward_vars=variables, mask_bits=True,
                                  mask_rows=512)
            return out

        print("bench WSI slide_inference...", flush=True)
        run()                                   # compile + warm
        t0 = time.time()
        out = run()
        dt = time.time() - t0
        results["hnet_wsi_mpix_per_s"] = round(slide_px * slide_px / dt / 1e6, 2)
        results["hnet_wsi_s_per_2560px_slide"] = round(dt, 2)
        results["hnet_wsi_n_det"] = int(np.asarray(out["valid"]).sum())
        print(json.dumps({k: results[k] for k in results if "wsi" in k}),
              flush=True)
        flush_results()

    flush_results()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
