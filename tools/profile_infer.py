#!/usr/bin/env python3
"""Stage-ablation timing of the flagship 640px inference on the real chip
(VERDICT r2 weak #3: det trunk ~46% of v5e bf16 peak — find the gap).

Times, each as N in-jit scan iterations with an anti-CSE perturbation
(tunnel-safe, see bench.py):
  backbone          — CSP trunk only
  backbone+neck     — + PANet
  +det_convs        — + 1x1 det heads (raw logits)
  +decode           — + sigmoid/grid decode
  +nms              — + padded NMS + hierarchical scores (det-only output)
  +masks            — + mask branch (full masked inference)

    python tools/profile_infer.py [--batch 16] [--iters 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg

    spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
    model = Model(spec=spec, dtype=jnp.bfloat16, max_masks=100, pre_nms_topk=1024)
    B, S = args.batch, args.img
    x0 = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    def run_stage(mdl, x, stage):
        feats = mdl.trunk(x, train=False)
        if stage == "backbone":
            # trunk() returns the saved dict incl. neck outputs; emulate a
            # backbone-only cut by summing only backbone-index levels
            return sum(jnp.sum(v.astype(jnp.float32)) for k, v in feats.items()
                       if k < spec.n_backbone)
        if stage == "neck":
            return sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values())
        header = mdl.headers["det" if "det" in mdl.headers else list(mdl.headers)[0]]
        fts = [feats[j] for j in header.spec.from_idx]
        dets = []
        for i, f in enumerate(fts):
            d = header.det_convs[i](f)
            bb, ny, nx, _ = d.shape
            dets.append(d.reshape(bb, ny, nx, header.na, header.no))
        if stage == "det_convs":
            return sum(jnp.sum(d.astype(jnp.float32)) for d in dets)
        preds = header.decode_proposals(dets)
        if stage == "decode":
            return jnp.sum(preds)
        losses, out = header(fts, None, train=False,
                             compute_masks=stage == "masks")
        return jax.tree.reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0)

    def make_loop(stage):
        @jax.jit
        def loop(v, x):
            def body(carry, _):
                s = nn.apply(lambda m, xx: run_stage(m, xx, stage), model)(
                    v, x + carry * 1e-6)
                return s * 1e-9, None
            c, _ = jax.lax.scan(body, 0.0, None, length=args.iters)
            return c.reshape(1)
        return loop

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))

    stages = ["backbone", "neck", "det_convs", "decode", "nms", "masks"]
    results = {}
    prev = 0.0
    for stage in stages:
        loop = make_loop(stage)
        float(loop(variables, xb)[0])        # compile + warm
        t0 = time.time()
        float(loop(variables, xb)[0])
        dt = (time.time() - t0) / args.iters
        results[stage] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "ms_delta": round((dt - prev) * 1e3, 3),
            "tiles_per_s": round(B / dt, 1),
        }
        prev = dt
        print(json.dumps({stage: results[stage]}), flush=True)

    # FLOPs model: reference 110.1 GF/tile at 640px (model_info comment)
    det_dt = results["nms"]["ms_per_batch"] / 1e3
    tf = 110.1e9 * B / det_dt / 1e12
    print(json.dumps({
        "det_only_tiles_per_s": results["nms"]["tiles_per_s"],
        "masked_tiles_per_s": results["masks"]["tiles_per_s"],
        "det_TFLOPs": round(tf, 1),
        "pct_v5e_bf16_peak": round(100 * tf / 197.0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
