#!/usr/bin/env python3
"""Stage-level HNet profile on the real TPU: where do the ms go?

Times (in-jit scan, single fetch — tunnel-safe):
  * Swin-T backbone alone (hnet-nucls dims), bf16 and f32
  * backbone + FPN
  * full hnet-nucls forward (all headers)
and per-Swin-stage deltas (stage0..3) to localize window-attention cost.

MEASURED (v5e, r3, batch 4 @ 640px): swin_backbone_bf16 12.7 ms (315
tiles/s) · swin_backbone_f32 17.7 ms · hnet_full_bf16 38.1 ms — the
headers are 2/3 of the full forward; tools/hnet_header_lab.py drills in.

    python tools/profile_hnet_stages.py [--batch 4] [--img 640] [--iters 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, args_, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(carry, _):
            s = fn(*a[:-1], a[-1] + carry * 1e-6)
            return s * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return c.reshape(1)

    float(loop(*args_)[0])
    t0 = time.time()
    float(loop(*args_)[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", action="store_true",
                    help="also time truncated-depth Swin variants (per-stage deltas)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.hnet import HNet
    from hd_yolo_tpu.hnet.swin import SwinTransformer

    B, S = args.batch, args.img
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    k0 = jax.random.PRNGKey(0)

    def tsum(o):
        return jax.tree.reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), o, 0.0)

    for dname, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        swin = SwinTransformer(dtype=dtype)  # hnet-nucls Swin-T defaults
        v = jax.jit(lambda k, x: swin.init(k, x, train=False))(k0, xb)
        jax.block_until_ready(jax.tree.leaves(v)[0])
        dt = bench(lambda vv, x: tsum(swin.apply(vv, x, train=False)),
                   (v, xb), args.iters)
        print(json.dumps({"stage": f"swin_backbone_{dname}",
                          "ms_per_batch": round(dt * 1e3, 3),
                          "tiles_per_s": round(B / dt, 1)}), flush=True)
        if dname == "f32":
            continue

        if args.stages:
            # truncated depth variants → per-stage deltas (bf16 only)
            prev = 0.0
            for upto in range(1, 5):
                sw = SwinTransformer(
                    depths=tuple((2, 2, 6, 2)[:upto]),
                    num_heads=tuple((3, 6, 12, 24)[:upto]),
                    out_indices=tuple(range(upto)), dtype=dtype)
                vv = jax.jit(lambda k, x: sw.init(k, x, train=False))(k0, xb)
                jax.block_until_ready(jax.tree.leaves(vv)[0])
                dts = bench(lambda w, x: tsum(sw.apply(w, x, train=False)),
                            (vv, xb), args.iters)
                print(json.dumps({"stage": f"swin_upto{upto}_{dname}",
                                  "ms_per_batch": round(dts * 1e3, 3),
                                  "ms_delta": round((dts - prev) * 1e3, 3)}),
                      flush=True)
                prev = dts

    # backbone + FPN + full hnet (bf16)
    cfg = load_cfg("hnet-nucls")
    model = HNet.from_cfg(cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)}, x, train=False
    ))(k0, xb)
    jax.block_until_ready(jax.tree.leaves(v)[0])
    dt = bench(lambda vv, x: tsum(model.apply(vv, x, train=False)[1]),
               (v, xb), args.iters)
    print(json.dumps({"stage": "hnet_full_bf16",
                      "ms_per_batch": round(dt * 1e3, 3),
                      "tiles_per_s": round(B / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
