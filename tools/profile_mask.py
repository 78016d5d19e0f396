#!/usr/bin/env python3
"""Mask-branch sub-profiling on the real chip (VERDICT r2 #2: MXU push).

The stage ablation (tools/profile_infer.py) shows the mask branch costs
~14.8 ms/batch-16 — ~46% of total masked time.  Its FLOPs split:
  seg_convs   3x3 ConvBnAct per level over full maps   ~0.21 TF @ B16
  roi_align   matmul canvas pooling, 1600 ROIs         ~0.1  TF
  mask_head   4x 3x3 conv @14x14x256 + deconv, 1600 ROIs ~1.65 TF  <- dominant

This times each in isolation plus mask-head formulation variants.

    python -u tools/profile_mask.py [--batch 16] [--iters 30]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rois", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from hd_yolo_tpu.models.detect_head import MaskHead
    from hd_yolo_tpu.ops.roi_align import multiscale_roi_align_batched

    B, R, C = args.batch, args.rois, 256
    N = B * R
    rng = np.random.default_rng(0)

    def timed(name, fn, *arrs, flops=None):
        f = jax.jit(fn)
        # float() is the only real sync on the axon tunnel (block_until_ready
        # can return before the remote execution finishes)
        float(jnp.sum(f(*arrs)))
        t0 = time.time()
        float(jnp.sum(f(*arrs)))
        dt = (time.time() - t0) / args.iters
        rec = {"ms_per_batch": round(dt * 1e3, 3)}
        if flops:
            rec["TF_per_s"] = round(flops / dt / 1e12, 1)
            rec["pct_peak"] = round(100 * flops / dt / 1e12 / 197.0, 1)
        print(json.dumps({name: rec}), flush=True)
        return dt

    def loop(body):
        def perturb(a, c):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return a + c.astype(a.dtype) * 1e-6
            return a
        def fn(*arrs):
            def b(c, _):
                s = body(*[jax.tree.map(lambda a: perturb(a, c), a) for a in arrs])
                return jnp.sum(s.astype(jnp.float32)) * 1e-9, None
            c, _ = jax.lax.scan(b, 0.0, None, length=args.iters)
            return c
        return fn

    # ---- mask head: current formulation (N,14,14,256) bf16
    head = MaskHead(nc_masks=5, dim_reduced=C, dtype=jnp.bfloat16)
    x14 = jnp.asarray(rng.uniform(-1, 1, (N, 14, 14, C)).astype(np.float32)).astype(jnp.bfloat16)
    hv = head.init(jax.random.PRNGKey(0), x14)
    head_flops = args.iters * N * (4 * 14 * 14 * C * C * 9 * 2 + 14 * 14 * 4 * C * C * 2 + 28 * 28 * C * 5 * 2)
    timed("head_14x14", loop(lambda v, x: head.apply(v, x)), hv, x14, flops=head_flops)

    # ---- variant: pad spatial to 16x16 (8-sublane aligned), crop after
    def head16(v, x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = head.apply(v, xp)
        return y[:, 2:-2, 2:-2, :]
    timed("head_pad16", loop(head16), hv, x14, flops=head_flops)

    # ---- variant: fold ROIs into one big spatial map (grid of 14x14 tiles)
    # conv over a (B, 14*G, 14*G, C) mosaic with VALID-style masking is NOT
    # semantically equal (cross-tile bleed), so time it only as an upper bound
    # of achievable conv efficiency at this channel count.
    G = int(np.ceil(np.sqrt(N)))
    xm = jnp.asarray(rng.uniform(-1, 1, (1, 14 * G, 14 * G, C)).astype(np.float32)).astype(jnp.bfloat16)
    mosaic_head = MaskHead(nc_masks=5, dim_reduced=C, dtype=jnp.bfloat16)
    mv = mosaic_head.init(jax.random.PRNGKey(0), xm)
    timed("head_mosaic_bound", loop(lambda v, x: mosaic_head.apply(v, x)), mv, xm,
          flops=args.iters * (14 * G) ** 2 * (4 * C * C * 9 * 2 + 4 * C * C * 2))

    # ---- seg convs: 3x3 C->256 over the 4 pyramid levels
    from hd_yolo_tpu.models.layers import ConvBnAct
    levels = [(80, 256), (40, 512), (20, 768), (10, 1024)]
    segs = [ConvBnAct(C, 3, act=True, dtype=jnp.bfloat16) for _ in levels]
    feats = [jnp.asarray(rng.uniform(-1, 1, (B, s, s, c)).astype(np.float32)).astype(jnp.bfloat16)
             for s, c in levels]
    svs = [m.init(jax.random.PRNGKey(i), f, train=False) for i, (m, f) in enumerate(zip(segs, feats))]
    seg_flops = args.iters * B * sum(s * s * c * C * 9 * 2 for s, c in levels)

    def seg_body(f0, f1, f2, f3):
        outs = [m.apply(v, f, train=False) for m, v, f in zip(segs, svs, (f0, f1, f2, f3))]
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs) * jnp.ones(())
    timed("seg_convs", loop(seg_body), *feats, flops=seg_flops)

    # ---- roi align: canvas pooling of R rois/img from 4 levels
    boxes = jnp.asarray(rng.uniform(0, 1, (B, R, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + boxes[..., 2:] * 100 + 8)
    boxes = boxes.at[..., :2].set(boxes[..., :2] * 500)
    lvls = jnp.asarray(rng.integers(0, 4, (B, R)), jnp.int32)
    seg_feats = [jnp.asarray(rng.uniform(-1, 1, (B, s, s, C)).astype(np.float32)).astype(jnp.bfloat16)
                 for s, _ in levels]

    def ra_body(b, f0, f1, f2, f3):
        out = multiscale_roi_align_batched([f0, f1, f2, f3], b, lvls, (8, 16, 32, 64), 14,
                                           use_pallas=True)   # XLA canvas
        return jnp.sum(out.astype(jnp.float32)) * jnp.ones(())
    timed("roi_align_xla", loop(ra_body), boxes, *seg_feats)

    from hd_yolo_tpu.ops.pallas_roi_align import multiscale_roi_align_canvas_pallas

    def ra_pallas(b, f0, f1, f2, f3):
        out = multiscale_roi_align_canvas_pallas(
            (f0, f1, f2, f3), b, lvls, (8.0, 16.0, 32.0, 64.0), 14)
        return jnp.sum(out.astype(jnp.float32)) * jnp.ones(())
    timed("roi_align_pallas", loop(ra_pallas), boxes, *seg_feats)

    # numerics: pallas vs XLA canvas on hardware (bf16 rounding tolerance)
    a = jax.jit(lambda b, *f: multiscale_roi_align_canvas_pallas(
        tuple(f), b, lvls, (8.0, 16.0, 32.0, 64.0), 14))(boxes, *seg_feats)
    r = jax.jit(lambda b, *f: multiscale_roi_align_batched(
        list(f), b, lvls, (8, 16, 32, 64), 14, use_pallas=True))(boxes, *seg_feats)
    a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
    print(json.dumps({"pallas_vs_xla_max_abs_diff": float(np.abs(a - r).max())}),
          flush=True)


if __name__ == "__main__":
    main()
