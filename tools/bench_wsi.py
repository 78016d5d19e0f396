#!/usr/bin/env python3
"""Flagship metayolo WSI pipeline benchmark on the real chip: on-device tile
extraction + masked 640px inference + stitched global NMS over a synthetic
slide (reference flow anchor: yolo_head.py:450-471 merge + evaluation.py
tiled scoring).

Round-1 recorded 187 tiles/s (4096² in 0.34 s, det-only output); this
re-measures with the round-2/3 improvements (merged-CSP trunk, batch-16,
uint8 transfer) and the mask branch on.

    python -u tools/bench_wsi.py [--slide 4096] [--batch 16] [--masks]
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
    ap.add_argument("--slide", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=640)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no-masks", dest="masks", action="store_false")
    ap.add_argument("--mask-uint8", action="store_true",
                    help="fetch masks quantized to uint8 (4x less transfer; "
                         "lossless for the 0.5-threshold product path)")
    ap.add_argument("--mask-bits", action="store_true",
                    help="fetch masks thresholded + bit-packed (32x less "
                         "transfer; lossless for the paste product path)")
    ap.add_argument("--sizes", default="",
                    help="comma-separated slide sizes to sweep (overrides "
                         "--slide), e.g. 4096,8192,16384")
    ap.add_argument("--fused", action="store_true",
                    help="one-dispatch fused pipeline (extract+forward+stitch "
                         "in a single jit, one host fetch)")
    ap.add_argument("--budget", type=int, default=512,
                    help="mask-branch occupancy budget (0 = legacy B x 100)")
    ap.add_argument("--no-band", dest="band", action="store_false",
                    help="disable band-limited stitch NMS (full quadratic)")
    ap.add_argument("--mask-rows", type=int, default=1024,
                    help="device-side mask-row compaction capacity (fetch "
                         "only the top-K mask rows; 0 = dense fetch)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg
    from hd_yolo_tpu.wsi import slide_inference, sliding_window_grid

    spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
    model = Model(spec=spec, dtype=jnp.bfloat16, max_masks=100,
                  pre_nms_topk=1024,
                  mask_budget=(args.budget or None) if args.masks else None)
    x0 = jnp.zeros((args.batch, args.tile, args.tile, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(
        k, x0, train=False, compute_masks=args.masks))(jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree.leaves(variables)[0])

    task = spec.headers[0].tag  # flagship: detSC
    fwd = jax.jit(lambda v, x: model.apply(
        v, x, train=False, compute_masks=args.masks)[1][task])
    if args.fused:
        forward = fwd                 # params threaded via forward_vars
    else:
        forward = lambda tiles: fwd(variables, tiles)

    rng = np.random.default_rng(0)
    sizes = ([int(s) for s in args.sizes.split(",")] if args.sizes
             else [args.slide])
    for size in sizes:
        slide = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
        slide_j = jnp.asarray(slide)  # device-resident: exclude tunnel H2D
        jax.block_until_ready(slide_j)

        n_tiles = len(sliding_window_grid(size, size, args.tile,
                                          args.overlap))
        kw = dict(tile=args.tile, overlap=args.overlap, batch=args.batch,
                  mask_uint8=args.mask_uint8, mask_bits=args.mask_bits,
                  fused=args.fused, band_limit=args.band,
                  mask_rows=args.mask_rows or None,
                  forward_vars=variables if args.fused else None)
        out = slide_inference(forward, slide_j, **kw)  # compile
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            out = slide_inference(forward, slide_j, **kw)
            best = min(best, time.time() - t0)
        n_det = int(np.sum(out["valid"]))
        res = {
            "wsi_tiles_per_s": round(n_tiles / best, 1),
            "wsi_mpix_per_s": round(size ** 2 / best / 1e6, 1),
            "wsi_s_per_slide": round(best, 3),
            "slide_px": size,
            "n_tiles": n_tiles,
            "n_det": n_det,
            "masks": bool(args.masks),
            "mask_uint8": bool(args.mask_uint8),
            "mask_bits": bool(args.mask_bits),
            "fused": bool(args.fused),
            "mask_budget": args.budget if args.masks else None,
            "band_limit": bool(args.band),
            "batch": args.batch,
        }
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
