#!/usr/bin/env python3
"""Mask-ROI occupancy evidence for the packed mask branch (VERDICT r3 #2).

With a TRAINED flagship checkpoint on realistic synthetic NuCLS tiles
(~40 nuclei/tile), measures how many mask-eligible detections a batch-16
inference actually carries — the bench's ``mask_budget=512`` packing is
exact-output whenever that count stays ≤ 512 — and verifies packed vs
unpacked outputs match bit-for-bit on the real data.  Writes OCCUPANCY.json.

    python tools/occupancy_check.py --run /tmp/flagship_r4/run
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="flagship_train_check run dir")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--nuclei", type=int, default=40)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--out", default="OCCUPANCY.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.engines.checkpoint import load_inference
    from hd_yolo_tpu.models import Model
    from tools.flagship_train_check import render_tile

    ev = load_inference(str(Path(args.run) / "final"))
    mk = lambda **kw: Model.from_cfg(
        "yolov5l6-mask", "hyp-nuclei", dtype=jnp.bfloat16, max_masks=100,
        pre_nms_topk=1024, mask_window=16, **kw)
    m_ref = mk()
    m_pack = mk(mask_budget=args.budget)
    f_ref = jax.jit(lambda v, x: m_ref.apply(
        v, x, train=False, compute_masks=True)[1])
    f_pack = jax.jit(lambda v, x: m_pack.apply(
        v, x, train=False, compute_masks=True)[1])

    rng = np.random.default_rng(123)
    counts, match_max = [], 0.0
    for bi in range(args.n_batches):
        tiles = np.stack([
            render_tile(rng, args.img_size, args.nuclei)[0]
            for _ in range(args.batch)])
        x = jnp.asarray(tiles.astype(np.float32) / 255.0)
        task = m_ref.spec.headers[0].tag
        r = {k: np.asarray(v) for k, v in f_ref(ev, x)[task].items()}
        p = {k: np.asarray(v) for k, v in f_pack(ev, x)[task].items()}
        mv_r = np.asarray(r["mask_valid"])
        mv_p = np.asarray(p["mask_valid"])
        counts.append(int(mv_r.sum()))
        # packed keeps ⊆ eligible, and when over budget only the
        # LOWEST-scored eligible detections lose masks
        assert not (~mv_r & mv_p).any(), "packed grew mask_valid"
        dropped = mv_r & ~mv_p
        sc = np.asarray(r["scores"])[:, :mv_r.shape[1]]
        if dropped.any() and mv_p.any():
            assert sc[dropped].max() <= sc[mv_p].min() + 1e-6, \
                "non-lowest-score detection lost its mask"
        d = float(np.abs(np.asarray(r["masks"])[mv_p]
                         - p["masks"][mv_p]).max()) if mv_p.any() else 0.0
        match_max = max(match_max, d)
        print(f"batch {bi}: eligible={counts[-1]} / budget={args.budget} "
              f"(per-img mean {counts[-1]/args.batch:.1f}), "
              f"dropped={int(dropped.sum())}, max|Δmask|={d:.2e}", flush=True)

    row = {
        "batch": args.batch,
        "nuclei_per_tile": args.nuclei,
        "budget": args.budget,
        "eligible_per_batch": counts,
        "eligible_max": max(counts),
        "exact_under_budget": max(counts) <= args.budget,
        "dropped_at_budget": max(0, max(counts) - args.budget),
        "max_abs_mask_diff": match_max,
        "weights": str(Path(args.run) / "final"),
    }
    print(json.dumps(row, indent=2), flush=True)
    Path(args.out).write_text(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
