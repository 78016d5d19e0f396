#!/usr/bin/env python3
"""Mask-ROI occupancy evidence for the packed mask branch.

Round-3/4 measured the friendly case only (~40 nuclei/tile: eligible ≤ 746
vs budget 768, zero drops, bit-exact).  VERDICT r4 #3 asks for honesty at
DENSE tiles: sweep nucleus density, and when eligible exceeds the budget
measure BOTH the drop rate and the mask-AP delta of the packed path vs the
unpacked path on identical tiles + GT (our val engine, iou_type='masks').
Writes the sweep + an operating envelope to OCCUPANCY.json.

    python tools/occupancy_check.py --run /tmp/flagship_r5/run
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True, help="flagship_train_check run dir")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tiles", type=int, default=32,
                    help="val tiles per density (AP + occupancy stats)")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--sweep", default="40,80,120,160",
                    help="nuclei-per-tile densities")
    ap.add_argument("--budget", type=int, default=768)
    ap.add_argument("--max-masks", type=int, default=192,
                    help="unpacked per-image mask capacity (sized above the "
                         "densest tile so it is never the binding cap)")
    ap.add_argument("--out", default="OCCUPANCY.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset
    from hd_yolo_tpu.engines import val as val_engine
    from hd_yolo_tpu.engines.checkpoint import load_inference
    from hd_yolo_tpu.models import Model
    from tools.flagship_train_check import _write_split

    ev = load_inference(str(Path(args.run) / "final"))
    mk = lambda **kw: Model.from_cfg(
        "yolov5l6-mask", "hyp-nuclei", dtype=jnp.bfloat16,
        max_masks=args.max_masks, pre_nms_topk=1024, mask_window=16, **kw)
    m_ref = mk()
    m_pack = mk(mask_budget=args.budget)
    task = m_ref.spec.headers[0].tag
    f_ref = jax.jit(lambda v, x: m_ref.apply(
        v, x, train=False, compute_masks=True)[1])
    f_pack = jax.jit(lambda v, x: m_pack.apply(
        v, x, train=False, compute_masks=True)[1])
    meta_info = {task: {"labels_text": {1: "tumor", 2: "stromal",
                                        3: "sTILs", 4: "other"}}}

    tmp = Path(tempfile.mkdtemp(prefix="occ_sweep_"))
    sweep_rows = []
    for nuclei in [int(s) for s in args.sweep.split(",")]:
        rng = np.random.default_rng(1000 + nuclei)
        dsdir = tmp / f"n{nuclei}"
        dsdir.mkdir()
        csv = _write_split(dsdir, f"n{nuclei}_", args.tiles, args.img_size,
                           nuclei, rng, task)
        vds = DetectionDataset(str(csv), {"img_size": args.img_size},
                               train=False, max_targets=max(2 * nuclei, 64))
        vdl = lambda: DataLoader(vds, args.batch, workers=2, shuffle=False,
                                 drop_last=False)

        # occupancy accounting on the unpacked outputs
        counts, drops, mask_diff = [], 0, 0.0
        for b in vdl():
            x = b["image"]
            r = f_ref(ev, jnp.asarray(x))[task]
            p = f_pack(ev, jnp.asarray(x))[task]
            mv_r = np.asarray(r["mask_valid"])
            mv_p = np.asarray(p["mask_valid"])
            counts.append(int(mv_r.sum()))
            drops += int((mv_r & ~mv_p).sum())
            both = mv_r & mv_p
            if both.any():
                mask_diff = max(mask_diff, float(np.abs(
                    np.asarray(r["masks"])[both]
                    - np.asarray(p["masks"])[both]).max()))

        # mask-AP both ways on the same tiles + GT
        ap_cfg = {}
        for name, model in (("unpacked", m_ref), ("packed", m_pack)):
            fit, stats, _ = val_engine.run(
                model, ev, ((b["image"], b["targets"]) for b in vdl()),
                meta_info=meta_info, compute_masks=True,
                iou_type="masks", verbose=False)
            ap_cfg[name] = {k: round(float(stats[task][k]), 4)
                            for k in ("map50", "map", "fitness")}
        row = {
            "nuclei_per_tile": nuclei,
            "eligible_per_batch": counts,
            "eligible_max": max(counts),
            "dropped_total": drops,
            "drop_rate": round(drops / max(sum(counts), 1), 4),
            "mask_map50_unpacked": ap_cfg["unpacked"]["map50"],
            "mask_map50_packed": ap_cfg["packed"]["map50"],
            "mask_map_unpacked": ap_cfg["unpacked"]["map"],
            "mask_map_packed": ap_cfg["packed"]["map"],
            "max_abs_mask_diff_kept": mask_diff,
        }
        sweep_rows.append(row)
        print(json.dumps(row), flush=True)

    worst = max(r["eligible_max"] for r in sweep_rows)
    exact_upto = max((r["nuclei_per_tile"] for r in sweep_rows
                      if r["dropped_total"] == 0), default=0)
    out = {
        "batch": args.batch,
        "tiles_per_density": args.tiles,
        "budget": args.budget,
        "max_masks_unpacked": args.max_masks,
        "sweep": sweep_rows,
        "envelope": {
            "exact_up_to_nuclei_per_tile": exact_upto,
            "worst_eligible": worst,
            # round the suggestion up to the MXU-friendly 128 multiple
            "suggested_budget_for_worst": int(-(-int(worst * 1.1) // 128) * 128),
            "note": "packed == unpacked bit-for-bit while eligible <= budget; "
                    "over budget the LOWEST-scored detections lose masks and "
                    "the quality cost is the packed-vs-unpacked mask-AP gap "
                    "in this sweep",
        },
        "weights": str(Path(args.run) / "final"),
    }
    print(json.dumps(out["envelope"], indent=2), flush=True)
    Path(args.out).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
