#!/usr/bin/env python3
"""Measure the ACTUAL reference's performance on CPU — the baseline table
BASELINE.md mandates (VERDICT r2 item 1b).

Runs `/root/reference/evaluation.py::run` UNMODIFIED (via the refshim
torchvision/torch_scatter stand-ins): reference `utils_nucls.TorchDataset`
over a generated raw-NuCLS-format set (rgb/*.png + csv/*.csv + FOV meta),
`build_model` → `torch.jit.script(Deploy(model))` → `inference_on_loader_yolov5`
→ `evaluate_results_new` — exactly the reference's deployed flow
(`evaluation.py:153-245`).

Outputs one JSON with `time_per_image` (the reference's own latency metric,
evaluation.py:97-104) plus mAP/MCC/coverage, and appends a measured row to
BASELINE_MEASURED.json.

    python tools/reference_baseline.py --n-images 16 [--weights flax.pkl]
    python tools/reference_baseline.py --det-only     # compute_masks=False
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("MPLBACKEND", "Agg")

from tools.flagship_train_check import CLASS_AXES, CLASS_COLORS  # noqa: E402

GROUPS = {1: "tumor", 2: "stromal", 3: "sTILs", 4: "other"}
LABELS_TEXT = {i: g for i, g in GROUPS.items()}
# hierarchical decode can emit the unlabeled column as -100 (yolo_head.py
# flatten path); the reference overlay indexes labels_text/labels_color by
# that raw value (image_utils.py:883), so both tables must cover it
LABELS_TEXT[-100] = "unlabeled"
LABELS_COLOR = {1: np.array([0, 1.0, 0]), 2: np.array([1.0, 0, 0]),
                3: np.array([0, 0, 1.0]), 4: np.array([1.0, 1.0, 0]),
                -100: np.array([0.58, 0.58, 0.58])}
VAL_TO_LABEL = {g: i for i, g in GROUPS.items()}


def make_nucls_raw(root: Path, n_images: int, img_size: int = 640,
                   nuclei_per_tile: int = 40, seed: int = 0):
    """Synthetic FOVs in the RAW NuCLS on-disk schema the reference's
    TorchDataset parses (utils_nucls.py:115-160): per-FOV png + csv with
    group/xyxy/polyline coords, plus the FOV-locations meta table."""
    import cv2
    import pandas as pd

    rng = np.random.default_rng(seed)
    (root / "rgb").mkdir(parents=True, exist_ok=True)
    (root / "csv").mkdir(parents=True, exist_ok=True)
    meta_rows = []
    for i in range(n_images):
        fov = f"SYN-{seed:02d}_fov{i:04d}"
        img = np.full((img_size, img_size, 3), 230, np.uint8)
        img += rng.integers(-12, 12, img.shape).astype(np.uint8)
        rows = []
        for _ in range(nuclei_per_tile):
            c = int(rng.integers(1, 5))
            ax, ay = CLASS_AXES[c]
            ax = max(int(ax * rng.uniform(0.8, 1.25)), 4)
            ay = max(int(ay * rng.uniform(0.8, 1.25)), 4)
            cx = int(rng.integers(ax + 2, img_size - ax - 2))
            cy = int(rng.integers(ay + 2, img_size - ay - 2))
            ang = int(rng.integers(0, 180))
            poly = cv2.ellipse2Poly((cx, cy), (ax, ay), ang, 0, 360, 12)
            col = tuple(int(v + rng.integers(-15, 15)) for v in CLASS_COLORS[c])
            cv2.fillPoly(img, [poly], col)
            x1, y1 = poly.min(0)
            x2, y2 = poly.max(0)
            rows.append({
                "group": GROUPS[c], "type": "polyline",
                "xmin": int(x1), "ymin": int(y1), "xmax": int(x2), "ymax": int(y2),
                "coords_x": ",".join(str(float(v)) for v in poly[:, 0]),
                "coords_y": ",".join(str(float(v)) for v in poly[:, 1]),
            })
        cv2.imwrite(str(root / "rgb" / f"{fov}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        pd.DataFrame(rows).to_csv(root / "csv" / f"{fov}.csv")
        meta_rows.append({"fovname": fov, "xmin": 0, "ymin": 0,
                          "xmax": img_size, "ymax": img_size})
    meta = pd.DataFrame(meta_rows)
    meta.to_csv(root / "csv" / "ALL_FOV_LOCATIONS.csv")
    return meta


def build_reference_dataset(root: Path, meta):
    import skimage.io

    from utils_nucls import TorchDataset

    return TorchDataset(
        str(root / "rgb"), str(root / "csv"), meta,
        processor=None,
        labels=[GROUPS[i] for i in sorted(GROUPS)],
        image_reader=skimage.io.imread,
        mean=[0.0, 0.0, 0.0], std=[1.0, 1.0, 1.0],
        val_to_label=VAL_TO_LABEL,
        labels_color=LABELS_COLOR, labels_text=LABELS_TEXT,
        min_area=1e-6, max_area=0.5, min_h=1e-3, min_w=1e-3,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--weights", default="",
                    help="optional flax params pickle or torch state_dict to "
                         "load into the reference model (quality baseline)")
    ap.add_argument("--det-only", action="store_true",
                    help="compute_masks=False (BASELINE config #1 timing)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="BASELINE_MEASURED.json")
    ap.add_argument("--keep-dir", default="",
                    help="reuse/keep the generated dataset + outputs here")
    ap.add_argument("--data-dir", default="",
                    help="existing raw-NuCLS dir (rgb/ + csv/) — e.g. the "
                         "raw_val mirror written by flagship_train_check")
    args = ap.parse_args()

    from hd_yolo_tpu.utils.reference_oracle import (enable_reference,
                                                    load_reference_model)

    assert enable_reference(), "reference checkout not available"
    import torch

    import evaluation as ref_evaluation  # /root/reference/evaluation.py

    work = Path(args.keep_dir) if args.keep_dir else Path(tempfile.mkdtemp(
        prefix="refbase_"))
    work.mkdir(parents=True, exist_ok=True)
    data_dir = Path(args.data_dir) if args.data_dir else work / "data"
    if not (data_dir / "csv" / "ALL_FOV_LOCATIONS.csv").exists():
        meta = make_nucls_raw(data_dir, args.n_images, seed=args.seed)
    else:
        import pandas as pd

        meta = pd.read_csv(data_dir / "csv" / "ALL_FOV_LOCATIONS.csv", index_col=0)
    dataset = build_reference_dataset(data_dir, meta)
    print(f"reference dataset: {len(dataset)} FOVs at {data_dir}")

    # flagship reference model (the reference's own hub yolov5l6-mask yaml);
    # build_model hardcodes the deployed checkpoints' 'det' tag
    # (evaluation.py:42), so rename the hub yaml's 'detSC' row accordingly
    import yaml as _yaml

    with open("/root/reference/metayolo/hub/yolov5l6-mask.yaml",
              encoding="ascii", errors="ignore") as f:
        cfg_dict = _yaml.safe_load(f)
    for row in cfg_dict["headers"]:
        if len(row) > 4 and row[4] == "detSC":
            row[4] = "det"
    model = load_reference_model(cfg=cfg_dict)
    model.float().eval()
    n_params = sum(p.numel() for p in model.parameters())
    if args.weights:
        from hd_yolo_tpu.utils.export_torch import load_any_into_reference

        n_hit = load_any_into_reference(model, args.weights)
        print(f"loaded {n_hit} tensors from {args.weights}")

    ckpt_path = work / "flagship.ckpt.pt"
    torch.save({"model": model}, ckpt_path)

    meta_info = {"det": {"labels_color": LABELS_COLOR,
                         "labels_text": LABELS_TEXT}}
    scripted = True
    if not args.det_only:
        # the scripted mask path executes yolo_head.py:348's
        # ``labels.clamp(min=0.)`` as aten::clamp, which under torch>=2
        # promotes integer labels to float and breaks buffer indexing — the
        # Python-level compat shim can't reach inside TorchScript, so the
        # masked baseline runs the EAGER module (disclosed in the output;
        # compare the det-only rows for the script-vs-eager timing delta)
        import torch.jit as _jit

        _jit.script = lambda m, *a, **k: m
        scripted = False
    t0 = time.time()
    res_summary, stats_summary = ref_evaluation.run(
        dataset, ref_model=model, run_eval=True,
        exp_name="flagship_syn",
        weights={"flagship": str(ckpt_path)},
        output_folder=str(work / "out"),
        export_folder=str(work / "export"),
        device="cpu", half=False, batch_size=args.batch_size,
        compute_masks=not args.det_only,
        meta_info=meta_info,
        core_labels=["tumor", "stromal", "sTILs"],
        label_converter={},
    )
    wall = time.time() - t0

    s = stats_summary["flagship"]
    summary = {
        "source": "/root/reference/evaluation.py::run (unmodified, CPU, "
                  + ("TorchScript Deploy" if scripted else
                     "eager Deploy — scripted mask path needs old-torch "
                     "integer clamp semantics")
                  + "; torchvision/torch_scatter via refshim)",
        "model": "yolov5l6-mask (reference hub yaml), "
                 f"{n_params} params, nc=4",
        "weights": args.weights or "random-init",
        "n_images": len(dataset),
        "compute_masks": not args.det_only,
        "time_per_image_s": float(s["time_per_image"]),
        "images_per_s": 1.0 / float(s["time_per_image"]),
        "coverage": float(s["cm"].get("coverage", float("nan"))),
        "accuracy": float(s["cm"].get("accuracy", float("nan"))),
        "mcc": float(s["cm"].get("mcc", float("nan"))),
        "miou": float(s["cm"].get("miou", float("nan"))),
        "pr_table": {str(k): (float(v) if np.isscalar(v) else str(v))
                     for k, v in s["pr"].items()
                     if isinstance(k, (str, int, tuple))} if isinstance(s["pr"], dict) else str(s["pr"]),
        "wall_s": wall,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "pr_table"},
                     indent=2))

    out_path = Path(args.out)
    existing = json.loads(out_path.read_text()) if out_path.exists() else {}
    key = "det_only" if args.det_only else "masked"
    if args.weights:
        key += "_trained"
    existing[key] = summary
    out_path.write_text(json.dumps(existing, indent=2))
    print(f"wrote {out_path} [{key}]")


if __name__ == "__main__":
    main()
