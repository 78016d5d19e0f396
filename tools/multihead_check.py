#!/usr/bin/env python3
"""Dual-header flagship check (VERDICT r4 #5): CLI-train
``yolov5l6-multihead`` — the reference's shipped two-task config
(``/root/reference/metayolo/hub/yolov5l6-multihead.yaml:55-58``: ``det``
nc=7 + ``detSC`` nc=4, per-task header replication ``yolo.py:62-76``) — on
generated NuCLS tiles on the real chip, record PER-TASK val quality, export
ONE AOT artifact carrying both tasks, and smoke REST rows for both.

    python -u tools/multihead_check.py --epochs 120 --out-dir /tmp/multihead_r5
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_dataset(root: Path, n_train: int, n_val: int, img_size: int,
                  nuclei: int) -> str:
    """Same tiles served to BOTH tasks: each image gets a det row (nc=7
    header; classes 1..4 occupy the first slots) and a detSC row (nc=4)."""
    import yaml

    from tools.flagship_train_check import _write_split

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    train_csv = _write_split(root, "tile", n_train, img_size, nuclei, rng,
                             "det")
    val_rng = np.random.default_rng(10_000)
    val_csv = _write_split(root, "val", n_val, img_size, nuclei, val_rng,
                           "det")
    # duplicate every annotation row for the second task (same npz)
    for csv in (train_csv, val_csv):
        lines = Path(csv).read_text().strip().splitlines()
        out = [lines[0]]
        for ln in lines[1:]:
            parts = ln.split(",")
            out.append(ln)
            sc = parts.copy()
            sc[2] = parts[2] + "_sc"   # unique ann_id
            sc[4] = "detSC"
            out.append(",".join(sc))
        Path(csv).write_text("\n".join(out) + "\n")
    labels4 = {1: "tumor", 2: "stromal", 3: "sTILs", 4: "other"}
    labels7 = {**labels4, 5: "necrosis", 6: "vessel", 7: "misc"}
    meta = {"det": {"labels_text": labels7}, "detSC": {"labels_text": labels4}}
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump(
        {"train": str(train_csv), "val": str(val_csv),
         "tasks": ["det", "detSC"], "meta_info": meta}))
    return str(data_yaml)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n-train", type=int, default=48)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--nuclei", type=int, default=40)
    ap.add_argument("--val-interval", type=int, default=30)
    ap.add_argument("--out-dir", default="/tmp/multihead_r5")
    ap.add_argument("--out", default="MULTIHEAD_QUALITY.json")
    args = ap.parse_args(argv)

    root = Path(args.out_dir)
    data = build_dataset(root / "data", args.n_train, args.n_val,
                         args.img_size, args.nuclei)
    print(f"dataset: {data}", flush=True)

    from hd_yolo_tpu.engines.train import argument_parser, train

    opt = argument_parser().parse_args([
        "--data", data, "--cfg", "yolov5l6-multihead", "--hyp", "hyp-nuclei",
        "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
        "--img-size", str(args.img_size), "--masks",
        "--workers", "8", "--max-targets", "64", "--mask-rois", "32",
        "--max-masks", "64", "--k-mosaic", "1", "--patience", "10000",
        "--cache-images", "--device-augment",
        "--val-interval", str(args.val_interval),
        "--save-interval", str(args.val_interval),
        "--nominal-batch-size", str(args.batch_size),
        "--save-dir", str(root / "run"),
    ])
    t0 = time.time()
    train(opt)
    wall = time.time() - t0

    # ---- per-task held-out val (boxes + masks)
    import jax

    from hd_yolo_tpu.config import load_cfg, load_dataset_info
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset
    from hd_yolo_tpu.engines import val as val_engine
    from hd_yolo_tpu.engines.checkpoint import load_inference
    from hd_yolo_tpu.models import Model

    info = load_dataset_info(data)
    model = Model.from_cfg("yolov5l6-multihead", load_cfg("hyp-nuclei"),
                           max_masks=64, mask_rois=32)
    ev = load_inference(str(root / "run" / "final"))
    vds = DetectionDataset(info["val"], {"img_size": args.img_size},
                           train=False, max_targets=64)
    vdl = lambda: DataLoader(vds, args.batch_size, workers=4, shuffle=False,
                             drop_last=False)
    res = {"config": {"cfg": "yolov5l6-multihead",
                      "epochs": args.epochs, "n_train": args.n_train,
                      "n_val": args.n_val, "img": args.img_size},
           "train_wall_s": round(wall, 1), "tasks": {}}
    for iou_type in ("boxes", "masks"):
        fit, stats, _ = val_engine.run(
            model, ev, ((b["image"], b["targets"]) for b in vdl()),
            meta_info=info.get("meta_info", {}), compute_masks=True,
            iou_type=iou_type, verbose=False)
        for task, s in stats.items():
            res["tasks"].setdefault(task, {})[iou_type] = {
                k: round(float(v), 4)
                for k, v in s.items() if np.isscalar(v)}
    print(json.dumps(res), flush=True)
    Path(args.out).write_text(json.dumps(res, indent=2))

    # ---- deploy smoke: ONE AOT with both tasks + REST rows per task
    import subprocess

    smoke = subprocess.run(
        [sys.executable, "-u", "tools/deploy_smoke.py",
         "--cfg", "yolov5l6-multihead",
         "--weights", str(root / "run" / "final"),
         "--tasks", "det,detSC", "--out", "DEPLOY_SMOKE_MULTIHEAD.json"],
        cwd=str(Path(__file__).resolve().parent.parent), timeout=3600)
    print("deploy smoke rc:", smoke.returncode, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
