#!/usr/bin/env python3
"""Run the ACTUAL reference training CLI (`/root/reference/train.py::train`)
on CPU over synthetic NuCLS-style tiles — the measured train-throughput
baseline to set beside this repo's e2e CLI number (BENCH_TRAIN_E2E.json).

The reference's own hot loop executes UNMODIFIED (train.py:87-588:
Model/build_network, create_dataloader mosaic+augment pipeline, AMP-free CPU
fwd/bwd, EMA, per-epoch val_nuclei.run, checkpointing) via the refshim
torchvision/torch_scatter stand-ins.  Data is generated in the
metayolo.datasets on-disk schema (csv index + torch-saved annotation dicts
with polygon masks; datasets.py:542-724).

Appends a `train` row to BASELINE_MEASURED.json with steady-state img/s
(first epoch excluded: it pays dataset caching + display dumps).

    python tools/reference_train_baseline.py --n-images 8 --epochs 2
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


def make_metayolo_dataset(root: Path, n_train: int, n_val: int,
                          img_size: int = 640, nuclei_per_tile: int = 40,
                          seed: int = 0):
    """Synthetic tiles in the metayolo.datasets on-disk schema: csv rows
    (image_path,image_id,ann_id,ann_path,task_id,mask_mode) + torch-saved
    annotation dicts {'roi','size','boxes','labels','masks'} with polygon
    masks (datasets.py:562-622 load paths; 'polygons' mode sidesteps the
    upstream Mask.__bool__ bug that breaks binary-'mask' mode training)."""
    import cv2
    import pandas as pd
    import torch

    rng = np.random.default_rng(seed)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "anns").mkdir(parents=True, exist_ok=True)
    splits = {"train": n_train, "val": n_val}
    k = 0
    for split, n in splits.items():
        rows = []
        for i in range(n):
            name = f"{split}_{i:04d}"
            img = np.full((img_size, img_size, 3), 230, np.uint8)
            img += rng.integers(-12, 12, img.shape).astype(np.uint8)
            boxes, labels, masks = [], [], []
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
                boxes.append([float(x1), float(y1), float(x2), float(y2)])
                labels.append(c)
                masks.append([poly.astype(np.float32)])
            cv2.imwrite(str(root / "images" / f"{name}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            ann = {
                "roi": torch.tensor([0, 0, img_size, img_size]),
                "size": torch.tensor([img_size, img_size]),
                "boxes": torch.tensor(boxes, dtype=torch.float32),
                "labels": torch.tensor(labels, dtype=torch.int64),
                "masks": masks,
            }
            torch.save(ann, root / "anns" / f"{name}.pt")
            rows.append({
                "image_path": f"images/{name}.png",
                "image_id": name,
                "ann_id": f"ann_{k}",
                "ann_path": f"anns/{name}.pt",
                "task_id": "det",
                "mask_mode": "polygons",
            })
            k += 1
        pd.DataFrame(rows).to_csv(root / f"{split}.csv", index=False)

    import yaml

    meta = {"det": {
        "labels_text": {i: g for i, g in GROUPS.items()},
        "labels_color": {i: c for i, c in
                         zip(GROUPS, ([0, 255, 0], [255, 0, 0],
                                      [0, 0, 255], [255, 255, 0]))},
    }}
    with open(root / "meta.yaml", "w") as f:
        yaml.safe_dump(meta, f)
    with open(root / "data.yaml", "w") as f:
        yaml.safe_dump({"train": str(root / "train.csv"),
                        "val": str(root / "val.csv"),
                        "tasks": ["det"],
                        "meta_info": str(root / "meta.yaml")}, f)
    return root / "data.yaml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=8)
    ap.add_argument("--n-val", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="/root/reference/metayolo/hub/yolov5l6-mask.yaml")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="BASELINE_MEASURED.json")
    ap.add_argument("--keep-dir", default="")
    args = ap.parse_args()

    from hd_yolo_tpu.utils.reference_oracle import enable_reference

    assert enable_reference(), "reference checkout not available"
    import torch

    import train as ref_train  # /root/reference/train.py
    from metayolo.engines.callbacks import Callbacks

    work = Path(args.keep_dir) if args.keep_dir else Path(
        tempfile.mkdtemp(prefix="reftrain_"))
    work.mkdir(parents=True, exist_ok=True)
    data_yaml = make_metayolo_dataset(work / "data", args.n_images, args.n_val,
                                      img_size=args.imgsz, seed=args.seed)

    # the hub yaml tags its header 'detSC'; our data uses 'det' like the
    # deployed checkpoints (same rename evaluation.py:42 applies)
    import yaml as _yaml

    with open(args.cfg, encoding="ascii", errors="ignore") as f:
        cfg_dict = _yaml.safe_load(f)
    for row in cfg_dict["headers"]:
        if len(row) > 4 and row[4] == "detSC":
            row[4] = "det"
    # the hub yamls carry pythonic literals (`None`, numbers-as-strings) that
    # upstream ran through ultralytics' per-arg eval; normalize them so the
    # re-dumped yaml round-trips (same fix as utils/reference_oracle.py)
    import ast

    for section in ("backbone", "fpn", "headers"):
        for row in cfg_dict.get(section, []):
            for j, a in enumerate(row[3]):
                if isinstance(a, str) and a not in cfg_dict:
                    try:
                        row[3][j] = ast.literal_eval(a)
                    except (ValueError, SyntaxError):
                        pass
    cfg_path = work / "model.yaml"
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(cfg_dict, f)

    opt = argparse.Namespace(
        data=str(data_yaml), cfg=str(cfg_path),
        hyp=str(Path(__file__).resolve().parent.parent /
                "hd_yolo_tpu/configs/hyp-nuclei.yaml"),
        weights="", epochs=args.epochs, batch_size=args.batch_size,
        imgsz=args.imgsz, patch_size=args.imgsz, keep_res=-1,
        masks=True, rect=False, resume=False, restart=False, nosave=False,
        noval=False, noautoanchor=True, evolve=False, bucket="",
        image_weights=False, device="cpu", multi_scale=False,
        single_cls=False, optimizer="SGD", sync_bn=False, workers=0,
        project=str(work / "runs"), name="exp", exist_ok=True, quad=False,
        cos_lr=False, label_smoothing=0.0, patience=100, freeze=[],
        save_period=-1, local_rank=-1, verbose=False, wandb=False,
        save_dir=str(work / "runs" / "exp"),
    )

    # steady-state timing via the reference's own callback hooks
    marks = {"epoch_starts": [], "epoch_ends": [], "batches": 0}
    cb = Callbacks()
    cb.register_action("on_train_epoch_start",
                       callback=lambda *a, **k: marks["epoch_starts"].append(time.time()))
    cb.register_action("on_fit_epoch_end",
                       callback=lambda *a, **k: marks["epoch_ends"].append(time.time()))

    t0 = time.time()
    ref_train.train(opt.hyp, opt, torch.device("cpu"), cb)
    wall = time.time() - t0

    # epoch 1+ steady state: epoch_start[i] → epoch_start[i+1] includes the
    # val pass, exactly like the reference experiences it; also report the
    # train-loop-only rate from start→fit_end minus val via last epoch
    n_epochs = len(marks["epoch_starts"])
    per_epoch = [marks["epoch_starts"][i + 1] - marks["epoch_starts"][i]
                 for i in range(n_epochs - 1)]
    steady = (np.mean(per_epoch[1:]) if len(per_epoch) > 1 else
              (per_epoch[0] if per_epoch else wall / max(args.epochs, 1)))
    imgs_per_s = args.n_images / steady if steady > 0 else float("nan")

    summary = {
        "source": "/root/reference/train.py::train (unmodified, CPU, "
                  "torchvision/torch_scatter via refshim; polygon-mask data "
                  "in the metayolo.datasets schema)",
        "model": "yolov5l6-mask (reference hub yaml), nc=4, masks=True",
        "n_train": args.n_images, "n_val": args.n_val,
        "epochs": args.epochs, "batch_size": args.batch_size,
        "imgsz": args.imgsz,
        "steady_epoch_s": float(steady),
        "images_per_s": float(imgs_per_s),
        "wall_s": wall,
    }
    print(json.dumps(summary, indent=2))

    out_path = Path(args.out)
    existing = json.loads(out_path.read_text()) if out_path.exists() else {}
    existing["train"] = summary
    out_path.write_text(json.dumps(existing, indent=2))
    print(f"wrote {out_path} [train]")


if __name__ == "__main__":
    main()
