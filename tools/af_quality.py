#!/usr/bin/env python3
"""AFDetect (yolov6/SimOTA) quality run through the real CLI (VERDICT r3 #6):
train `yolov6s-af.yaml` on generated NuCLS-format tiles, record held-out val
mAP.  Reference anchor: the yolov6 anchor-free experimental head family
(loss_yolov6.py:126-520).

    python tools/af_quality.py --epochs 150
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
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--val-images", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--out", default="AF_QUALITY.json")
    ap.add_argument("--dir", default="")
    args = ap.parse_args()

    from tools.flagship_train_check import make_nucls_dataset

    root = Path(args.dir or tempfile.mkdtemp(prefix="af_quality_"))
    data = make_nucls_dataset(root / "data", n_images=args.images,
                              img_size=args.img_size, n_val=args.val_images,
                              task_id="det")

    from hd_yolo_tpu.engines.train import argument_parser, train

    opt = argument_parser().parse_args([
        "--data", data, "--cfg", "yolov6s-af", "--hyp", "hyp-nuclei",
        "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
        "--img-size", str(args.img_size), "--workers", "8",
        "--max-targets", "64", "--k-mosaic", "1", "--patience", "1000000",
        "--cache-images", "--val-interval", "25",
        "--save-interval", str(args.epochs),
        "--nominal-batch-size", str(args.batch_size),
        "--save-dir", str(root / "run"),
    ])
    import time

    t0 = time.time()
    result = train(opt)
    wall = time.time() - t0

    row = {
        "cfg": "yolov6s-af (AFDetect decoupled head + SimOTA)",
        "epochs": args.epochs, "n_train": args.images,
        "n_val": args.val_images, "img_size": args.img_size,
        "wall_s": round(wall, 1),
        **{k: round(float(v), 4) for k, v in result.items()
           if isinstance(v, (int, float))},
    }
    print(json.dumps(row, indent=2), flush=True)
    Path(args.out).write_text(json.dumps(row, indent=2))


if __name__ == "__main__":
    main()
