#!/usr/bin/env python3
"""Measured END-TO-END CLI train throughput (VERDICT r2 item 3).

Runs the REAL ``hd_yolo_tpu.engines.train`` driver twice on the same
generated NuCLS-format dataset on the real chip:

  1. ``--bench-loop``: the engine loop with the data pipeline excluded
     (one device-resident batch reused) — the compute ceiling of the loop
     (step dispatch + EMA + metrics sync), matching what
     tools/profile_train.py measures inside one jit.
  2. the streaming loop: loader → host collate → H2D shard → step, with
     ``--cache-images --device-augment``.  On the tunneled chip this is
     transfer-bound: H2D moves ~16 MB/s effective, so a 23 MB batch costs
     ~1.3 s no matter how fast the step is.
  3. ``--cache-device``: the device-resident dataset (one upfront upload,
     on-device gather per step) — the production fast path.

Steady state = median per-epoch img/s over the last half of the epochs
(compile + cache warmup land in the first epoch).  Prints one JSON line
and appends to BENCH_TRAIN_E2E.json.

    python tools/profile_train_e2e.py [--images 128] [--batch-size 16]
        [--epochs 8]
"""
import argparse
import json
import logging
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _RateGrabber(logging.Handler):
    """Collects the per-epoch 'NNN.N img/s' figures the train loop logs."""

    def __init__(self):
        super().__init__()
        self.rates = []

    def emit(self, record):
        m = re.search(r"([0-9.]+) img/s", record.getMessage())
        if m:
            self.rates.append(float(m.group(1)))


def run_once(data, save_dir, opt0, bench_loop, cache_device=False):
    from hd_yolo_tpu import LOGGER
    from hd_yolo_tpu.engines.train import argument_parser, train

    grab = _RateGrabber()
    LOGGER.addHandler(grab)
    args = [
        "--data", data, "--cfg", "yolov5l6-mask", "--hyp", "hyp-nuclei",
        "--epochs", str(opt0.epochs), "--batch-size", str(opt0.batch_size),
        "--img-size", str(opt0.img_size), "--masks",
        "--workers", "8", "--max-targets", "64", "--mask-rois", "32",
        "--max-masks", "64", "--k-mosaic", "1", "--patience", "10000",
        "--cache-images", "--device-augment",
        "--val-interval", str(opt0.epochs * 2),   # no val inside the window
        "--save-interval", str(opt0.epochs * 2),
        "--nominal-batch-size", str(opt0.batch_size),
        "--save-dir", save_dir,
    ]
    if bench_loop:
        args.append("--bench-loop")
    if cache_device:
        args.append("--cache-device")
    try:
        train(argument_parser().parse_args(args))
    finally:
        LOGGER.removeHandler(grab)
    rates = grab.rates
    tail = rates[len(rates) // 2:] or rates
    tail = sorted(tail)
    return tail[len(tail) // 2], rates


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--out", default="BENCH_TRAIN_E2E.json")
    opt0 = p.parse_args()

    from tools.flagship_train_check import make_nucls_dataset

    root = Path(tempfile.mkdtemp(prefix="train_e2e_"))
    data = make_nucls_dataset(root / "data", n_images=opt0.images,
                              img_size=opt0.img_size, n_val=8)
    print(f"dataset: {data}", flush=True)

    ceil_rate, ceil_all = run_once(data, str(root / "run_ceiling"), opt0, True)
    print(json.dumps({"engine_loop_ceiling_img_per_s": ceil_rate,
                      "epochs": ceil_all}), flush=True)
    e2e_rate, e2e_all = run_once(data, str(root / "run_e2e"), opt0, False)
    print(json.dumps({"e2e_streaming_img_per_s": e2e_rate, "epochs": e2e_all}),
          flush=True)
    cd_rate, cd_all = run_once(data, str(root / "run_cd"), opt0, False,
                               cache_device=True)
    print(json.dumps({"e2e_cache_device_img_per_s": cd_rate, "epochs": cd_all}),
          flush=True)

    result = {
        "engine_loop_ceiling_img_per_s": ceil_rate,
        "e2e_img_per_s": cd_rate,
        "e2e_over_ceiling": round(cd_rate / ceil_rate, 3) if ceil_rate else None,
        "e2e_streaming_img_per_s": e2e_rate,
        "streaming_note": "tunneled H2D moves ~16 MB/s effective; the "
                          "streaming loop is transfer-bound by design of the "
                          "link, not the framework",
        "config": {"batch": opt0.batch_size, "img": opt0.img_size,
                   "images": opt0.images, "epochs": opt0.epochs,
                   "flags": "--cache-device (e2e) vs --cache-images "
                            "--device-augment (streaming)"},
    }
    Path(opt0.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
