#!/usr/bin/env python3
"""Training watchdog: relaunch interrupted runs from their last checkpoint.

Behavioral reference: ``/root/reference/metayolo/engines/aws/resume.py:18-41``
(scan for last.pt checkpoints with live optimizer state and re-spawn the
distributed trainer).  Here: scan save dirs for an orbax ``last`` checkpoint
whose meta says training didn't finish, and re-exec the train CLI with
``--resume``; loop with a backoff so crashed runs restart automatically.

Usage:
  python tools/watchdog.py --runs runs/train --data data.yaml --cfg yolov5l6-mask \
      --epochs 100 [--once]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def find_resumable(runs_root: str, target_epochs: int):
    out = []
    if not os.path.isdir(runs_root):
        return out
    for name in sorted(os.listdir(runs_root)):
        d = os.path.join(runs_root, name)
        meta_path = os.path.join(d, "last", "meta.json")
        if not os.path.isfile(meta_path):
            continue
        with open(meta_path) as f:
            meta = json.load(f)
        if int(meta.get("epoch", -1)) + 1 < target_epochs:
            out.append((d, meta))
    return out


def main(argv=None):
    p = argparse.ArgumentParser("hd_yolo_tpu watchdog")
    p.add_argument("--runs", default="runs/train")
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--interval", type=int, default=60)
    p.add_argument("--once", action="store_true")
    p.add_argument("--max-restarts", type=int, default=20)
    opt, train_args = p.parse_known_args(argv)

    restarts = 0
    while True:
        for save_dir, meta in find_resumable(opt.runs, opt.epochs):
            if restarts >= opt.max_restarts:
                print("watchdog: restart budget exhausted", file=sys.stderr)
                return 1
            restarts += 1
            cmd = [
                sys.executable, "-m", "hd_yolo_tpu.engines.train",
                "--resume", "--save-dir", save_dir,
                "--epochs", str(opt.epochs), *train_args,
            ]
            print(f"watchdog: resuming {save_dir} (epoch {meta.get('epoch')}) → {' '.join(cmd)}")
            rc = subprocess.call(cmd)
            print(f"watchdog: trainer exited rc={rc}")
        if opt.once:
            return 0
        time.sleep(opt.interval)


if __name__ == "__main__":
    raise SystemExit(main())
