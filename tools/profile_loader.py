#!/usr/bin/env python3
"""Input-pipeline throughput: can the host loader keep a v5e fed?

Target: >151 img/s (the measured flagship train step rate at 640px, batch 8).
Generates a NuCLS-format dataset and measures DataLoader images/s with the
full train-time augmentation pipeline (mosaic, projective warp, HSV, masks).
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=32)
    p.add_argument("--batches", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--cache", action="store_true", help="RAM-cache decoded images")
    p.add_argument("--raw", action="store_true",
                   help="device-augment feed (host_augment=False): no host "
                        "mosaic/warp/HSV, cacheable deterministic samples")
    opt = p.parse_args(argv)

    from tools.flagship_train_check import make_nucls_dataset
    from hd_yolo_tpu.config import load_cfg, load_dataset_info
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset

    root = Path(tempfile.mkdtemp(prefix="loader_prof_"))
    data = make_nucls_dataset(root, n_images=opt.images, img_size=opt.img_size)
    info = load_dataset_info(data)
    hyp = load_cfg("hyp-nuclei")
    ds = DetectionDataset(
        info["train"],
        {**hyp, "img_size": opt.img_size, "patch_size": opt.img_size, "k_mosaic": 2},
        train=True, max_targets=64, cache_images=opt.cache,
        host_augment=not opt.raw,
    )
    dl = DataLoader(ds, opt.batch_size, workers=opt.workers, infinite=True)
    it = iter(dl)
    for _ in range(4):   # warm caches / fill prefetch
        next(it)
    t0 = time.time()
    for _ in range(opt.batches):
        next(it)
    dt = time.time() - t0
    ips = opt.batches * opt.batch_size / dt
    mode = "raw (device-augment feed)" if opt.raw else "640px mosaic+masks"
    print(f"loader: {ips:.1f} img/s  ({opt.workers} workers, cache={opt.cache}, {mode})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
