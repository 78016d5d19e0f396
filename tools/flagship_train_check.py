#!/usr/bin/env python3
"""Flagship quality check: train the FULL yolov5l6-mask through the real CLI
(`engines.train.train`) on a generated NuCLS-format dataset and report final
box + mask fitness (VERDICT r1 #6b).

The dataset generator emits the same on-disk schema as the NuCLS converters
(index csv → per-image npz with polygon masks): H&E-looking 640px tiles with
elliptical nuclei in 4 core classes, distinguishable by color/size so the
model can actually learn them.

Run (real TPU):  python tools/flagship_train_check.py --epochs 60
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLASS_COLORS = {  # class → mean BGR-ish stain color
    1: (120, 60, 160),   # tumor: large purple
    2: (160, 120, 190),  # stromal: elongated light
    3: (90, 40, 110),    # sTILs: small dark
    4: (140, 100, 150),  # other
}
CLASS_AXES = {1: (22, 18), 2: (26, 10), 3: (10, 9), 4: (16, 14)}


def render_tile(rng, img_size: int, nuclei_per_tile: int, class_probs=None,
                axes_scale: float = 1.0):
    """One synthetic H&E tile: (img uint8 RGB, boxes, labels, polys).

    ``class_probs`` optionally biases the per-nucleus class draw (length-4,
    classes 1..4) — used by the hnet check to make its tile-level label
    learnable; None keeps the historical uniform draw.  ``axes_scale``
    scales the nucleus ellipse axes (the train-off uses larger nuclei so a
    CPU-feasible budget converges on both stacks)."""
    import cv2

    img = np.full((img_size, img_size, 3), 230, np.uint8)
    img += rng.integers(-12, 12, img.shape).astype(np.uint8)
    boxes, labels, polys = [], [], []
    for _ in range(nuclei_per_tile):
        c = (int(rng.choice(4, p=class_probs)) + 1 if class_probs is not None
             else int(rng.integers(1, 5)))
        ax, ay = CLASS_AXES[c]
        ax = max(int(ax * axes_scale * rng.uniform(0.8, 1.25)), 4)
        ay = max(int(ay * axes_scale * rng.uniform(0.8, 1.25)), 4)
        cx = int(rng.integers(ax + 2, img_size - ax - 2))
        cy = int(rng.integers(ay + 2, img_size - ay - 2))
        ang = int(rng.integers(0, 180))
        poly = cv2.ellipse2Poly((cx, cy), (ax, ay), ang, 0, 360, 12)
        col = tuple(int(v + rng.integers(-15, 15)) for v in CLASS_COLORS[c])
        cv2.fillPoly(img, [poly], col)
        x1, y1 = poly.min(0)
        x2, y2 = poly.max(0)
        boxes.append([x1, y1, x2, y2])
        labels.append(c)
        polys.append(poly)
    return img, boxes, labels, polys


GROUP_NAMES = {1: "tumor", 2: "stromal", 3: "sTILs", 4: "other"}


def _write_split(root: Path, prefix: str, n_images: int, img_size: int,
                 nuclei_per_tile: int, rng, task_id: str,
                 raw_dir: Path = None) -> Path:
    """Write one split in the native index format; optionally mirror it in
    the RAW NuCLS schema (rgb/csv/FOV meta) so the reference's own
    utils_nucls.TorchDataset can read the SAME tiles."""
    import cv2

    rows, meta_rows = [], []
    if raw_dir is not None:
        (raw_dir / "rgb").mkdir(parents=True, exist_ok=True)
        (raw_dir / "csv").mkdir(parents=True, exist_ok=True)
    for i in range(n_images):
        img, boxes, labels, polys = render_tile(rng, img_size, nuclei_per_tile)
        name = f"{prefix}{i}"
        cv2.imwrite(str(root / f"{name}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        parr = np.empty(len(polys), object)
        for j, pl in enumerate(polys):
            parr[j] = [pl.astype(np.float64)]
        np.savez(root / f"{name}.npz",
                 boxes=np.asarray(boxes, np.float32),
                 labels=np.asarray(labels, np.int64),
                 masks=parr, size=np.array([img_size, img_size]))
        rows.append(f"{name}.png,{prefix}_t{i},{prefix}_a{i},{name}.npz,{task_id},poly")
        if raw_dir is not None:
            import pandas as pd

            fov = f"SYN-{prefix}_fov{i:04d}"
            cv2.imwrite(str(raw_dir / "rgb" / f"{fov}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            pd.DataFrame([{
                "group": GROUP_NAMES[c], "type": "polyline",
                "xmin": int(b[0]), "ymin": int(b[1]),
                "xmax": int(b[2]), "ymax": int(b[3]),
                "coords_x": ",".join(str(float(v)) for v in pl[:, 0]),
                "coords_y": ",".join(str(float(v)) for v in pl[:, 1]),
            } for b, c, pl in zip(boxes, labels, polys)]).to_csv(
                raw_dir / "csv" / f"{fov}.csv")
            meta_rows.append({"fovname": fov, "xmin": 0, "ymin": 0,
                              "xmax": img_size, "ymax": img_size})
    if raw_dir is not None:
        import pandas as pd

        pd.DataFrame(meta_rows).to_csv(raw_dir / "csv" / "ALL_FOV_LOCATIONS.csv")
    csv_path = root / f"index_{prefix}.csv"
    csv_path.write_text(
        "image_path,image_id,ann_id,ann_path,task_id,mask_mode\n"
        + "\n".join(rows) + "\n"
    )
    return csv_path


def make_nucls_dataset(root: Path, n_images: int = 32, img_size: int = 640,
                       nuclei_per_tile: int = 40, seed: int = 0,
                       task_id: str = "detSC", n_val: int = 0) -> str:
    """Disjoint train/val synthetic NuCLS set (VERDICT r2 item 6).

    ``n_val=0`` keeps the legacy train==val behavior for overfit checks;
    otherwise the val tiles come from an independent RNG stream and are also
    mirrored under ``root/raw_val`` in the RAW NuCLS schema for the
    reference-code evaluation path (tools/reference_baseline.py)."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    train_csv = _write_split(root, "tile", n_images, img_size,
                             nuclei_per_tile, rng, task_id)
    if n_val > 0:
        val_rng = np.random.default_rng(seed + 10_000)
        val_csv = _write_split(root, "val", n_val, img_size, nuclei_per_tile,
                               val_rng, task_id, raw_dir=root / "raw_val")
    else:
        val_csv = train_csv
    import yaml

    meta = {task_id: {"labels_text": {1: "tumor", 2: "stromal", 3: "sTILs", 4: "other"}}}
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump(
        {"train": str(train_csv), "val": str(val_csv), "tasks": [task_id],
         "meta_info": meta}
    ))
    return str(data_yaml)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--val-interval", type=int, default=10)
    p.add_argument("--images", type=int, default=32)
    p.add_argument("--val-images", type=int, default=16,
                   help="DISJOINT val tiles (0 = legacy train==val overfit check)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--out", default=None, help="dataset/run dir (default: tmp)")
    p.add_argument("--device-augment", action="store_true",
                   help="fuse the augmentation recipe into the jitted step "
                        "(frees the 1-core host; loader serves cached tiles)")
    p.add_argument("--val-interval-override", type=int, default=None)
    p.add_argument("--weights", default=None,
                   help="warm-start weights (final_vars.pkl or torch .pt)")
    opt0 = p.parse_args(argv)

    root = Path(opt0.out or tempfile.mkdtemp(prefix="nucls_synth_"))
    data = make_nucls_dataset(root / "data", n_images=opt0.images,
                              img_size=opt0.img_size, n_val=opt0.val_images)
    print(f"dataset: {data}", flush=True)

    from hd_yolo_tpu.engines.train import argument_parser, train

    argv_train = [
        "--data", data, "--cfg", "yolov5l6-mask", "--hyp", "hyp-nuclei",
        "--epochs", str(opt0.epochs), "--batch-size", str(opt0.batch_size),
        "--img-size", str(opt0.img_size), "--masks",
        "--workers", "8", "--max-targets", "64", "--mask-rois", "32",
        "--max-masks", "64", "--k-mosaic", "1", "--patience", "10000",
        "--cache-images", "--val-interval",
        str(opt0.val_interval_override or opt0.val_interval),
        "--save-interval", str(opt0.val_interval),
        "--nominal-batch-size", str(opt0.batch_size),  # no accumulation: one
        "--save-dir", str(root / "run"),               # update per step
    ]
    if opt0.device_augment:
        argv_train.append("--device-augment")
    if opt0.weights:
        argv_train += ["--weights", opt0.weights]
    opt = argument_parser().parse_args(argv_train)
    result = train(opt)
    print(json.dumps({"flagship_train": {k: (float(v) if isinstance(v, (int, float)) else v)
                                         for k, v in result.items() if k != "state"}}),
          flush=True)
    lines = (root / "run" / "results.json").read_text().strip().splitlines()
    last = json.loads(lines[-1])
    print("last epoch row:", json.dumps(last), flush=True)

    # final mask-IoU fitness on the saved inference checkpoint
    import jax
    from hd_yolo_tpu.config import load_cfg, load_dataset_info
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset
    from hd_yolo_tpu.engines import val as val_engine
    from hd_yolo_tpu.engines.checkpoint import load_inference
    from hd_yolo_tpu.models import Model

    info = load_dataset_info(data)
    hyp = load_cfg("hyp-nuclei")
    model = Model.from_cfg("yolov5l6-mask", hyp, max_masks=64, mask_rois=32)
    ev = load_inference(str(root / "run" / "final"))
    import pickle

    with open(root / "run" / "final_vars.pkl", "wb") as f:
        # portable single-file weights for utils/export_torch (reference-path
        # quality eval) and --weights restarts
        pickle.dump({k: jax.tree.map(np.asarray, v) for k, v in ev.items()}, f)
    vds = DetectionDataset(info["val"], {"img_size": opt0.img_size},
                           train=False, max_targets=64)
    vdl = DataLoader(vds, opt0.batch_size, workers=4, shuffle=False, drop_last=False)
    fit_m, stats_m, _ = val_engine.run(
        model, ev, ((b["image"], b["targets"]) for b in vdl),
        meta_info=info.get("meta_info", {}), compute_masks=True,
        iou_type="masks", verbose=False,
    )
    print(json.dumps({"mask_fitness": fit_m,
                      "mask_stats": {t: s for t, s in stats_m.items()}}), flush=True)

    wsi_eval(str(root / "run"), img_size=opt0.img_size)
    return 0



def wsi_eval(run_dir: str, img_size: int = 640, slide_px: int = 2560,
             nuclei: int = 300, seed: int = 7):
    """Product-loop check: build a synthetic H&E slide with the same nucleus
    renderer, run tiled slide_inference with the trained checkpoint, and
    report stitched detections vs ground truth (greedy IoU-0.5 matching)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.engines.checkpoint import load_inference
    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg
    from hd_yolo_tpu.wsi.tiling import slide_inference

    rng = np.random.default_rng(seed)
    img = np.full((slide_px, slide_px, 3), 230, np.uint8)
    img += rng.integers(-12, 12, img.shape).astype(np.uint8)
    gt_boxes, gt_labels = [], []
    for _ in range(nuclei):
        c = int(rng.integers(1, 5))
        ax, ay = CLASS_AXES[c]
        ax = max(int(ax * rng.uniform(0.8, 1.25)), 4)
        ay = max(int(ay * rng.uniform(0.8, 1.25)), 4)
        cx = int(rng.integers(ax + 2, slide_px - ax - 2))
        cy = int(rng.integers(ay + 2, slide_px - ay - 2))
        poly = cv2.ellipse2Poly((cx, cy), (ax, ay), int(rng.integers(0, 180)), 0, 360, 12)
        cv2.fillPoly(img, [poly], tuple(int(v + rng.integers(-15, 15)) for v in CLASS_COLORS[c]))
        x1, y1 = poly.min(0); x2, y2 = poly.max(0)
        gt_boxes.append([x1, y1, x2, y2]); gt_labels.append(c)
    gt_boxes = np.asarray(gt_boxes, np.float64)

    hyp = load_cfg("hyp-nuclei")
    spec = parse_model_cfg("yolov5l6-mask", hyp)
    tag = spec.headers[0].tag
    model = Model(spec=spec, dtype=jnp.bfloat16, max_masks=64, pre_nms_topk=1024)
    ev = load_inference(str(Path(run_dir) / "final"))
    fwd_j = jax.jit(lambda vv, tiles: model.apply(
        vv, tiles, train=False, compute_masks=True)[1][tag])
    out = slide_inference(lambda tiles: fwd_j(ev, tiles / 255.0),
                          jnp.asarray(img.astype(np.float32)),
                          tile=img_size, overlap=64, batch=8, max_total=4096)
    v = np.asarray(out["valid"])
    pb = np.asarray(out["boxes"])[v]
    pl = np.asarray(out["labels"])[v]
    ps = np.asarray(out["scores"])[v]
    order = np.argsort(-ps)
    matched = np.zeros(len(gt_boxes), bool)
    tp = tp_cls = 0
    for i in order:
        x1 = np.maximum(pb[i, 0], gt_boxes[:, 0]); y1 = np.maximum(pb[i, 1], gt_boxes[:, 1])
        x2 = np.minimum(pb[i, 2], gt_boxes[:, 2]); y2 = np.minimum(pb[i, 3], gt_boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
        ap = (pb[i, 2] - pb[i, 0]) * (pb[i, 3] - pb[i, 1])
        iou = inter / np.maximum(a + ap - inter, 1e-9)
        iou[matched] = 0.0
        j = int(np.argmax(iou))
        if iou[j] >= 0.5:
            matched[j] = True
            tp += 1
            tp_cls += int(pl[i] == gt_labels[j])
    res = {"wsi_slide_px": slide_px, "gt": len(gt_boxes), "pred": int(v.sum()),
           "recall@0.5": round(tp / len(gt_boxes), 4),
           "precision@0.5": round(tp / max(int(v.sum()), 1), 4),
           "label_acc_on_matched": round(tp_cls / max(tp, 1), 4)}
    print(json.dumps({"wsi_eval": res}), flush=True)
    return res

if __name__ == "__main__":
    raise SystemExit(main())
