#!/usr/bin/env python3
"""Same-data same-budget TRAIN-OFF vs the actual reference (VERDICT r3 #1).

Trains BOTH stacks from scratch on the SAME synthetic NuCLS tiles (rendered
once, written in every on-disk schema each side consumes), at the SAME model
scale (yolov5l6-mask scaled to depth 0.33 / width 0.25 — "s6" scale) with the
SAME hyp/epochs/batch/imgsz, then scores BOTH through the reference's own
``evaluate_results_new`` (utils_nucls.py:711-806) AND this repo's val engine:

  ref leg   : /root/reference/train.py::train UNMODIFIED on CPU (refshim)
  tpu leg   : hd_yolo_tpu.engines.train CLI on the real TPU
  eval grid : {ref-trained, tpu-trained} x {reference eval, hd_yolo_tpu val}

Phases (run separately so the slow CPU ref leg can run in the background):

    python tools/train_off.py gen        --dir /tmp/train_off
    python tools/train_off.py ref-train  --dir /tmp/train_off --epochs 80
    python tools/train_off.py ours-train --dir /tmp/train_off --epochs 80
    python tools/train_off.py evaluate   --dir /tmp/train_off

``evaluate`` writes the side-by-side table to TRAINOFF.json and appends the
quality rows to BASELINE_MEASURED.json.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("MPLBACKEND", "Agg")

from tools.flagship_train_check import render_tile  # noqa: E402
from tools.reference_baseline import (GROUPS, LABELS_COLOR, LABELS_TEXT,  # noqa: E402
                                      VAL_TO_LABEL, build_reference_dataset)

SCALE = {"depth_multiple": 0.33, "width_multiple": 0.25}  # yolov5s6 scale


# --------------------------------------------------------------------------
# phase: gen
# --------------------------------------------------------------------------

def _normalize_ref_cfg(cfg_dict):
    """Rename detSC->det (evaluation.py:42 deployed tag) and literal-eval the
    pythonic strings the hub yamls carry (same fix as utils/reference_oracle)."""
    import ast

    for row in cfg_dict["headers"]:
        if len(row) > 4 and row[4] == "detSC":
            row[4] = "det"
    for section in ("backbone", "fpn", "headers"):
        for row in cfg_dict.get(section, []):
            for j, a in enumerate(row[3]):
                if isinstance(a, str) and a not in cfg_dict:
                    try:
                        row[3][j] = ast.literal_eval(a)
                    except (ValueError, SyntaxError):
                        pass
    return cfg_dict


def gen(args):
    """Render each tile ONCE; write the three on-disk schemas from the same
    pixel/annotation arrays: ours (index csv + npz), metayolo (csv + .pt anns,
    datasets.py:562-622), raw NuCLS val mirror (rgb/ + csv/, utils_nucls.py
    :115-160)."""
    import cv2
    import pandas as pd
    import torch
    import yaml

    root = Path(args.dir)
    ours = root / "ours"
    meta_d = root / "metayolo"
    raw_val = root / "raw_val"
    for d in (ours, meta_d / "images", meta_d / "anns",
              raw_val / "rgb", raw_val / "csv"):
        d.mkdir(parents=True, exist_ok=True)

    splits = {"train": (args.n_train, np.random.default_rng(args.seed)),
              "val": (args.n_val, np.random.default_rng(args.seed + 10_000))}
    meta_rows = []
    for split, (n, rng) in splits.items():
        ours_rows, meta_csv_rows = [], []
        for i in range(n):
            img, boxes, labels, polys = render_tile(
                rng, args.imgsz, args.nuclei, axes_scale=args.nucleus_scale)
            name = f"{split}_{i:04d}"
            bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)

            # ours: png + npz polygons
            cv2.imwrite(str(ours / f"{name}.png"), bgr)
            parr = np.empty(len(polys), object)
            for j, pl in enumerate(polys):
                parr[j] = [pl.astype(np.float64)]
            np.savez(ours / f"{name}.npz",
                     boxes=np.asarray(boxes, np.float32),
                     labels=np.asarray(labels, np.int64),
                     masks=parr, size=np.array([args.imgsz, args.imgsz]))
            ours_rows.append(
                f"{name}.png,{name},{name}_a,{name}.npz,det,poly")

            # metayolo: png + torch-saved ann dict with polygon masks
            cv2.imwrite(str(meta_d / "images" / f"{name}.png"), bgr)
            ann = {
                "roi": torch.tensor([0, 0, args.imgsz, args.imgsz]),
                "size": torch.tensor([args.imgsz, args.imgsz]),
                "boxes": torch.tensor(np.asarray(boxes, np.float32)),
                "labels": torch.tensor(np.asarray(labels, np.int64)),
                "masks": [[pl.astype(np.float32)] for pl in polys],
            }
            torch.save(ann, meta_d / "anns" / f"{name}.pt")
            meta_csv_rows.append({
                "image_path": f"images/{name}.png", "image_id": name,
                "ann_id": f"{name}_a", "ann_path": f"anns/{name}.pt",
                "task_id": "det", "mask_mode": "polygons",
            })

            # raw NuCLS mirror of the val split (reference eval reads this)
            if split == "val":
                fov = f"SYN-off_{name}"
                cv2.imwrite(str(raw_val / "rgb" / f"{fov}.png"), bgr)
                pd.DataFrame([{
                    "group": GROUPS[c], "type": "polyline",
                    "xmin": int(b[0]), "ymin": int(b[1]),
                    "xmax": int(b[2]), "ymax": int(b[3]),
                    "coords_x": ",".join(str(float(v)) for v in pl[:, 0]),
                    "coords_y": ",".join(str(float(v)) for v in pl[:, 1]),
                } for b, c, pl in zip(boxes, labels, polys)]).to_csv(
                    raw_val / "csv" / f"{fov}.csv")
                meta_rows.append({"fovname": fov, "xmin": 0, "ymin": 0,
                                  "xmax": args.imgsz, "ymax": args.imgsz})

        (ours / f"index_{split}.csv").write_text(
            "image_path,image_id,ann_id,ann_path,task_id,mask_mode\n"
            + "\n".join(ours_rows) + "\n")
        pd.DataFrame(meta_csv_rows).to_csv(meta_d / f"{split}.csv",
                                           index=False)
    pd.DataFrame(meta_rows).to_csv(raw_val / "csv" / "ALL_FOV_LOCATIONS.csv")

    # training-time val subset (first --val-sub tiles): per-epoch val on CPU
    # costs as much as training on this 1-core host, so both sides train
    # against the small subset and the FINAL quality eval uses the full val
    for split_csv, sub_csv in ((ours / "index_val.csv",
                                ours / "index_val_sub.csv"),
                               (meta_d / "val.csv", meta_d / "val_sub.csv")):
        lines = split_csv.read_text().splitlines()
        Path(sub_csv).write_text("\n".join(lines[:1 + args.val_sub]) + "\n")

    # data yamls
    meta_info = {"det": {"labels_text": {i: g for i, g in GROUPS.items()}}}
    (ours / "data.yaml").write_text(yaml.safe_dump(
        {"train": str(ours / "index_train.csv"),
         "val": str(ours / "index_val_sub.csv"),
         "tasks": ["det"], "meta_info": meta_info}))
    (ours / "data_fullval.yaml").write_text(yaml.safe_dump(
        {"train": str(ours / "index_train.csv"),
         "val": str(ours / "index_val.csv"),
         "tasks": ["det"], "meta_info": meta_info}))
    # -100/0 entries: val_nuclei's overlay plotting indexes labels_text with
    # the raw label and the reference emits -100 for "unclassified"
    # (yolo_head.py:336-354) — without these keys the train loop CRASHES in
    # overlay_detections (image_utils.py:883 KeyError, hit at ~epoch 45)
    ref_meta = {"det": {
        "labels_text": {-100: "unlabeled", 0: "unlabeled",
                        **{i: g for i, g in GROUPS.items()}},
        "labels_color": {-100: [128, 128, 128], 0: [128, 128, 128],
                         **{i: c for i, c in zip(
                             GROUPS, ([0, 255, 0], [255, 0, 0],
                                      [0, 0, 255], [255, 255, 0]))}},
    }}
    with open(meta_d / "meta.yaml", "w") as f:
        yaml.safe_dump(ref_meta, f)
    with open(meta_d / "data.yaml", "w") as f:
        yaml.safe_dump({"train": str(meta_d / "train.csv"),
                        "val": str(meta_d / "val_sub.csv"),
                        "tasks": ["det"],
                        "meta_info": str(meta_d / "meta.yaml")}, f)

    # model cfgs at the shared small scale
    with open("/root/reference/metayolo/hub/yolov5l6-mask.yaml",
              encoding="ascii", errors="ignore") as f:
        ref_cfg = _normalize_ref_cfg(yaml.safe_load(f))
    ref_cfg.update(SCALE)
    with open(root / "ref_model.yaml", "w") as f:
        yaml.safe_dump(ref_cfg, f)

    from hd_yolo_tpu.config import load_cfg

    our_cfg = load_cfg("yolov5l6-mask")
    our_cfg.update(SCALE)
    for row in our_cfg["headers"]:
        if len(row) > 4 and row[4] == "detSC":
            row[4] = "det"
    with open(root / "ours_model.yaml", "w") as f:
        yaml.safe_dump(our_cfg, f)

    print(json.dumps({"gen": {"dir": str(root), "n_train": args.n_train,
                              "n_val": args.n_val, "imgsz": args.imgsz,
                              "nuclei_per_tile": args.nuclei,
                              "scale": SCALE}}), flush=True)


# --------------------------------------------------------------------------
# phase: ref-train
# --------------------------------------------------------------------------

def ref_train(args):
    from hd_yolo_tpu.utils.reference_oracle import enable_reference

    assert enable_reference(), "reference checkout not available"
    import torch

    import train as ref_train_mod  # /root/reference/train.py
    from metayolo.engines.callbacks import Callbacks

    root = Path(args.dir)
    opt = argparse.Namespace(
        data=str(root / "metayolo" / "data.yaml"),
        cfg=str(root / "ref_model.yaml"),
        hyp=str(Path(__file__).resolve().parent.parent /
                "hd_yolo_tpu/configs/hyp-nuclei.yaml"),
        weights=args.weights or "",
        epochs=args.epochs, batch_size=args.batch_size,
        imgsz=args.imgsz, patch_size=args.imgsz, keep_res=-1,
        masks=True, rect=False, resume=False, restart=False, nosave=False,
        noval=args.noval, noautoanchor=True, evolve=False, bucket="",
        image_weights=False, device="cpu", multi_scale=False,
        single_cls=False, optimizer="SGD", sync_bn=False, workers=0,
        project=str(root / "ref_runs"), name="exp", exist_ok=True, quad=False,
        cos_lr=False, label_smoothing=0.0, patience=10**6, freeze=[],
        save_period=-1, local_rank=-1, verbose=False, wandb=False,
        save_dir=str(root / "ref_runs" / "exp"),
    )

    marks = {"starts": []}
    cb = Callbacks()
    cb.register_action("on_train_epoch_start",
                       callback=lambda *a, **k: marks["starts"].append(time.time()))
    t0 = time.time()
    ref_train_mod.train(opt.hyp, opt, torch.device("cpu"), cb)
    wall = time.time() - t0

    per_epoch = np.diff(marks["starts"])
    steady = float(np.mean(per_epoch[1:])) if len(per_epoch) > 1 else wall
    row = {"epochs": args.epochs, "batch_size": args.batch_size,
           "imgsz": args.imgsz, "wall_s": wall,
           "steady_epoch_s": steady,
           "images_per_s": args_n_train(args) / steady if steady else None,
           "noval": args.noval,
           "ckpt": str(root / "ref_runs" / "exp" / "weights" / "best.pt")}
    (root / "ref_train.json").write_text(json.dumps(row, indent=2))
    print(json.dumps({"ref_train": row}), flush=True)


def args_n_train(args):
    root = Path(args.dir)
    return sum(1 for _ in open(root / "ours" / "index_train.csv")) - 1


# --------------------------------------------------------------------------
# phase: ours-train
# --------------------------------------------------------------------------

def ours_train(args):
    import pickle

    import jax

    from hd_yolo_tpu.engines.train import argument_parser, train

    root = Path(args.dir)
    run_dir = root / args.run_name
    opt = argument_parser().parse_args([
        "--data", str(root / "ours" / "data.yaml"),
        "--cfg", str(root / "ours_model.yaml"), "--hyp", "hyp-nuclei",
        "--epochs", str(args.epochs), "--batch-size", str(args.batch_size),
        "--img-size", str(args.imgsz), "--masks",
        "--workers", "8", "--max-targets", "64", "--mask-rois", "32",
        "--max-masks", "64", "--k-mosaic", "1", "--patience", "1000000",
        "--cache-images", "--val-interval", str(max(args.epochs // 8, 1)),
        "--save-interval", str(max(args.epochs // 8, 1)),
        "--nominal-batch-size", str(args.batch_size),
        "--save-dir", str(run_dir),
    ])
    t0 = time.time()
    result = train(opt)
    wall = time.time() - t0

    from hd_yolo_tpu.engines.checkpoint import load_inference

    ev = load_inference(str(run_dir / "final"))
    with open(run_dir / "final_vars.pkl", "wb") as f:
        pickle.dump({k: jax.tree.map(np.asarray, v) for k, v in ev.items()}, f)
    row = {"epochs": args.epochs, "batch_size": args.batch_size,
           "imgsz": args.imgsz, "wall_s": wall,
           **{k: float(v) for k, v in result.items()
              if isinstance(v, (int, float))}}
    (root / f"{args.run_name.replace('_run', '')}_train.json").write_text(
        json.dumps(row, indent=2))
    print(json.dumps({"ours_train": row}), flush=True)


# --------------------------------------------------------------------------
# phase: evaluate
# --------------------------------------------------------------------------

def _ref_eval(root: Path, key: str, ckpt_path: str, batch_size: int,
              conf: float = 0.15):
    """Score a checkpoint through the reference's own deployed eval flow
    (evaluation.py:153-245, eager Deploy for the mask path).  ``conf``
    rides the reference's own transfer_cfgs→get_nms_params override
    (evaluation.py:49-57) — both sides of the train-off are scored at the
    same threshold."""
    import pandas as pd
    import torch.jit as _jit

    import evaluation as ref_evaluation

    meta = pd.read_csv(root / "raw_val" / "csv" / "ALL_FOV_LOCATIONS.csv",
                       index_col=0)
    dataset = build_reference_dataset(root / "raw_val", meta)
    meta_info = {"det": {"labels_color": LABELS_COLOR,
                         "labels_text": LABELS_TEXT}}
    _jit.script = lambda m, *a, **k: m  # eager: scripted mask path needs
    # old-torch integer clamp semantics (see tools/reference_baseline.py)
    _, stats = ref_evaluation.run(
        dataset, ref_model=None, run_eval=True,
        exp_name=f"trainoff_{key}",
        weights={key: ckpt_path},
        output_folder=str(root / "eval_out" / key),
        export_folder=str(root / "eval_export" / key),
        device="cpu", half=False, batch_size=batch_size,
        compute_masks=True, meta_info=meta_info,
        transfer_cfgs={"headers": {"det": {
            "nms_params": {"conf_thres": conf}}}},
        core_labels=["tumor", "stromal", "sTILs"],
        label_converter={},
    )
    s = stats[key]
    return {"coverage": float(s["cm"].get("coverage", float("nan"))),
            "accuracy": float(s["cm"].get("accuracy", float("nan"))),
            "mcc": float(s["cm"].get("mcc", float("nan"))),
            "miou": float(s["cm"].get("miou", float("nan"))),
            "time_per_image_s": float(s["time_per_image"])}


def _our_val(root: Path, variables, imgsz: int, batch_size: int,
             conf: float = 0.15):
    """Score params through this repo's val engine (box + mask fitness)."""
    from hd_yolo_tpu.config import load_cfg, load_dataset_info
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset
    from hd_yolo_tpu.engines import val as val_engine
    from hd_yolo_tpu.models import Model

    info = load_dataset_info(str(root / "ours" / "data_fullval.yaml"))
    hyp = load_cfg("hyp-nuclei")
    for k in hyp:
        if isinstance(hyp[k], dict) and "conf_thres" in hyp[k]:
            hyp[k]["conf_thres"] = conf
    model = Model.from_cfg(str(root / "ours_model.yaml"),
                           hyp, max_masks=64, mask_rois=32)
    vds = DetectionDataset(info["val"], {"img_size": imgsz}, train=False,
                           max_targets=64)
    vdl = DataLoader(vds, batch_size, workers=4, shuffle=False,
                     drop_last=False)
    out = {}
    for iou_type in ("boxes", "masks"):
        fit, stats, _ = val_engine.run(
            model, variables, ((b["image"], b["targets"]) for b in vdl),
            meta_info=info.get("meta_info", {}), compute_masks=True,
            iou_type=iou_type, verbose=False)
        out[iou_type] = {"fitness": float(fit),
                         **{t: {k: float(v) for k, v in s.items()
                                if np.isscalar(v)}
                            for t, s in stats.items()}}
    return out


def evaluate(args):
    import pickle

    import torch

    from hd_yolo_tpu.utils.reference_oracle import (enable_reference,
                                                    load_reference_model)

    assert enable_reference(), "reference checkout not available"
    root = Path(args.dir)
    out = {"scale": SCALE}
    for f, key in ((root / "ref_train.json", "ref_train"),
                   (root / "ours_train.json", "ours_train")):
        if f.exists():
            out[key] = json.loads(f.read_text())

    # param parity at the shared scale
    import yaml

    ref_model = load_reference_model(
        cfg=yaml.safe_load(open(root / "ref_model.yaml")))
    n_ref = sum(p.numel() for p in ref_model.parameters())
    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.models import Model

    our_model = Model.from_cfg(str(root / "ours_model.yaml"),
                               load_cfg("hyp-nuclei"), max_masks=64,
                               mask_rois=32)
    out["params"] = {"reference": int(n_ref)}

    ref_best = root / "ref_runs" / "exp" / "weights" / "best.pt"
    if not ref_best.exists():
        ref_best = root / "ref_runs" / "exp" / "weights" / "last.pt"
    ours_pkl = root / "ours_run" / "final_vars.pkl"

    # leg A/B: both checkpoints through the REFERENCE's own eval
    if ref_best.exists():
        out["ref_trained_ref_eval"] = _ref_eval(root, "reftr",
                                                str(ref_best),
                                                args.batch_size, args.conf)
    if ours_pkl.exists():
        from hd_yolo_tpu.utils.export_torch import load_any_into_reference

        n_hit = load_any_into_reference(ref_model, str(ours_pkl))
        ref_model.float().eval()
        ck = root / "ours_as_ref.ckpt.pt"
        torch.save({"model": ref_model}, ck)
        out["tpu_trained_ref_eval"] = {
            "tensors_loaded": int(n_hit),
            **_ref_eval(root, "tputr", str(ck), args.batch_size, args.conf)}

    # equal-WALL-CLOCK leg: ours trained for the reference's wall budget
    wall_pkl = root / "ours_wall_run" / "final_vars.pkl"
    if wall_pkl.exists():
        from hd_yolo_tpu.utils.export_torch import load_any_into_reference
        from hd_yolo_tpu.utils.reference_oracle import load_reference_model as _lrm

        ref_model_w = _lrm(cfg=yaml.safe_load(open(root / "ref_model.yaml")))
        load_any_into_reference(ref_model_w, str(wall_pkl))
        ref_model_w.float().eval()
        ckw = root / "ours_wall_as_ref.ckpt.pt"
        torch.save({"model": ref_model_w}, ckw)
        out["tpu_wallclock_ref_eval"] = _ref_eval(
            root, "tpuwall", str(ckw), args.batch_size, args.conf)
        wf = root / "ours_wall_train.json"
        if wf.exists():
            out["ours_wall_train"] = json.loads(wf.read_text())

    # leg C/D: both checkpoints through THIS repo's val engine
    if ours_pkl.exists():
        with open(ours_pkl, "rb") as f:
            ev = pickle.load(f)
        out["tpu_trained_our_val"] = _our_val(root, ev, args.imgsz,
                                              args.batch_size, args.conf)
    if ref_best.exists():
        from hd_yolo_tpu.utils.import_torch import load_torch_weights

        variables = load_torch_weights(str(ref_best), our_model.spec)
        out["ref_trained_our_val"] = _our_val(root, variables, args.imgsz,
                                              args.batch_size, args.conf)
    if wall_pkl.exists():
        import pickle as _pk

        with open(wall_pkl, "rb") as f:
            evw = _pk.load(f)
        out["tpu_wallclock_our_val"] = _our_val(root, evw, args.imgsz,
                                                args.batch_size, args.conf)

    (Path(__file__).resolve().parent.parent / "TRAINOFF.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out, indent=2), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["gen", "ref-train", "ours-train",
                                      "evaluate"])
    ap.add_argument("--dir", default="/tmp/train_off")
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--val-sub", type=int, default=4,
                    help="training-time val tiles (final eval uses all n-val)")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--nuclei", type=int, default=40)
    ap.add_argument("--nucleus-scale", type=float, default=1.0,
                    help="ellipse axes multiplier (larger nuclei converge "
                         "at CPU-feasible budgets)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--conf", type=float, default=0.05,
                    help="shared eval conf threshold (both stacks; the "
                         "deploy default 0.15 hides sub-threshold models "
                         "at small train budgets)")
    ap.add_argument("--run-name", default="ours_run",
                    help="ours-train output dir name (equal-wall-clock legs "
                         "use a second run)")
    ap.add_argument("--noval", action="store_true",
                    help="reference leg: val only on the final epoch "
                         "(BROKEN upstream: train.py:526 UnboundLocalError "
                         "'fi' on non-final epochs — keep per-epoch val)")
    ap.add_argument("--weights", default="",
                    help="ref-train warm start / crash resume (e.g. "
                         "ref_runs/exp/weights/last.pt)")
    args = ap.parse_args()
    {"gen": gen, "ref-train": ref_train, "ours-train": ours_train,
     "evaluate": evaluate}[args.phase](args)


if __name__ == "__main__":
    main()
