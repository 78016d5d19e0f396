"""Offline evaluation / deployment benchmark harness.

Behavioral reference: ``/root/reference/evaluation.py``:
  * ``build_model`` rebuilds the architecture, loads ckpt/EMA weights,
    applies optional ``label_map`` / ``nms_params`` overrides, and compiles a
    deployment artifact (:27-64 — TorchScript there, ``jax.jit`` + AOT export
    here),
  * ``inference_on_loader``: resize to input_size → forward → rescale coords
    back → wall-clock ``time_per_image`` (:81-150),
  * ``run``: results cached per experiment name (.npz here vs .pt/.pkl),
    weights exported, NuCLS summary stats (:153-245).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import LOGGER
from ..models import Model
from ..ops.boxes import scale_coords
from .checkpoint import load_inference


def build_model(
    cfg,
    hyp,
    weights: Optional[str] = None,
    nms_params: Optional[Dict[str, float]] = None,
    dtype=jnp.bfloat16,
    **model_kwargs,
):
    """Rebuild architecture + load weights → (model, variables, jitted fwd).

    ``nms_params`` overrides the per-task hyp values (evaluation.py:48-56).
    """
    from ..config import load_cfg

    hyp = load_cfg(hyp)
    if nms_params:
        for tag, section in hyp.items():
            if isinstance(section, dict) and "conf_thres" in section:
                section.update(nms_params)
    model = Model.from_cfg(cfg, hyp, dtype=dtype, **model_kwargs)
    if weights:
        variables = load_inference(weights)
    else:  # fresh init (compile check / random-weight benchmarking)
        x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
        variables = jax.jit(
            lambda k: model.init(k, x0, train=False, compute_masks=True)
        )(jax.random.PRNGKey(0))

    fwd = jax.jit(
        lambda v, x, compute_masks: model.apply(
            v, x, train=False, compute_masks=compute_masks
        )[1],
        static_argnames=("compute_masks",),
    )
    return model, variables, fwd


def export_aot(model, variables, input_shape, path: str, compute_masks: bool = True):
    """Serialize an AOT-compiled inference artifact via jax.export
    (the Deploy/torch.jit.script analog, evaluation.py:62)."""
    from jax import export as jexport

    fn = lambda v, x: model.apply(v, x, train=False, compute_masks=compute_masks)[1]
    args = (variables, jnp.zeros(input_shape, jnp.float32))
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def inference_on_loader(
    fwd: Callable,
    variables,
    data_iter,
    input_size: int = 640,
    compute_masks: bool = True,
    task: Optional[str] = None,
) -> Dict[str, Any]:
    """Run deployment inference over (images, sizes) batches.

    Returns {'outputs': per-image host dicts with boxes rescaled to original
    frames, 'time_per_image': wall-clock seconds (incl. resize, like
    evaluation.py:97-104)}.
    """
    outputs: List[Dict[str, np.ndarray]] = []
    total_time, n_images = 0.0, 0
    for images, orig_sizes in data_iter:
        t0 = time.time()
        x = jnp.asarray(images)
        if jnp.issubdtype(x.dtype, jnp.integer):  # raw uint8 loader batches
            x = x.astype(jnp.float32) / 255.0
        else:
            x = x.astype(jnp.float32)
        if x.shape[1] != input_size or x.shape[2] != input_size:
            x = jax.image.resize(
                x, (x.shape[0], input_size, input_size, x.shape[-1]), "bilinear"
            )
        out = fwd(variables, x, compute_masks)
        out = jax.tree.map(np.asarray, out)  # host fetch = sync
        total_time += time.time() - t0
        B = x.shape[0]
        n_images += B
        task_ids = [task] if task else list(out.keys())
        for i in range(B):
            rec: Dict[str, Any] = {}
            for t in task_ids:
                o = out[t]
                v = o["valid"][i]
                boxes = np.asarray(
                    scale_coords((input_size, input_size), jnp.asarray(o["boxes"][i]),
                                 tuple(int(s) for s in orig_sizes[i]))
                )
                rec[t] = {
                    "boxes": boxes[v],
                    "scores": o["scores"][i][v],
                    "labels": o["labels"][i][v],
                }
                if "masks" in o:
                    # masks exist only for the first R score-ordered slots;
                    # pad to detection capacity so rows align with boxes[v]
                    m = o["masks"][i]
                    R, D = m.shape[0], v.shape[0]
                    mfull = np.zeros((D,) + m.shape[1:], m.dtype)
                    mfull[:R] = m
                    hm = np.zeros((D,), bool)
                    hm[:R] = np.asarray(o.get("mask_valid", o["valid"][:, :R])[i])
                    rec[t]["masks"] = mfull[v]
                    rec[t]["has_mask"] = hm[v]
            outputs.append(rec)
    return {"outputs": outputs, "time_per_image": total_time / max(n_images, 1)}


def run(
    experiments: Dict[str, Dict[str, Any]],
    data_iter_fn: Callable[[], Any],
    output_dir: str = "./eval_results",
    input_size: int = 640,
    compute_masks: bool = True,
    force: bool = False,
) -> Dict[str, Any]:
    """Benchmark multiple model configurations with result caching
    (evaluation.py:153-245 golden-file harness semantics).

    experiments: name → {'cfg', 'hyp', 'weights'?, 'nms_params'?, 'task'?}.
    """
    os.makedirs(output_dir, exist_ok=True)
    summary = {}
    for name, exp in experiments.items():
        cache = os.path.join(output_dir, f"{name}_results.pkl")
        stats_path = os.path.join(output_dir, f"{name}_stats.json")
        if os.path.exists(cache) and os.path.exists(stats_path) and not force:
            # require BOTH files: a crash between the pickle and stats writes
            # must fall through to recompute, not raise (ADVICE r1)
            LOGGER.info(f"[{name}] cached → {cache}")
            with open(stats_path) as f:
                summary[name] = json.load(f)
            continue
        LOGGER.info(f"[{name}] building model")
        model, variables, fwd = build_model(
            exp["cfg"], exp["hyp"], exp.get("weights"), exp.get("nms_params"),
            **exp.get("model_kwargs", {}),
        )
        res = inference_on_loader(
            fwd, variables, data_iter_fn(), input_size=input_size,
            compute_masks=compute_masks, task=exp.get("task"),
        )
        with open(cache, "wb") as f:
            pickle.dump(res["outputs"], f)
        stats = {
            "time_per_image": res["time_per_image"],
            "images_per_sec": 1.0 / max(res["time_per_image"], 1e-9),
            "n_images": len(res["outputs"]),
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        summary[name] = stats
        LOGGER.info(f"[{name}] {stats}")
    return summary


def main(argv=None):
    """CLI: benchmark a model config over a synthetic or csv-indexed set.

    python -m hd_yolo_tpu.engines.evaluate --cfg yolov5l6-mask --weights ckpt \
        [--data index.csv] [--n 32] [--img-size 640]
    """
    import argparse

    import jax.numpy as jnp

    p = argparse.ArgumentParser("hd_yolo_tpu evaluate")
    p.add_argument("--cfg", default="yolov5l6-mask")
    p.add_argument("--hyp", default="hyp-nuclei")
    p.add_argument("--weights", default=None)
    p.add_argument("--data", default=None, help="index csv (synthetic batch if omitted)")
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--img-size", dest="img_size", type=int, default=640)
    p.add_argument("--batch-size", dest="batch_size", type=int, default=8)
    p.add_argument("--no-masks", dest="masks", action="store_false")
    p.add_argument("--output", default="./eval_results")
    p.add_argument("--force", action="store_true")
    opt = p.parse_args(argv)

    def data_iter():
        if opt.data:
            from ..data.dataset import DataLoader, DetectionDataset

            ds = DetectionDataset(opt.data, {"img_size": opt.img_size}, train=False)
            for b in DataLoader(ds, opt.batch_size, shuffle=False, drop_last=False):
                B = b["image"].shape[0]
                yield b["image"], [(opt.img_size, opt.img_size)] * B
        else:
            rng = np.random.default_rng(0)
            for _ in range(max(opt.n // opt.batch_size, 1)):
                imgs = rng.uniform(0, 1, (opt.batch_size, opt.img_size, opt.img_size, 3))
                yield imgs.astype(np.float32), [(opt.img_size, opt.img_size)] * opt.batch_size

    summary = run(
        {"model": {"cfg": opt.cfg, "hyp": opt.hyp, "weights": opt.weights}},
        data_iter, output_dir=opt.output, input_size=opt.img_size,
        compute_masks=opt.masks, force=opt.force,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
