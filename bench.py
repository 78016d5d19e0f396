#!/usr/bin/env python3
"""Headline benchmark: tiles/sec/chip for flagship 640px WSI tile inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the ratio vs an architecture-identical PyTorch-fp32-CPU
trunk (the reference's deployment bench is CPU ``time_per_image``,
/root/reference/evaluation.py:97-104; the reference itself can't run here —
torchvision/torch_scatter are absent — so the baseline is the FLOPs-matched
torch mirror in hd_yolo_tpu/utils/torch_baseline.py).

Timing note: jax's async dispatch over the axon tunnel makes block_until_ready
unreliable; every timed call fetches a scalar to host.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg

    batch = int(os.environ.get("BENCH_BATCH", 8))
    img = int(os.environ.get("BENCH_IMG", 640))
    compute_masks = os.environ.get("BENCH_MASKS", "1") != "0"
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") != "0" else jnp.float32

    spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
    model = Model(spec=spec, dtype=dtype, max_masks=100, pre_nms_topk=1024)

    x0 = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False, compute_masks=compute_masks))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(variables)

    fwd = jax.jit(
        lambda v, x: jax.tree.reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
            model.apply(v, x, train=False, compute_masks=compute_masks)[1],
            0.0,
        )
    )
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32))

    float(fwd(variables, xb))  # compile + warm
    n_iter = int(os.environ.get("BENCH_ITERS", 20))
    t0 = time.time()
    for _ in range(n_iter):
        float(fwd(variables, xb))  # host fetch forces completion
    dt = (time.time() - t0) / n_iter
    tiles_per_sec = batch / dt

    # PyTorch-CPU FLOPs-matched baseline
    try:
        from hd_yolo_tpu.utils.torch_baseline import measure_cpu_tiles_per_sec

        cpu_tps = measure_cpu_tiles_per_sec(spec, img_size=img)
    except Exception as e:  # torch missing / OOM — report ratio as 0 (unknown)
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        cpu_tps = float("nan")

    result = {
        "metric": "tiles_per_sec_per_chip_640px_mask_inference" if compute_masks
        else "tiles_per_sec_per_chip_640px_det_inference",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_sec / cpu_tps, 2) if np.isfinite(cpu_tps) else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
