#!/usr/bin/env python3
"""Training-step throughput on the real TPU: flagship det+mask fwd+bwd+optim.

Loops N steps inside ONE jit (lax.scan over the pure train step) and fetches a
scalar once, so the tunnel's fixed dispatch cost amortizes away — the same
methodology as bench.py.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState, make_train_step
    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg
    from hd_yolo_tpu.config import load_cfg

    B, img, T, n_iter = 8, 640, 64, 20
    hyp = load_cfg("hyp-nuclei")
    model = Model.from_cfg("yolov5l6-mask", hyp, dtype=jnp.bfloat16,
                           mask_rois=32, max_masks=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, img, img, 3)).astype(np.float32))
    spec = parse_model_cfg("yolov5l6-mask", hyp)
    tag = spec.headers[0].tag
    xy = rng.uniform(0.05, 0.6, (B, T, 2)).astype(np.float32)
    wh = rng.uniform(0.02, 0.08, (B, T, 2)).astype(np.float32)
    targets = {tag: {
        "boxes": jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, 1.0)], -1)),
        "labels": jnp.asarray(rng.integers(1, 5, (B, T))),
        "masks": jnp.asarray((rng.uniform(0, 1, (B, T, 28, 28)) > 0.4).astype(np.float32)),
        "valid": jnp.ones((B, T), bool),
    }}
    variables = jax.jit(lambda k: model.init(k, x, targets, train=True))(jax.random.PRNGKey(0))
    tx = build_optimizer(variables["params"], hyp, 100, 100)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx)

    @jax.jit
    def loop(st, xx, tg):
        def body(s, _):
            s2, m = step(s, {"image": xx + s.step.astype(jnp.float32) * 1e-9,
                             "targets": tg})
            return s2, m["loss"]
        s_final, losses = jax.lax.scan(body, st, None, length=n_iter)
        return losses[-1], s_final

    l, state2 = loop(state, x, targets)
    print("compiled; warm loss:", float(l), flush=True)
    t0 = time.time()
    l, _ = loop(state2, x, targets)
    float(l)
    dt = (time.time() - t0) / n_iter
    print(f"train step: {dt*1e3:.1f} ms/step -> {B/dt:.1f} img/s "
          f"(full det+mask fwd+bwd+opt+EMA, batch {B} @ {img}px)", flush=True)


if __name__ == "__main__":
    main()
