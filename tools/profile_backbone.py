#!/usr/bin/env python3
"""Per-segment backbone/neck ablation on the real chip: times the trunk
truncated after each layer row (cumulative), so per-layer deltas localize the
MXU-efficiency gap (backbone measured ~48% of bf16 peak vs neck ~80%).

    python -u tools/profile_backbone.py [--batch 16] [--iters 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--layers", type=int, default=12, help="how many leading rows to ablate")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg

    spec = parse_model_cfg("yolov5l6-mask", "hyp-nuclei")
    model = Model(spec=spec, dtype=jnp.bfloat16, max_masks=100, pre_nms_topk=1024)
    B, S = args.batch, args.img
    x0 = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, train=False))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    def run_prefix(mdl, x, n_layers):
        saved = {}
        save = set(mdl.spec.save)
        cur = x
        for l, mod in list(zip(mdl.spec.layers, mdl.blocks))[:n_layers]:
            if l.from_idx == -1:
                inp = cur
            elif isinstance(l.from_idx, int):
                inp = saved[l.from_idx]
            else:
                inp = [cur if j == -1 else saved[j] for j in l.from_idx]
            if isinstance(mod, (list, tuple)):
                for m in mod:
                    inp = m(inp, train=False)
                cur = inp
            else:
                cur = mod(inp, train=False)
            if l.index in save:
                saved[l.index] = cur
        return jnp.sum(cur.astype(jnp.float32))

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))

    prev = 0.0
    for n in range(1, args.layers + 1):
        @jax.jit
        def loop(v, x, n=n):
            def body(carry, _):
                s = nn.apply(lambda m, xx: run_prefix(m, xx, n), model)(v, x + carry * 1e-6)
                return s * 1e-9, None
            c, _ = jax.lax.scan(body, 0.0, None, length=args.iters)
            return c.reshape(1)
        float(loop(variables, xb)[0])
        t0 = time.time()
        float(loop(variables, xb)[0])
        dt = (time.time() - t0) / args.iters
        row = spec.layers[n - 1]
        print(json.dumps({
            "layer": n - 1,
            "module": f"{row.module}x{row.n}",
            "ms_cum": round(dt * 1e3, 3),
            "ms_delta": round((dt - prev) * 1e3, 3),
        }), flush=True)
        prev = dt


if __name__ == "__main__":
    main()
