#!/usr/bin/env python3
"""Mask-head timing on the real chip: XLA flax MaskHead vs the fused Pallas
kernel across ROI-chunk sizes g, at flagship shapes (N=B*K=1600, M=14,
C=256).  The bench A/B at g=8 tied XLA (~503 tiles/s either way); this
sweeps g to see whether per-dot overhead was the limiter.

MEASURED (v5e, r3): xla_maskhead 11.2 ms · pallas_g8 18.9 ms (max_abs_err
3.5e-4) · g=16 needs vmem_limit_bytes>16M and its timed-loop compile alone
exceeded a 30-min budget over the tunnel.  Negative result: the XLA chain
at ~73% of bf16 peak is the practical floor on this toolchain — see the
verdict note in ops/pallas_mask_head.py.

    python -u tools/maskhead_lab.py
"""
import json, sys, time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from hd_yolo_tpu.models.detect_head import MaskHead
from hd_yolo_tpu.ops.pallas_mask_head import fused_mask_probs

N, M, C, NC = 1600, 14, 256, 7
N_ITER = 30
rng = np.random.default_rng(0)
head = MaskHead(NC, C, dtype=jnp.bfloat16)
x0 = jnp.zeros((N, M, M, C), jnp.bfloat16)
params = head.init(jax.random.PRNGKey(0), x0)["params"]
pooled = jnp.asarray(rng.standard_normal((N, M, M, C)).astype(np.float32), jnp.bfloat16)
labels = jnp.asarray(rng.integers(0, NC, (N,)), jnp.int32)


def timed(name, fn):
    @jax.jit
    def loop(p, xx):
        def body(c, _):
            o = fn(p, xx + c * jnp.bfloat16(1e-3))
            return jnp.sum(o.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=N_ITER)
        return c
    try:
        float(loop(params, pooled))
        t0 = time.time(); float(loop(params, pooled))
        dt = (time.time() - t0) / N_ITER
        print(json.dumps({"cand": name, "ms": round(dt * 1e3, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"cand": name, "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)


def xla_path(p, xx):
    logits = head.apply({"params": p}, xx)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return jnp.take_along_axis(probs, labels[:, None, None, None], axis=-1)[..., 0]


ref = xla_path(params, pooled)
timed("xla_maskhead", xla_path)
for g in (8, 16, 32, 64):
    got = fused_mask_probs(params, pooled, labels, g=g)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(json.dumps({"cand": f"pallas_g{g}", "max_abs_err": round(err, 6)}), flush=True)
    timed(f"pallas_g{g}", lambda p, xx, g=g: fused_mask_probs(p, xx, labels, g=g))
