#!/usr/bin/env python3
"""Multiscale ROI-align canvas: XLA einsum vs fused Pallas kernel on the
real chip, at flagship mask-branch shapes (B=16, K=100, C=256, levels
80/40/20/10 rows).  Sweeps the Pallas chunk size.

    python -u tools/roi_lab.py [--batch 16] [--rois 100] [--iters 30]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from hd_yolo_tpu.ops.roi_align import _multiscale_roi_align_canvas
from hd_yolo_tpu.ops.pallas_roi_align import multiscale_roi_align_canvas_pallas

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=16)
ap.add_argument("--rois", type=int, default=100)
ap.add_argument("--iters", type=int, default=30)
ap.add_argument("--img", type=int, default=640)
args = ap.parse_args()

B, K, C, M = args.batch, args.rois, 256, 14
STRIDES = (8.0, 16.0, 32.0, 64.0)
N_ITER = args.iters

rng = np.random.default_rng(0)
feats = tuple(
    jnp.asarray(rng.standard_normal(
        (B, args.img // int(s), args.img // int(s), C)).astype(np.float32),
        jnp.bfloat16)
    for s in STRIDES)
wh = rng.uniform(8, 120, (B, K, 2)).astype(np.float32)
xy = rng.uniform(0, args.img, (B, K, 2)).astype(np.float32)
boxes = jnp.asarray(np.concatenate([xy - wh / 2, xy + wh / 2], -1))
levels = jnp.asarray(rng.integers(0, 4, (B, K)), jnp.int32)


def timed(name, fn):
    @jax.jit
    def loop(bx):
        def body(c, _):
            o = fn(bx + c * 1e-6)
            return jnp.sum(o.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=N_ITER)
        return c

    try:
        float(loop(boxes))
        t0 = time.time()
        float(loop(boxes))
        dt = (time.time() - t0) / N_ITER
        print(json.dumps({"cand": name, "ms": round(dt * 1e3, 3)}), flush=True)
        return dt
    except Exception as e:
        print(json.dumps({"cand": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
        return None


ref = _multiscale_roi_align_canvas(feats, boxes, levels, STRIDES, M, 2, False)
timed("xla_canvas", lambda bx: _multiscale_roi_align_canvas(
    feats, bx, levels, STRIDES, M, 2, False))

for kc in (4, 10, 20, 50):
    try:
        got = multiscale_roi_align_canvas_pallas(
            feats, boxes, levels, STRIDES, M, 2, False, kc)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
    except Exception as e:  # e.g. VMEM overflow at large kchunk
        print(json.dumps({"cand": f"pallas_k{kc}",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
        continue
    print(json.dumps({"cand": f"pallas_k{kc}", "max_abs_err": err}), flush=True)
    timed(f"pallas_k{kc}", lambda bx, kc=kc: multiscale_roi_align_canvas_pallas(
        feats, bx, levels, STRIDES, M, 2, False, kc))

# v4: dense block-diagonal x-contraction (see _canvas_kernel_v4)
for kc in (4, 8, 16, 32):
    try:
        got = multiscale_roi_align_canvas_pallas(
            feats, boxes, levels, STRIDES, M, 2, False, kc, False, 4)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
    except Exception as e:
        print(json.dumps({"cand": f"pallas_v4_k{kc}",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
        continue
    print(json.dumps({"cand": f"pallas_v4_k{kc}", "max_abs_err": err}),
          flush=True)
    timed(f"pallas_v4_k{kc}",
          lambda bx, kc=kc: multiscale_roi_align_canvas_pallas(
              feats, bx, levels, STRIDES, M, 2, False, kc, False, 4))

# bf16-preferred einsum outputs: MXU accumulates f32 either way, so numerics
# are identical; tests whether XLA fuses the f32->bf16 cast into the dot
from hd_yolo_tpu.ops.roi_align import _bounded_interp_matrix
import functools

@functools.partial(jax.jit, static_argnames=())
def canvas_bf16out(bx):
    M_, n_ = 14, 2
    S = M_ * n_
    B_, H0, W0, C_ = feats[0].shape
    stacked, metas = [], []
    off = 0
    for f, s in zip(feats, STRIDES):
        h, w = f.shape[1:3]
        stacked.append(jnp.pad(f, ((0, 0), (0, 0), (0, W0 - w), (0, 0))))
        metas.append((off, h, w, float(s)))
        off += h
    canvas = jnp.concatenate(stacked, axis=1)
    Ht = off
    meta = jnp.asarray(metas, jnp.float32)
    lv = jnp.clip(levels, 0, len(feats) - 1)
    moff, mh, mw = meta[lv, 0], meta[lv, 1], meta[lv, 2]
    scale = 1.0 / meta[lv, 3]
    bf = bx.astype(jnp.float32)
    x1 = bf[..., 0] * scale; y1 = bf[..., 1] * scale
    x2 = bf[..., 2] * scale; y2 = bf[..., 3] * scale
    roi_w = jnp.maximum(x2 - x1, 1.0); roi_h = jnp.maximum(y2 - y1, 1.0)
    s_idx = jnp.arange(S, dtype=jnp.float32) + 0.5
    ys = y1[..., None] + s_idx * (roi_h / S)[..., None] + moff[..., None]
    xs = x1[..., None] + s_idx * (roi_w / S)[..., None]
    Wy = _bounded_interp_matrix(ys, moff, moff + mh, Ht, M_, n_).astype(jnp.bfloat16)
    Wx = _bounded_interp_matrix(xs, jnp.zeros_like(mw), mw, W0, M_, n_).astype(jnp.bfloat16)
    rows = jnp.einsum("bksh,bhwc->bkswc", Wy, canvas,
                      preferred_element_type=jnp.bfloat16)
    out = jnp.einsum("bktw,bkswc->bkstc", Wx, rows,
                     preferred_element_type=jnp.bfloat16)
    return out

got = canvas_bf16out(boxes)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
print(json.dumps({"cand": "xla_canvas_bf16out", "max_abs_err": err}), flush=True)
timed("xla_canvas_bf16out", canvas_bf16out)
