"""ROI-align canvas einsum with bf16 (vs f32) intermediates/output.

MEASURED (v5e, r3): xla_canvas 4.07 ms vs xla_canvas_bf16out 4.05 ms at
B=16 K=100 C=256 — a wash (XLA already keeps the bf16 operands through the
contraction; the giant (B,K,S,W0,C) `rows` intermediate is HBM-bound either
way).  Negative result, kept for the record: the f32-accumulate canvas in
ops/roi_align.py stays as-is.
"""
import json, time, sys
import sys; from pathlib import Path; sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from hd_yolo_tpu.ops.roi_align import _multiscale_roi_align_canvas, _bounded_interp_matrix

B, K, C, M = 16, 100, 256, 14
STRIDES = (8.0, 16.0, 32.0, 64.0)
N_ITER = 30
rng = np.random.default_rng(0)
feats = tuple(jnp.asarray(rng.standard_normal((B, 640 // int(s), 640 // int(s), C)).astype(np.float32), jnp.bfloat16) for s in STRIDES)
wh = rng.uniform(8, 120, (B, K, 2)).astype(np.float32)
xy = rng.uniform(0, 640, (B, K, 2)).astype(np.float32)
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
    float(loop(boxes)); t0 = time.time(); float(loop(boxes))
    print(json.dumps({"cand": name, "ms": round((time.time() - t0) / N_ITER * 1e3, 3)}), flush=True)

@jax.jit
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
    rows = jnp.einsum("bksh,bhwc->bkswc", Wy, canvas, preferred_element_type=jnp.bfloat16)
    out = jnp.einsum("bktw,bkswc->bkstc", Wx, rows, preferred_element_type=jnp.bfloat16)
    return out

ref = _multiscale_roi_align_canvas(feats, boxes, levels, STRIDES, 14, 2, False)
got = canvas_bf16out(boxes)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
print(json.dumps({"cand": "xla_canvas_bf16out", "max_abs_err": err}), flush=True)
timed("xla_canvas", lambda bx: _multiscale_roi_align_canvas(feats, bx, levels, STRIDES, 14, 2, False))
timed("xla_canvas_bf16out", canvas_bf16out)
