#!/usr/bin/env python3
"""C3-block formulation lab: measure layer-2 reformulations on the real TPU.

tools/profile_backbone.py shows the flagship backbone's layer 2 — C3(128,
n=3) at 160x160, the reference ``metayolo/models/layers.py:119-131`` block —
runs at ~43 TF/s (22% of v5e bf16 peak, 2.95 ms/batch-16): its bottleneck
intermediates are 64-channel, so every HBM tile is half-padded (bf16 tiling
is (16,128)) and every MXU contraction uses 64 of 128 lanes.

Candidates (all numerics-verified against ``direct`` before timing):

  direct      the block as the model runs it (1x1 convs + 3 bottlenecks,
              inference BN folded to scale+bias, silu)
  merged12    cv1+cv2 share an input: one 128->128 conv, split
  s2d         whole block in space-to-depth(2) space: 80x80x4C tensors
              (128-lane aligned), 3x3 convs become 2x2 convs over 4C
              phase-mixed channels, 1x1 convs become I4 (x) W block-diag,
              BN/act tiled per phase — exact, 1.78x FLOPs on the 3x3s at
              full lane rate
  im2col      bottleneck 3x3 as conv_general_dilated_patches (K=576) + dot
  nchw        lax.conv with NCHW operands

    python -u tools/c3_lab.py [--batch 16] [--hw 160] [--c 128] [--n 3]
"""
import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=16)
ap.add_argument("--hw", type=int, default=160)
ap.add_argument("--c", type=int, default=128)
ap.add_argument("--n", type=int, default=3)
ap.add_argument("--iters", type=int, default=50)
args = ap.parse_args()

B, HW, C, N_BN = args.batch, args.hw, args.c, args.n
CH = C // 2  # bottleneck width (expansion 0.5)
N_ITER = args.iters

rng = np.random.default_rng(0)


def mk(*shape, scale=0.1):
    return jnp.asarray((rng.standard_normal(shape) * scale).astype(np.float32),
                       jnp.bfloat16)


# inference-folded params: conv weight (kh,kw,cin,cout), scale (cout), bias
P = {
    "cv1": (mk(1, 1, C, CH), mk(CH, scale=1.0), mk(CH)),
    "cv2": (mk(1, 1, C, CH), mk(CH, scale=1.0), mk(CH)),
    "cv3": (mk(1, 1, C, C), mk(C, scale=1.0), mk(C)),
}
for i in range(N_BN):
    P[f"b{i}a"] = (mk(1, 1, CH, CH), mk(CH, scale=1.0), mk(CH))
    P[f"b{i}b"] = (mk(3, 3, CH, CH), mk(CH, scale=1.0), mk(CH))

x_host = rng.uniform(-1, 1, (B, HW, HW, C)).astype(np.float32)
X = jnp.asarray(x_host, jnp.bfloat16)

DN = lax.conv_dimension_numbers((1, 1, 1, C), (1, 1, C, C),
                                ("NHWC", "HWIO", "NHWC"))


def cba(x, p, pad="SAME"):
    w, s, b = p
    y = lax.conv_general_dilated(x, w, (1, 1), pad, dimension_numbers=DN,
                                 preferred_element_type=jnp.float32)
    return jax.nn.silu(y * s + b).astype(x.dtype)


# ---------------------------------------------------------------- candidates
def direct(x):
    y1 = cba(x, P["cv1"])
    for i in range(N_BN):
        t = cba(y1, P[f"b{i}a"])
        y1 = y1 + cba(t, P[f"b{i}b"])
    y2 = cba(x, P["cv2"])
    return cba(jnp.concatenate([y1, y2], -1), P["cv3"])


def merged12(x):
    w = jnp.concatenate([P["cv1"][0], P["cv2"][0]], -1)
    s = jnp.concatenate([P["cv1"][1], P["cv2"][1]])
    b = jnp.concatenate([P["cv1"][2], P["cv2"][2]])
    y = cba(x, (w, s, b))
    y1, y2 = y[..., :CH], y[..., CH:]
    for i in range(N_BN):
        t = cba(y1, P[f"b{i}a"])
        y1 = y1 + cba(t, P[f"b{i}b"])
    return cba(jnp.concatenate([y1, y2], -1), P["cv3"])


def _s2d(x):
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c))


def _d2s(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    return (x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h * 2, w * 2, c))


def _w1_s2d(p):
    """1x1 conv params -> block-diag I4 (x) W over s2d channels."""
    w, s, b = p
    cin, cout = w.shape[2], w.shape[3]
    wb = jnp.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
    for ph in range(4):
        wb = wb.at[0, 0, ph * cin:(ph + 1) * cin,
                   ph * cout:(ph + 1) * cout].set(w[0, 0])
    return wb, jnp.tile(s, 4), jnp.tile(b, 4)


def _w3_s2d(p):
    """3x3 conv params -> 2x2 conv over s2d phase-mixed channels.

    Fine-position math: out fine pixel (2i+py, 2j+px) sums taps (dy,dx) in
    [-1,1]^2 of in fine (2i+py+dy, 2j+px+dx) = coarse (i+cy, j+cx), phase
    ((py+dy)%2, (px+dx)%2) with cy = floor((py+dy)/2)+? — enumerate exactly.
    """
    w, s, b = p  # (3,3,cin,cout)
    cin, cout = w.shape[2], w.shape[3]
    # coarse kernel spans cy,cx in {0,1} with SAME pad handled by 2x2 'SAME'?
    # A 3x3 SAME conv at fine res maps to a 2x2 conv at coarse res whose
    # receptive field per output phase covers coarse offsets {-?..}: for
    # output phase p, fine taps p+d, d in {-1,0,1} -> fine coords span
    # [p-1, p+1] -> coarse span: phase 0: [-1, 1] -> coarse {-1, 0}; phase 1:
    # [0, 2] -> coarse {0, 1}.  Different phases need different coarse
    # offsets, so use a 3x3 coarse kernel (offsets {-1,0,1}) with zeros where
    # a phase doesn't reach — still exact, slightly more FLOPs.
    wb = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    wnp = np.asarray(w, np.float32)
    for py in range(2):
        for px in range(2):
            o_ph = py * 2 + px
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    fy, fx = py + dy, px + dx
                    cy, iy = fy // 2, fy % 2
                    cx, ix = fx // 2, fx % 2
                    i_ph = iy * 2 + ix
                    wb[cy + 1, cx + 1, i_ph * cin:(i_ph + 1) * cin,
                       o_ph * cout:(o_ph + 1) * cout] += wnp[dy + 1, dx + 1]
    return jnp.asarray(wb, w.dtype), jnp.tile(s, 4), jnp.tile(b, 4)


P_S2D = {k: (_w1_s2d(v) if v[0].shape[0] == 1 else _w3_s2d(v))
         for k, v in P.items()}


def s2d_block(x):
    xs = _s2d(x)  # (B, HW/2, HW/2, 4C)
    y1 = cba(xs, P_S2D["cv1"])
    for i in range(N_BN):
        t = cba(y1, P_S2D[f"b{i}a"])
        y1 = y1 + cba(t, P_S2D[f"b{i}b"])
    y2 = cba(xs, P_S2D["cv2"])
    # concat per phase: channels are phase-major (ph*CH..), so concat of the
    # two phase-major tensors then cv3 block-diag must see [y1_ph, y2_ph]
    # per phase.  Build the concat in phase-interleaved order instead:
    c4 = jnp.concatenate(
        [jnp.concatenate([y1[..., p * CH:(p + 1) * CH],
                          y2[..., p * CH:(p + 1) * CH]], -1)
         for p in range(4)], -1)
    return _d2s(cba(c4, P_S2D["cv3"]))


def im2col(x):
    y1 = cba(x, P["cv1"])
    for i in range(N_BN):
        t = cba(y1, P[f"b{i}a"])
        w, s, b = P[f"b{i}b"]
        pt = lax.conv_general_dilated_patches(
            t, (3, 3), (1, 1), "SAME", dimension_numbers=DN)  # (B,H,W,9*CH)
        # patches are channel-major per tap? lax returns (C*kh*kw) with C
        # slowest; reorder weights to match: (kh,kw,cin,cout)->(cin,kh,kw,·)
        wm = w.transpose(2, 0, 1, 3).reshape(9 * CH, CH)
        y = jnp.einsum("bhwk,kc->bhwc", pt, wm,
                       preferred_element_type=jnp.float32)
        y1 = y1 + jax.nn.silu(y * s + b).astype(x.dtype)
    y2 = cba(x, P["cv2"])
    return cba(jnp.concatenate([y1, y2], -1), P["cv3"])


def nchw(x):
    xc = x.transpose(0, 3, 1, 2)

    def cba_c(xx, p):
        w, s, b = p
        dn = lax.conv_dimension_numbers(xx.shape, w.shape[:2] + w.shape[2:],
                                        ("NCHW", "HWIO", "NCHW"))
        y = lax.conv_general_dilated(xx, w, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        return jax.nn.silu(y * s[None, :, None, None]
                           + b[None, :, None, None]).astype(xx.dtype)

    y1 = cba_c(xc, P["cv1"])
    for i in range(N_BN):
        t = cba_c(y1, P[f"b{i}a"])
        y1 = y1 + cba_c(t, P[f"b{i}b"])
    y2 = cba_c(xc, P["cv2"])
    out = cba_c(jnp.concatenate([y1, y2], 1), P["cv3"])
    return out.transpose(0, 2, 3, 1)


CANDS = {"direct": direct, "merged12": merged12, "s2d": s2d_block,
         "im2col": im2col, "nchw": nchw}

# FLOPs of the direct form (for MFU bookkeeping)
FL = B * HW * HW * 2 * (2 * C * CH + N_BN * (CH * CH + 9 * CH * CH) + C * C)


def timed(name, fn):
    @jax.jit
    def loop(x):
        def body(c, _):
            o = fn(x + c * 1e-6)
            return jnp.sum(o.astype(jnp.float32)) * 1e-9, None
        c, _ = lax.scan(body, 0.0, None, length=N_ITER)
        return c

    try:
        ref = np.asarray(direct(X), np.float32)
        got = np.asarray(fn(X), np.float32)
        err = float(np.max(np.abs(ref - got)))
        float(loop(X))  # compile+warm
        t0 = time.time()
        float(loop(X))
        dt = (time.time() - t0) / N_ITER
        print(json.dumps({"cand": name, "ms": round(dt * 1e3, 3),
                          "TF_per_s": round(FL / dt / 1e12, 1),
                          "pct_peak": round(FL / dt / 197e12 * 100, 1),
                          "max_abs_err": err}), flush=True)
    except Exception as e:
        print(json.dumps({"cand": name, "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


for name, fn in CANDS.items():
    timed(name, fn)
