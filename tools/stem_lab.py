#!/usr/bin/env python3
"""Stem-conv formulation lab: measure every candidate on the real TPU.

The flagship stem (reference ``metayolo/models/layers.py:25-41``,
``Conv(3, 64, 6, 2, 2)``) is the one off-roofline block left in the trunk:
C_in=3 puts 3 of 128 MXU lanes to work.  Candidates measured here, all
computing ``silu(conv6x6/s2(x) * scale + bias)`` at (B,640,640,3)->bf16:

  xla_direct    lax.conv as the model runs it today
  xla_s2d       pad + space-to-depth(2) -> dense 3x3 conv over C_in=12
  xla_im2col    s2d + 9-tap unfold concat (K=108) -> one dot
  pallas_v1     ops/pallas_stem.py whole-image kernel (9 K=12 dots),
                with the scoped-VMEM limit raised via compiler_options
                (its (1,322,322,12) block pads 12->128 lanes = 26.5MB > 16MB)
  pallas_k108   row-block kernel: 3 row-shifted s2d copies, in-kernel 9-tap
                lane-concat -> ONE K=108 MXU dot + fused BN/act
  pallas_dot108 XLA materializes the K=108 im2col; kernel = dot+BN+act only

Prints one JSON line per candidate; failures are caught and reported.
"""
import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", 16))
IMG = int(os.environ.get("IMG", 640))
N_ITER = int(os.environ.get("ITERS", 50))
K, S, P, N = 6, 2, 2, 64
KS = K // S  # dense tap grid after s2d

rng = np.random.default_rng(0)
x_host = rng.uniform(0, 1, (B, IMG, IMG, 3)).astype(np.float32)
w_host = (rng.standard_normal((K, K, 3, N)) * 0.05).astype(np.float32)
scale_host = rng.uniform(0.5, 1.5, (N,)).astype(np.float32)
bias_host = rng.uniform(-0.1, 0.1, (N,)).astype(np.float32)

HOUT = (IMG + 2 * P - K) // S + 1
WOUT = HOUT
HS = HOUT + KS - 1  # s2d rows covering every tap
WS = WOUT + KS - 1


def s2d(x):
    """pad + space-to-depth(S): (B,H,W,3) -> (B,HS,WS,S*S*3) bf16."""
    hp, wp = S * HS, S * WS
    xp = jnp.pad(x, ((0, 0), (P, hp - IMG - P), (P, wp - IMG - P), (0, 0)))
    return (xp.reshape(B, HS, S, WS, S, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, HS, WS, S * S * 3).astype(jnp.bfloat16))


def w_dense():
    """(K,K,3,N) -> (KS,KS,S*S*3,N): the dense tap weights in s2d space."""
    return (jnp.asarray(w_host)
            .reshape(KS, S, KS, S, 3, N)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(KS, KS, S * S * 3, N).astype(jnp.bfloat16))


def w_108():
    return w_dense().reshape(KS * KS * S * S * 3, N)  # tap-major rows


# ---------------------------------------------------------------- candidates
def xla_direct_bf16in(x, w, sc, bi):
    return xla_direct(x.astype(jnp.bfloat16), w, sc, bi)


def xla_direct_nchw(x, w, sc, bi):
    xt = jnp.transpose(x.astype(jnp.bfloat16), (0, 3, 1, 2))
    y = jax.lax.conv_general_dilated(
        xt, w.astype(jnp.bfloat16),
        window_strides=(S, S), padding=[(P, P), (P, P)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)
    y = jax.nn.silu(y * sc[None, :, None, None] + bi[None, :, None, None])
    return jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.bfloat16)


def xla_merged_in(x, w, sc, bi):
    # feed a big-minor-dim (B,H,W*3) array; unmerge in-graph
    xm = x.astype(jnp.bfloat16).reshape(B, IMG, IMG * 3)
    return xla_direct(xm.reshape(B, IMG, IMG, 3), w, sc, bi)


def xla_direct(x, w, sc, bi):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(S, S), padding=[(P, P), (P, P)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jax.nn.silu(y * sc + bi).astype(jnp.bfloat16)


def xla_s2d(x, w, sc, bi):
    xs = s2d(x)
    y = jax.lax.conv_general_dilated(
        xs, w_dense(), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jax.nn.silu(y * sc + bi).astype(jnp.bfloat16)


def xla_im2col(x, w, sc, bi):
    xs = s2d(x)
    cols = jnp.concatenate(
        [xs[:, ky:ky + HOUT, kx:kx + WOUT, :]
         for ky in range(KS) for kx in range(KS)], axis=-1)  # (B,HO,WO,108)
    y = jnp.einsum("bhwk,kn->bhwn", cols, w_108(),
                   preferred_element_type=jnp.float32)
    return jax.nn.silu(y * sc + bi).astype(jnp.bfloat16)


def pallas_v1(x, w, sc, bi):
    from hd_yolo_tpu.ops.pallas_stem import stem_conv_pallas
    return stem_conv_pallas(x, w, sc, bi, stride=S, padding=P, act="silu",
                            out_dtype=jnp.bfloat16)


def _k108_kernel(x0, x1, x2, w_ref, s_ref, b_ref, o_ref, *, bh):
    refs = (x0, x1, x2)
    cs = x0.shape[-1]
    parts = []
    for ky in range(KS):
        xk = refs[ky][0]  # (bh, WS, cs)
        for kx in range(KS):
            p = xk[:, kx:kx + WOUT, :]  # static sublane slice
            parts.append(p.reshape(bh * WOUT, cs))
    a = jnp.concatenate(parts, axis=1)  # (bh*WOUT, 9*cs)
    acc = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    y = jax.nn.silu(acc * s_ref[0] + b_ref[0])
    o_ref[0] = y.reshape(bh, WOUT, o_ref.shape[-1]).astype(o_ref.dtype)


def pallas_k108(x, w, sc, bi, bh=20):
    xs = s2d(x)
    shifts = [xs[:, ky:ky + HOUT] for ky in range(KS)]  # 3x (B,HO,WS,12)
    cs = S * S * 3
    return pl.pallas_call(
        functools.partial(_k108_kernel, bh=bh),
        grid=(B, HOUT // bh),
        in_specs=[pl.BlockSpec((1, bh, WS, cs), lambda b, r: (b, r, 0, 0))
                  for _ in range(KS)] + [
            pl.BlockSpec((KS * KS * cs, N), lambda b, r: (0, 0)),
            pl.BlockSpec((1, N), lambda b, r: (0, 0)),
            pl.BlockSpec((1, N), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, WOUT, N), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HOUT, WOUT, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*shifts, w_108(), sc.astype(jnp.float32)[None],
      bi.astype(jnp.float32)[None])


def _dot108_kernel(c_ref, w_ref, s_ref, b_ref, o_ref, *, bh):
    a = c_ref[0].reshape(bh * WOUT, c_ref.shape[-1])
    acc = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    y = jax.nn.silu(acc * s_ref[0] + b_ref[0])
    o_ref[0] = y.reshape(bh, WOUT, o_ref.shape[-1]).astype(o_ref.dtype)


def pallas_dot108(x, w, sc, bi, bh=20):
    xs = s2d(x)
    cols = jnp.concatenate(
        [xs[:, ky:ky + HOUT, kx:kx + WOUT, :]
         for ky in range(KS) for kx in range(KS)], axis=-1)
    kdim = KS * KS * S * S * 3
    return pl.pallas_call(
        functools.partial(_dot108_kernel, bh=bh),
        grid=(B, HOUT // bh),
        in_specs=[
            pl.BlockSpec((1, bh, WOUT, kdim), lambda b, r: (b, r, 0, 0)),
            pl.BlockSpec((kdim, N), lambda b, r: (0, 0)),
            pl.BlockSpec((1, N), lambda b, r: (0, 0)),
            pl.BlockSpec((1, N), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, WOUT, N), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HOUT, WOUT, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(cols, w_108(), sc.astype(jnp.float32)[None],
      bi.astype(jnp.float32)[None])


# ---------------------------------------------------------------- harness
def run(name, fn, compiler_options=None):
    x = jnp.asarray(x_host)
    w = jnp.asarray(w_host)
    sc, bi = jnp.asarray(scale_host), jnp.asarray(bias_host)

    @functools.partial(jax.jit, compiler_options=compiler_options)
    def loop(x, w, sc, bi):
        def body(c, _):
            y = fn(x + c * 1e-6, w, sc, bi)
            return jnp.sum(y.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N_ITER)
        return c.reshape(1)

    try:
        ref = None
        if name != "xla_direct":  # numerics vs the direct conv
            y_ref = jax.jit(xla_direct)(x, w, sc, bi)
            y = jax.jit(fn, compiler_options=compiler_options)(x, w, sc, bi)
            ref = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                        - y_ref.astype(jnp.float32))))
        float(loop(x, w, sc, bi)[0])
        t0 = time.time()
        float(loop(x, w, sc, bi)[0])
        dt = (time.time() - t0) / N_ITER
        print(json.dumps({"name": name, "ms_per_batch": round(dt * 1e3, 3),
                          "max_abs_err": ref}), flush=True)
        return dt
    except Exception as e:
        msg = " | ".join(ln for ln in str(e).splitlines() if ln)[:1200]
        print(json.dumps({"name": name, "error": f"{type(e).__name__}: {msg}"}),
              flush=True)
        return None


def main():
    todo = os.environ.get("ONLY", "").split(",") if os.environ.get("ONLY") else None
    cands = [
        ("xla_direct", xla_direct, None),
        ("xla_direct_bf16in", xla_direct_bf16in, None),
        ("xla_direct_nchw", xla_direct_nchw, None),
        ("xla_merged_in", xla_merged_in, None),
        ("xla_s2d", xla_s2d, None),
        ("xla_im2col", xla_im2col, None),
        ("pallas_v1", pallas_v1,
         {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("pallas_k108", pallas_k108, None),
        ("pallas_dot108", pallas_dot108, None),
    ]
    for name, fn, opts in cands:
        if todo and name not in todo:
            continue
        run(name, fn, opts)


if __name__ == "__main__":
    main()
