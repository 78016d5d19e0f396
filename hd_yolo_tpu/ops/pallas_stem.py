"""Fused Pallas stem convolution: space-to-depth + KxK/sS conv + BN + act.

The reference network's first layer (``/root/reference/metayolo/models/
layers.py:25-41`` ``Conv(3, 64, 6, 2, 2)`` instantiated by the v5l6 configs)
is pathological for XLA on TPU: C_in=3 forces the conv's contracted dimension
onto 3 of 128 MXU lanes, and measured on v5e the XLA schedule costs ~2.7 ms
per batch-8 at 640 px — ~24x its HBM roofline — regardless of formulation
(im2col, space-to-depth, dot_general all hit the same floor).

This kernel gets the stem to its memory bound by restructuring the problem:

  * XLA pre-step (cheap, fuses with the surrounding graph): pad by ``p``,
    space-to-depth by the stride ``s`` so the strided KxK conv over C_in
    channels becomes a DENSE (K/s)x(K/s) conv over ``s*s*C_in`` channels,
    and rearrange the weights to match.
  * Pallas kernel: the s2d image stays resident in VMEM for all of its
    output row-blocks; each (ky, kx) tap is one MXU matmul of the row-block's
    pixels against the (s*s*C_in, C_out) tap matrix, accumulated in f32.
  * The folded BatchNorm affine (inference running stats) and the activation
    are applied in-register before the single output write — the XLA path
    writes the conv result to HBM and re-reads it for BN+act.

Inference-only (no vjp): training keeps the XLA conv so BN batch stats and
gradients flow through the standard path.  Gated in ``models/layers.py``
(``ConvBnAct``) to ``train=False``, C_in<=4, k%s==0 — i.e. exactly the
yolov5 stem shape family.

STATUS (round 3, measured on the real v5e via tools/stem_lab.py): this
kernel does NOT currently compile on hardware, and the design space has a
wall.  Findings, so the next attempt doesn't re-tread:

  * The whole-image input block (1, 322, 322, 12) lane-pads 12→128 in VMEM
    (Mosaic tiles the two minor dims (8,128)) = 26.5 MB against the 16 MB
    scoped-vmem limit → compile-time OOM; raising the limit via jit
    compiler_options still OOMs at the next allocation.
  * Row-blocked variants keep the padding problem: pallas_call pins its HBM
    operands to default descending layouts, so ANY (…, 12)-minor operand is
    also 10.7× padded in HBM — the XLA prep that materializes it pays the
    padded write bandwidth, eating the win before the kernel runs.
  * A K=108 (all 9 taps in one MXU dot) kernel needs an im2col relayout
    somewhere: materialized by XLA it costs 21-24 ms/batch-16 (measured:
    xla_im2col / pallas_dot108 in stem_lab.py); done in-kernel it is a
    lane-concat of 9×12-lane pieces (~2.5 ms of vector shifts by the vreg
    cost model).
  * Every pure-XLA reformulation (bf16 input, NCHW, merged-minor input,
    s2d conv over C_in=12) lands on the same ~2.7 ms/batch-16 floor; the
    conv cost is intrinsic to XLA's C_in=3 schedule, not input layout.

The remaining viable design is a merged-minor-dim input (B, HS, WS·12)
(clean HBM + VMEM) with in-kernel lane-rotates per tap and 9 K=12 dots —
bounded upside ~1.4 ms/batch-16 (the K=12 dots still waste 116/128 MXU
lanes, measured floor ≈ 1.2 ms).  Parked: the mask branch offered a bigger,
layout-clean win (see ops/pallas_mask_head.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_ACTS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.1),
    "hardswish": jax.nn.hard_swish,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def _stem_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, bh, wout, ks, act):
    """One grid step = one row-block of one image.

    x_ref: (1, Hs, Ws, Cs) — the whole s2d image (constant over the inner
    grid dim, so Pallas DMAs it once per image); w_ref: (ks, ks, Cs, N);
    s_ref/b_ref: (1, N) folded BN scale/bias; o_ref: (1, bh, wout, N).
    """
    r = pl.program_id(1)
    n = w_ref.shape[-1]
    cs = x_ref.shape[-1]
    acc = jnp.zeros((bh * wout, n), jnp.float32)
    for ky in range(ks):
        for kx in range(ks):
            patch = x_ref[0, pl.ds(r * bh + ky, bh), pl.ds(kx, wout), :]
            a = patch.reshape(bh * wout, cs)
            acc = acc + jnp.dot(a, w_ref[ky, kx],
                                preferred_element_type=jnp.float32)
    y = acc * s_ref[0] + b_ref[0]
    y = _ACTS[act](y)
    o_ref[0] = y.reshape(bh, wout, n).astype(o_ref.dtype)


def _device_ok() -> bool:
    """True on a single-chip TPU (incl. the tunneled 'axon' platform).

    Module-level so tests can monkeypatch it and drive the full ConvBnAct
    fast path in interpret mode on CPU."""
    return jax.default_backend() in ("tpu", "axon") and jax.device_count() == 1


def _pick_bh(hout: int, cap: int = 32) -> int:
    for bh in range(min(cap, hout), 0, -1):
        if hout % bh == 0:
            return bh
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("stride", "padding", "act", "out_dtype", "interpret"),
)
def stem_conv_pallas(
    x: Array,
    w: Array,
    scale: Array,
    bias: Array,
    *,
    stride: int,
    padding: int,
    act: str = "silu",
    out_dtype=jnp.bfloat16,
    interpret=None,
) -> Array:
    """act(conv2d(x, w, stride, padding) * scale + bias), NHWC.

    x: (B, H, W, C) any float dtype; w: (K, K, C, N) with K % stride == 0;
    scale/bias: (N,) f32 — the inference BatchNorm folded to an affine.
    """
    if interpret is None:  # trace-time constant: interpret off-TPU (tests)
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, H, W, C = x.shape
    K = w.shape[0]
    s, p = stride, padding
    assert w.shape[1] == K and K % s == 0, (K, s)
    ks = K // s
    hout = (H + 2 * p - K) // s + 1
    wout = (W + 2 * p - K) // s + 1
    n = w.shape[-1]

    # pad so the padded extent is a whole number of s2d cells covering every
    # tap: s2d rows needed = hout + ks - 1
    hp, wp = s * (hout + ks - 1), s * (wout + ks - 1)
    xp = jnp.pad(x, ((0, 0), (p, hp - H - p), (p, wp - W - p), (0, 0)))
    hs, ws = hp // s, wp // s
    # matmul inputs in the model's compute dtype (bf16 in production configs;
    # f32 models keep full precision), f32 accumulation either way
    cdtype = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
    xs = (
        xp.reshape(B, hs, s, ws, s, C)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, hs, ws, s * s * C)
        .astype(cdtype)
    )
    w2 = (
        w.reshape(ks, s, ks, s, C, n)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(ks, ks, s * s * C, n)
        .astype(cdtype)
    )
    bh = _pick_bh(hout)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, bh=bh, wout=wout, ks=ks, act=act),
        grid=(B, hout // bh),
        in_specs=[
            pl.BlockSpec((1, hs, ws, s * s * C), lambda b, r: (b, 0, 0, 0)),
            pl.BlockSpec((ks, ks, s * s * C, n), lambda b, r: (0, 0, 0, 0)),
            pl.BlockSpec((1, n), lambda b, r: (0, 0)),
            pl.BlockSpec((1, n), lambda b, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, wout, n), lambda b, r: (b, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, hout, wout, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, w2, scale.astype(jnp.float32)[None], bias.astype(jnp.float32)[None])
    return out
