"""Pallas TPU kernel: fused bilinear ROI-align.

The XLA formulation (ops/roi_align.py) materializes the (k, S, W, C)
interpolation intermediate in HBM between its two einsums.  This kernel keeps
the whole pipeline in VMEM: the level's feature map is DMA'd once per grid
row, interpolation matrices are built in-register from iota compares, and the
two matmuls + the n×n bin pooling happen back-to-back on the MXU without
touching HBM.

Grid: (batch, roi_chunks).  Per step the kernel sees one image's full
(H, W, C) map and a chunk of ``kchunk`` ROIs.  VMEM budget (bf16, level-0
worst case H=W=80, C=256, kchunk=4, S=28): F 3.3 MB + rows 4.6 MB + out
0.8 MB ≈ 9 MB.

Falls back to the XLA path on non-TPU backends (interpret mode covers tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(boxes_ref, f_ref, out_ref, *, M: int, n: int, H: int, W: int, C: int,
            spatial_scale: float, aligned: bool, kchunk: int):
    S = M * n
    b = pl.program_id(0)
    c = pl.program_id(1)
    boxes = boxes_ref[b, pl.ds(c * kchunk, kchunk), :].astype(jnp.float32)  # (kchunk, 4)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (kchunk, S), 1).astype(jnp.float32) + 0.5
    ys = y1[:, None] + s_idx * (roi_h / S)[:, None]
    xs = x1[:, None] + s_idx * (roi_w / S)[:, None]

    def interp(coords, size):
        # (kchunk, S) coords → (kchunk·S, size) dense 2-nonzero rows.
        # All mask math in f32: Mosaic can't minor-dim-expand i1 vectors.
        in_range = ((coords > -1.0) & (coords < size)).astype(jnp.float32)
        c = jnp.clip(coords, 0.0, size - 1)
        low = jnp.floor(c)
        lw = c - low
        grid = jax.lax.broadcasted_iota(jnp.int32, (kchunk, S, size), 2).astype(jnp.float32)
        low_b = low[..., None]
        eq_low = (grid == low_b).astype(jnp.float32)
        eq_high = (grid == jnp.minimum(low_b + 1.0, size - 1.0)).astype(jnp.float32)
        w_low = eq_low * ((1.0 - lw) * in_range)[..., None]
        w_high = eq_high * (lw * in_range)[..., None]
        return (w_low + w_high).reshape(kchunk * S, size)

    Wy = interp(ys, H)  # (k·S, H)
    Wx = interp(xs, W).reshape(kchunk, S, W)

    f = f_ref[0].astype(jnp.float32)  # (H, W, C)
    rows = jnp.dot(Wy, f.reshape(H, W * C), preferred_element_type=jnp.float32)
    rows = rows.reshape(kchunk, S, W, C)

    # step 2 per ROI: (S_x, W) @ (W, S_y·C) → transpose back to (y, x) order
    for r in range(kchunk):
        rw = rows[r].transpose(1, 0, 2).reshape(W, S * C)
        vals = jnp.dot(Wx[r], rw, preferred_element_type=jnp.float32)  # (S_x, S_y·C)
        vals = vals.reshape(S, S, C).transpose(1, 0, 2)                # (S_y, S_x, C)
        vals = vals.reshape(M, n, M, n, C)
        out_ref[0, r] = jnp.mean(vals, axis=(1, 3)).astype(out_ref.dtype)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7),
)
def roi_align_pallas(
    features: Array,  # (B, H, W, C)
    boxes: Array,     # (B, K, 4) xyxy
    output_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    kchunk: int = 4,
    interpret: bool = False,
) -> Array:
    """Batched fused ROI-align → (B, K, M, M, C).

    Differentiable w.r.t. ``features``: the backward pass reuses the XLA
    matmul formulation (whose autodiff is the efficient Wyᵀ·g·Wx scatter) —
    Pallas forward, XLA backward.
    """
    return _roi_align_pallas_impl(
        features, boxes, output_size, spatial_scale, sampling_ratio, aligned,
        kchunk, interpret,
    )


def _roi_align_fwd(features, boxes, output_size, spatial_scale, sampling_ratio,
                   aligned, kchunk, interpret):
    out = _roi_align_pallas_impl(
        features, boxes, output_size, spatial_scale, sampling_ratio, aligned,
        kchunk, interpret,
    )
    return out, (features, boxes)


def _roi_align_bwd(output_size, spatial_scale, sampling_ratio, aligned, kchunk,
                   interpret, res, g):
    from .roi_align import roi_align as _xla_roi_align

    features, boxes = res

    def ref(f):
        return jax.vmap(
            lambda ff, bb: _xla_roi_align(
                ff, bb, output_size, spatial_scale=spatial_scale,
                sampling_ratio=sampling_ratio, aligned=aligned,
                chunk=max(kchunk, 32),
            )
        )(f, boxes)

    _, vjp = jax.vjp(ref, features)
    (df,) = vjp(g.astype(features.dtype))
    return df, jnp.zeros_like(boxes)


roi_align_pallas.defvjp(_roi_align_fwd, _roi_align_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned",
                     "kchunk", "interpret"),
)
def _roi_align_pallas_impl(
    features: Array,
    boxes: Array,
    output_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    kchunk: int = 4,
    interpret: bool = False,
) -> Array:
    B, H, W, C = features.shape
    K = boxes.shape[1]
    pad = (-K) % kchunk
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
    Kp = K + pad
    n_chunks = Kp // kchunk
    M = output_size

    out = pl.pallas_call(
        functools.partial(
            _kernel, M=M, n=sampling_ratio, H=H, W=W, C=C,
            spatial_scale=spatial_scale, aligned=aligned, kchunk=kchunk,
        ),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all boxes (tiny), indexed in-kernel
            pl.BlockSpec((1, H, W, C), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kchunk, M, M, C), lambda b, c: (b, c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, M, M, C), features.dtype),
        interpret=interpret,
    )(boxes, features)
    return out[:, :K]

# --------------------------------------------------------------------------
# Multiscale canvas kernel — the mask-branch hot path.
#
# The XLA canvas formulation (ops/roi_align._multiscale_roi_align_canvas)
# materializes a (B, K, M, W0, C) interpolation intermediate in HBM
# (~0.9 GB for the flagship batch-16 mask branch → measured 4.2 ms, entirely
# HBM-bound).  This kernel keeps the whole level canvas resident in VMEM
# across a batch row's ROI chunks and runs both pooled matmuls back-to-back
# on the MXU: per ROI ~94 MF with only the (B, K, M, M, C) output touching
# HBM.  Reference op: torchvision.ops.roi_align multi-level dispatch in
# /root/reference/metayolo/models/yolo_head.py:243,294.


def _canvas_kernel(wy_ref, wx_ref, f_ref, out_ref,
                   *, M: int, Ht: int, W0: int, C: int, kchunk: int):
    """One grid step = one (image, ROI-chunk) pair.

    v3 of this kernel (v1 re-streamed the canvas per chunk; v2 held it for
    one whole image and looped chunks in a ``fori_loop``, which blocked the
    Mosaic pipeline from overlapping chunk DMA with compute).  Here the grid
    is (B, n_chunks) with the canvas block's index map CONSTANT across the
    chunk axis — Mosaic keeps it resident and only streams the small
    Wy/Wx/out blocks — and the canvas arrives pre-reshaped from XLA as
    (Ht, W0·C) so the kernel does no in-VMEM relayout.

    Per step: rows = Wy·F (one fat MXU matmul for the whole chunk), then the
    x-contraction as a single batched ``dot_general`` over the chunk's ROIs.
    """
    wdtype = f_ref.dtype  # matmul inputs; Mosaic accumulates in f32
    wy = wy_ref[0].astype(wdtype)                          # (k, M, Ht)
    wx = wx_ref[0].astype(wdtype)                          # (k, M, W0)
    rows = jnp.dot(
        wy.reshape(kchunk * M, Ht), f_ref[0],
        preferred_element_type=jnp.float32,
    ).astype(wdtype).reshape(kchunk, M, W0, C)
    # out[r, i, j, c] = Σ_w wx[r, j, w] · rows[r, i, w, c]
    vals = jax.lax.dot_general(
        wx, rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # (k, Mj, Mi, C)
    out_ref[0] = vals.transpose(0, 2, 1, 3).astype(out_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
)
def multiscale_roi_align_canvas_pallas(
    features: Tuple[Array, ...],   # per level (B, H_l, W_l, C)
    boxes: Array,                  # (B, K, 4) xyxy image coords
    levels: Array,                 # (B, K) int level per ROI
    strides: Tuple[float, ...],
    output_size: int,
    sampling_ratio: int = 2,
    aligned: bool = False,
    kchunk: int = 16,
    interpret: bool = False,
    version: int = 3,
) -> Array:
    """Fused multiscale ROI-align → (B, K, M, M, C); numerics match the XLA
    canvas path to bf16 rounding (max_abs_err 0.0 at flagship shapes on the
    real chip).  Differentiable w.r.t. ``features`` (the backward pass reuses
    the XLA canvas formulation's autodiff).

    MEASURED NEGATIVE RESULT (tools/roi_lab.py, v5e, B=16 K=100 C=256 M=14):
    xla_canvas 4.15 ms vs pallas k4/k10/k20 = 7.70/7.89/8.54 ms; kchunk=50
    exceeds VMEM (the (kchunk·M, Ht)·(Ht, W0·C) f32 ``rows`` intermediate).
    The per-ROI x-contraction (14×80 matmuls batched over the chunk) can't
    feed the MXU, and holding the canvas resident doesn't make up for it.
    Kept opt-in/off; the XLA canvas path remains the production kernel.

    ``version=4`` swaps in ``_canvas_kernel_v4`` (dense block-diagonal
    x-contraction) — see its docstring for measured numbers."""
    return _canvas_pallas_impl(
        tuple(features), boxes, levels, strides, output_size, sampling_ratio,
        aligned, kchunk, interpret, version,
    )


def _canvas_fwd(features, boxes, levels, strides, output_size, sampling_ratio,
                aligned, kchunk, interpret, version):
    out = _canvas_pallas_impl(
        tuple(features), boxes, levels, strides, output_size, sampling_ratio,
        aligned, kchunk, interpret, version,
    )
    return out, (tuple(features), boxes, levels)


def _canvas_bwd(strides, output_size, sampling_ratio, aligned, kchunk,
                interpret, version, res, g):
    from .roi_align import _multiscale_roi_align_canvas

    features, boxes, levels = res

    def ref(fs):
        return _multiscale_roi_align_canvas(
            fs, boxes, levels, strides, output_size, sampling_ratio, aligned
        )

    _, vjp = jax.vjp(ref, features)
    (dfs,) = vjp(g.astype(features[0].dtype))
    return dfs, jnp.zeros_like(boxes), jnp.zeros_like(levels)


multiscale_roi_align_canvas_pallas.defvjp(_canvas_fwd, _canvas_bwd)


def _canvas_kernel_v4(wy_ref, wx_ref, f_ref, out_ref,
                      *, M: int, Ht: int, W0: int, C: int, kchunk: int):
    """v4: the x-contraction as ONE dense block-diagonal matmul per chunk.

    v3's failure mode was the per-ROI x-contraction: a batched
    ``dot_general`` over the chunk's ROIs lowers in Mosaic to ``kchunk``
    serialized (M, W0)·(W0, M·C) matmuls whose M=14 row tiles can't feed the
    MXU.  Here the chunk's per-ROI Wx matrices are assembled in-register
    into one (kchunk·M, kchunk·W0) block-diagonal operand and the whole
    chunk contracts in a single dense MXU dot against the (kchunk·W0, M·C)
    transposed rows — ``kchunk×`` redundant zeros, but the MXU runs dense
    tiles at peak, which beats issuing tiny matmuls.  Cost: one in-VMEM
    (k, M, W0, C) → (k, W0, M, C) relayout between the two dots.

    MEASURED NEGATIVE RESULT (tools/roi_lab.py, v5e, B=16 K=100 C=256 M=14):
    xla_canvas 4.35 ms vs v4 k4/k8/k16 = 7.80/8.06/9.80 ms — same ballpark
    as v3, so the small per-ROI dots were NOT the bottleneck; the in-VMEM
    relayouts (per-k transposes + block-diag assembly, ~4.6 MB of sublane
    shuffles per grid step) dominate on this Mosaic.  Kept for the record;
    the XLA canvas einsum remains the production kernel.
    """
    wdtype = f_ref.dtype
    wy = wy_ref[0].astype(wdtype)                          # (k, M, Ht)
    wx = wx_ref[0].astype(wdtype)                          # (k, M, W0)
    rows = jnp.dot(
        wy.reshape(kchunk * M, Ht), f_ref[0],
        preferred_element_type=jnp.float32,
    ).astype(wdtype).reshape(kchunk, M, W0, C)
    # (k, M, W0, C) → (k·W0, M·C): per-k 3D transposes (the one relayout
    # between the dots; the 4D transpose form is rejected by this Mosaic)
    rows_t = jnp.concatenate(
        [rows[r].transpose(1, 0, 2).reshape(W0, M * C) for r in range(kchunk)],
        axis=0,
    )
    # block-diagonal Wx assembled by static pad+concat
    wx_bd = jnp.concatenate(
        [jnp.pad(wx[r], ((0, 0), (r * W0, (kchunk - 1 - r) * W0)))
         for r in range(kchunk)],
        axis=0,
    )                                                      # (k·M, k·W0)
    vals = jnp.dot(wx_bd, rows_t, preferred_element_type=jnp.float32)
    vals = vals.reshape(kchunk, M, M, C)                   # (k, Mj, Mi, C)
    out_ref[0] = jnp.stack(
        [vals[r].transpose(1, 0, 2) for r in range(kchunk)], 0
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "aligned",
                     "kchunk", "interpret", "version"),
)
def _canvas_pallas_impl(features, boxes, levels, strides, output_size,
                        sampling_ratio, aligned, kchunk, interpret,
                        version: int = 3):
    from .roi_align import _bounded_interp_matrix

    M, n = output_size, sampling_ratio
    S = M * n
    B, H0, W0, C = features[0].shape
    stacked, metas = [], []
    off = 0
    for f, s in zip(features, strides):
        h, w = f.shape[1:3]
        stacked.append(jnp.pad(f, ((0, 0), (0, 0), (0, W0 - w), (0, 0))))
        metas.append((off, h, w, float(s)))
        off += h
    canvas = jnp.concatenate(stacked, axis=1)
    Ht = off

    # per-ROI sample coords + dense bin-pooled interp matrices, computed once
    # in XLA — identical construction to _multiscale_roi_align_canvas, so the
    # kernel numerics match the einsum path exactly
    meta = jnp.asarray(metas, jnp.float32)
    lv = jnp.clip(levels, 0, len(features) - 1)
    moff, mh, mw = meta[lv, 0], meta[lv, 1], meta[lv, 2]
    scale = 1.0 / meta[lv, 3]
    bf = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x1 = bf[..., 0] * scale - offset
    y1 = bf[..., 1] * scale - offset
    x2 = bf[..., 2] * scale - offset
    y2 = bf[..., 3] * scale - offset
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    s_idx = jnp.arange(S, dtype=jnp.float32) + 0.5
    ys = y1[..., None] + s_idx * (roi_h / S)[..., None] + moff[..., None]
    xs = x1[..., None] + s_idx * (roi_w / S)[..., None]

    cdtype = canvas.dtype if canvas.dtype == jnp.bfloat16 else jnp.float32
    Wy = _bounded_interp_matrix(ys, moff, moff + mh, Ht, M, n).astype(cdtype)
    Wx = _bounded_interp_matrix(xs, jnp.zeros_like(mw), mw, W0, M, n).astype(cdtype)

    K = boxes.shape[1]
    pad = (-K) % kchunk
    if pad:
        Wy = jnp.pad(Wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Wx = jnp.pad(Wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Kp = K + pad
    n_chunks = Kp // kchunk
    canvas2 = canvas.reshape(B, Ht, W0 * C)  # one HBM relayout, outside the kernel

    kern = _canvas_kernel_v4 if version == 4 else _canvas_kernel
    out = pl.pallas_call(
        functools.partial(
            kern, M=M, Ht=Ht, W0=W0, C=C, kchunk=kchunk,
        ),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, kchunk, M, Ht), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kchunk, M, W0), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant across the chunk axis → Mosaic keeps it resident
            pl.BlockSpec((1, Ht, W0 * C), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kchunk, M, M, C),
                               lambda b, c: (b, c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Kp, M, M, C), features[0].dtype),
        # Canvas (~6 MB) + the chunk's f32 rows intermediate are VMEM
        # resident; raise the per-op scoped-vmem budget above XLA's 16 MB
        # default (v5e has 128 MB VMEM/core).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Wy, Wx, canvas2)
    return out[:, :K]
