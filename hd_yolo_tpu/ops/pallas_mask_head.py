"""Fused Pallas inference mask head: 4×conv3x3 + deconv + logits + select.

The reference mask head (``/root/reference/metayolo/models/yolo_head.py:
123-128``: ``MaskRCNNHeads(256, (256,256,256,256), 1)`` + 2×2/s2 deconv +
1×1 class logits) runs per detection ROI.  At flagship capacity (batch 16 ×
100 ROIs × 14²×256) the XLA path writes every intermediate activation to
HBM — (1600, 14, 14, 256) bf16 = 157 MB per layer, ~1.3 GB of round trips
for a chain that is compute-bound on the MXU.

This kernel keeps one ROI-chunk's entire chain resident in VMEM:

  * grid over ROI chunks of ``g``; the (g, 14, 14, 256) block is read once;
  * each 3×3 conv = 9 shifted (g·196, 256)@(256, 256) MXU dots with f32
    accumulation (layout-clean: 256-lane operands everywhere, none of the
    small-minor-dim pathology that sank the stem kernel — see
    pallas_stem.py);
  * the 2×2/s2 deconv is 4 taps, each one more (g·196, 256)@(256, 256) dot;
  * the per-ROI class-logits column is folded in as a pre-gathered
    (g, 256) vector (``wl_sel``) so the kernel emits the SELECTED mask
    logit per output pixel — the (N, 28, 28, nc) logits/probs tensors never
    exist.

Output is (N, 4, 196) tap-major pre-bias logits; the caller adds the
per-ROI logits bias, applies sigmoid, and de-interleaves to (N, 28, 28)
(a few MB — XLA territory).  Inference-only (no vjp): training keeps the
flax MaskHead so gradients flow through the standard path.

MEASURED VERDICT (tools/maskhead_lab.py, v5e, N=1600 M=14 C=256, r3): the
XLA flax chain runs 11.2 ms/batch (~73% of bf16 peak — the convs fuse and
the intermediates tile well despite the HBM round-trips); this kernel at
g=8 runs 18.9 ms (the in-kernel pad/reshape VPU work per 9-tap loop
dominates), and g≥16 exceeds the default 16 MB scoped-VMEM budget — with
the limit raised it compiles so slowly over the tunnel (>25 min for the
timed loop) that it is unusable in practice.  The XLA path is therefore
the default; bench.py's sacrificial A/B keeps selecting it.  Kept for the
record and for future toolchains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _kernel(x_ref, wf_ref, bf_ref, wd_ref, bd_ref, wl_ref, o_ref, *, g, mm):
    """x (g, M, M, C); wf (4, 9, C, C); bf (4, C); wd (4, C, C); bd (1, C);
    wl (g, C); o (g, 4, M*M)."""
    M = mm
    C = x_ref.shape[-1]
    x = x_ref[...]  # (g, M, M, C)
    cdtype = x.dtype
    for layer in range(4):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((g * M * M, C), jnp.float32)
        for t in range(9):
            ky, kx = divmod(t, 3)
            patch = xp[:, ky:ky + M, kx:kx + M, :].reshape(g * M * M, C)
            acc = acc + jnp.dot(patch, wf_ref[layer, t],
                                preferred_element_type=jnp.float32)
        y = acc.astype(cdtype) + bf_ref[layer][None, :]
        x = jax.nn.relu(y).reshape(g, M, M, C)

    xf = x.reshape(g * M * M, C)
    outs = []
    for d in range(4):
        z = jnp.dot(xf, wd_ref[d], preferred_element_type=jnp.float32)
        z = jax.nn.relu(z.astype(cdtype) + bd_ref[0][None, :])
        # fold the per-ROI selected logits column: (g, M*M, C)·(g, 1, C)
        s = jnp.sum(z.reshape(g, M * M, C).astype(jnp.float32)
                    * wl_ref[...].astype(jnp.float32)[:, None, :], axis=-1)
        outs.append(s)
    o_ref[...] = jnp.stack(outs, axis=1).astype(o_ref.dtype)  # (g, 4, M*M)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def mask_head_pallas(
    pooled: Array,   # (N, M, M, C)
    wf: Array,       # (4, 9, C, C)  stacked fcn kernels, tap-major
    bf: Array,       # (4, C)
    wd: Array,       # (4, C, C)     deconv taps, d = dy*2+dx
    bd: Array,       # (C,)
    wl_sel: Array,   # (N, C)        per-ROI selected logits column
    *,
    g: int = 8,
    interpret=None,
) -> Array:
    """Returns (N, 4, M·M) tap-major selected pre-bias logits, f32."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    N, M, _, C = pooled.shape
    pad = (-N) % g
    if pad:
        pooled = jnp.pad(pooled, ((0, pad), (0, 0), (0, 0), (0, 0)))
        wl_sel = jnp.pad(wl_sel, ((0, pad), (0, 0)))
    n_pad = pooled.shape[0]
    cdtype = pooled.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, mm=M),
        grid=(n_pad // g,),
        in_specs=[
            pl.BlockSpec((g, M, M, C), lambda n: (n, 0, 0, 0)),
            pl.BlockSpec((4, 9, C, C), lambda n: (0, 0, 0, 0)),
            pl.BlockSpec((4, C), lambda n: (0, 0)),
            pl.BlockSpec((4, C, C), lambda n: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda n: (0, 0)),
            pl.BlockSpec((g, C), lambda n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((g, 4, M * M), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4, M * M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the f32 accumulators exceed the default 16 MB scoped-VMEM
            # budget past g=8; v5e has 128 MB physical VMEM per core
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pooled,
        wf.astype(cdtype),
        bf.astype(cdtype),
        wd.astype(cdtype),
        bd.astype(cdtype)[None],
        wl_sel.astype(cdtype),
    )
    return out[:N]


def fused_mask_probs(
    params,          # flax MaskHead param tree
    pooled: Array,   # (N, M, M, C)
    labels: Array,   # (N,) int32 mask-channel index (pre-clamped ≥ 0)
    *,
    g: int = 8,
    interpret=None,
) -> Array:
    """MaskHead → sigmoid → per-ROI channel select, fused.  Returns
    (N, 2M, 2M) f32 probabilities — numerically the flax
    ``sigmoid(MaskHead(x))[..., label]`` chain."""
    N, M, _, C = pooled.shape
    wf = jnp.stack([
        params[f"fcn{i}"]["kernel"].reshape(9, C, C) for i in range(4)
    ])                                                     # (4, 9, C, C)
    bf = jnp.stack([params[f"fcn{i}"]["bias"] for i in range(4)])
    # flax ConvTranspose applies the kernel FLIPPED (impulse-probed):
    # out[2i+dy, 2j+dx] = x[i,j] · k[1−dy, 1−dx]
    wd = params["deconv"]["kernel"][::-1, ::-1].reshape(4, C, C)
    bd = params["deconv"]["bias"]
    wl = params["logits"]["kernel"][0, 0]                  # (C, nc)
    bl = params["logits"]["bias"]                          # (nc,)
    wl_sel = wl.T[labels]                                  # (N, C)
    bl_sel = bl[labels]                                    # (N,)

    o = mask_head_pallas(pooled, wf, bf, wd, bd, wl_sel, g=g,
                         interpret=interpret)              # (N, 4, M·M)
    o = o + bl_sel[:, None, None]
    probs = jax.nn.sigmoid(o)
    # de-interleave taps: (N, dy, dx, i, j) → (N, 2i+dy, 2j+dx)
    probs = probs.reshape(N, 2, 2, M, M).transpose(0, 3, 1, 4, 2)
    return probs.reshape(N, 2 * M, 2 * M)
