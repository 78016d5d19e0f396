"""NN building blocks — flax/NHWC re-designs of the reference layer zoo.

Behavioral reference: ``/root/reference/metayolo/models/layers.py:25-332``
(Conv, DWConv, Bottleneck(CSP), C3 family, SPP(F), Focus, Ghost*, Contract,
Expand, Concat, CrossConv, MixConv2d, TransformerBlock) and
``activations.py:106-127``.

TPU-first choices:
  * NHWC layout (XLA's native conv layout on TPU — feeds the MXU directly).
  * Parameters stored float32, compute in a configurable ``dtype`` (bf16 by
    default in training/inference configs) — no AMP machinery needed.
  * BatchNorm uses the reference's production constants (eps=1e-3,
    momentum=0.03 → flax momentum 0.97, see ``utils_torch.py:42-51``).
    SyncBatchNorm (ref ``train.py:281-283`` convert_sync_batchnorm) needs no
    wiring here: under ``jit`` over a mesh with the batch axis sharded, the
    BN mean/var reductions are GLOBAL — XLA inserts the cross-chip
    collectives — so batch stats are synchronized by construction
    (regression-tested on an 8-device mesh in tests/test_train.py).
  * ``Focus`` is expressed as space-to-depth + conv so XLA folds it into one
    convolution.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray
Dtype = Any

BN_MOMENTUM = 0.97  # = 1 - torch 0.03
BN_EPS = 1e-3


def _pair(x) -> Tuple[int, int]:
    return (x, x) if isinstance(x, int) else tuple(x)


def autopad(k: Union[int, Sequence[int]], p=None):
    """'same' padding for odd kernels (reference layers.py:18-22)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    return p


# --- activations (reference activations.py) ---------------------------------


def mish(x: Array) -> Array:
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTIVATIONS: dict = {
    True: jax.nn.silu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.1),
    "hardswish": jax.nn.hard_swish,
    "mish": mish,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    False: lambda x: x,
    None: lambda x: x,
    "identity": lambda x: x,
}


def get_activation(act: Union[bool, str, Callable, None]) -> Callable[[Array], Array]:
    if callable(act) and not isinstance(act, bool):
        return act
    if act in _ACTIVATIONS:
        return _ACTIVATIONS[act]
    raise ValueError(f"unknown activation {act!r}")


# --- core conv blocks --------------------------------------------------------


class ConvBnAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation — the reference ``Conv``.

    args mirror layers.py:25-41; NHWC in/out.
    """

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    stride: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None
    groups: int = 1
    act: Union[bool, str] = True
    dtype: Dtype = jnp.float32

    def _stem_fastpath_ok(self, x: Array, k, p, train: bool) -> bool:
        """Gate for the fused Pallas stem kernel (ops/pallas_stem.py).

        The C_in<=4 first conv is the one conv XLA schedules badly on TPU
        (2.7 ms/batch-8 at 640px ≈ 24x roofline — the 3-channel contracted
        dim wastes 125/128 MXU lanes).  Inference-only: training keeps the
        XLA conv so BN batch stats/grads flow through the standard path.
        OPT-IN (HDYOLO_PALLAS_STEM=1): a Mosaic rejection surfaces at the
        caller's jit compile, so production entry points enable it behind
        a fallback (bench.py tries it in a sacrificial subprocess)."""
        import os

        if os.environ.get("HDYOLO_PALLAS_STEM", "0") != "1":
            return False
        if train or self.is_initializing() or self.groups != 1:
            return False
        from ..ops.pallas_stem import _ACTS, _device_ok

        if not _device_ok():
            return False
        s = _pair(self.stride)
        act_key = self.act if not isinstance(self.act, bool) else (
            "silu" if self.act else "identity")

        return (
            x.ndim == 4
            and x.shape[-1] <= 4
            and k[0] == k[1] and s[0] == s[1] and p[0] == p[1]
            and k[0] % s[0] == 0
            and k[0] >= s[0] > 1
            and isinstance(act_key, str) and act_key in _ACTS
            and self.has_variable("params", "conv")
            and self.has_variable("batch_stats", "bn")
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = _pair(self.kernel_size)
        p = autopad(self.kernel_size, self.padding)
        p = _pair(p)
        if self._stem_fastpath_ok(x, k, p, train):
            from ..ops.pallas_stem import stem_conv_pallas

            v = self.variables
            w = v["params"]["conv"]["kernel"].astype(jnp.float32)
            bnp, bns = v["params"]["bn"], v["batch_stats"]["bn"]
            inv = bnp["scale"].astype(jnp.float32) * jax.lax.rsqrt(
                bns["var"].astype(jnp.float32) + BN_EPS)
            bias = bnp["bias"].astype(jnp.float32) - bns["mean"].astype(jnp.float32) * inv
            act_key = self.act if not isinstance(self.act, bool) else (
                "silu" if self.act else "identity")
            return stem_conv_pallas(
                x, w, inv, bias,
                stride=_pair(self.stride)[0], padding=p[0], act=act_key,
                out_dtype=self.dtype,
            )
        x = nn.Conv(
            self.out_channels,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=[(p[0], p[0]), (p[1], p[1])],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            axis_name=None,
            name="bn",
        )(x)
        return get_activation(self.act)(x)


class DWConv(nn.Module):
    """Depthwise-ish conv: groups = gcd(c_in, c_out) (layers.py:44-48)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    act: Union[bool, str] = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        g = math.gcd(x.shape[-1], self.out_channels)
        return ConvBnAct(
            self.out_channels, self.kernel_size, self.stride, groups=g, act=self.act, dtype=self.dtype
        )(x, train)


class Bottleneck(nn.Module):
    """1x1 → 3x3 with optional residual (layers.py:87-97)."""

    out_channels: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.out_channels * self.expansion)
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        y = ConvBnAct(self.out_channels, 3, 1, groups=self.groups, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            return x + y
        return y


class BottleneckCSP(nn.Module):
    """CSP bottleneck, original formulation (layers.py:100-116)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.out_channels * self.expansion)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.groups, 1.0, dtype=self.dtype)(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(y)
        y = jax.nn.silu(y)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype)(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (layers.py:119-131).

    Inference fast path: cv1 and cv2 are two 1x1 convs over the SAME input
    whose bottleneck width c_ is 64 on the early flagship stages — each
    wastes half of the MXU's 128 contraction lanes and half of every bf16
    HBM tile.  tools/c3_lab.py measured running them as ONE conv with
    concatenated output channels (then split) at 3.55 -> 3.18 ms for the
    160x160 C3(128, n=3) block on v5e, numerics exact; the same transform
    applies to every C3 in the network.  BN/act stay per-branch with the
    exact flax op order, so only the conv itself is reformulated.  Training
    keeps the two-conv path (per-branch batch-stat updates).  Kill switch:
    HDYOLO_NO_MERGED_CSP=1.
    """

    out_channels: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    def inner(self, c_: int):
        return [Bottleneck(c_, self.shortcut, self.groups, 1.0, dtype=self.dtype) for _ in range(self.n)]

    def _merged12_ok(self, train: bool) -> bool:
        import os

        if train or self.is_initializing():
            return False
        if os.environ.get("HDYOLO_NO_MERGED_CSP", "0") == "1":
            return False
        return (
            self.has_variable("params", "cv1")
            and self.has_variable("params", "cv2")
            and self.has_variable("batch_stats", "cv1")
            and self.has_variable("batch_stats", "cv2")
        )

    def _merged12(self, x: Array, c_: int) -> Tuple[Array, Array]:
        """One 1x1 conv for cv1+cv2 (output channels concatenated), split."""
        v = self.variables
        k = jnp.concatenate(
            [v["params"]["cv1"]["conv"]["kernel"], v["params"]["cv2"]["conv"]["kernel"]],
            axis=-1,
        ).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

        def bn_act(yb: Array, name: str) -> Array:
            # replicate flax BatchNorm(use_running_average=True) op order
            p, s = v["params"][name]["bn"], v["batch_stats"][name]["bn"]
            dt = self.dtype
            mul = jax.lax.rsqrt(s["var"].astype(dt) + BN_EPS) * p["scale"].astype(dt)
            yb = (yb.astype(dt) - s["mean"].astype(dt)) * mul + p["bias"].astype(dt)
            return jax.nn.silu(yb)

        return bn_act(y[..., :c_], "cv1"), bn_act(y[..., c_:], "cv2")

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.out_channels * self.expansion)
        if self._merged12_ok(train):
            y1, y2 = self._merged12(x, c_)
        else:
            y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
            y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for m in self.inner(c_):
            y1 = m(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv3")(y, train)


class TransformerBlock(nn.Module):
    """ViT-style block on flattened feature map (layers.py:51-84; LayerNorm-free)."""

    out_channels: int
    num_heads: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if x.shape[-1] != self.out_channels:
            x = ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype)(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(c, dtype=self.dtype, name="pos")(p)  # learnable position embedding
        for i in range(self.num_layers):
            q = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"q{i}")(p)
            k = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"k{i}")(p)
            v = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"v{i}")(p)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype, name=f"ma{i}"
            )(q, k, v)
            p = a + p
            f = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"fc1_{i}")(p)
            f = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"fc2_{i}")(f)
            p = f + p
        return p.reshape(b, h, w, c)


class C3TR(C3):
    """C3 with a TransformerBlock inner (layers.py:134-139)."""

    def inner(self, c_: int):
        return [TransformerBlock(c_, 4, self.n, dtype=self.dtype)]


class SPP(nn.Module):
    """Spatial pyramid pooling (layers.py:158-171)."""

    out_channels: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype)(x, train)
        pools = [
            nn.max_pool(x, (k, k), strides=(1, 1), padding="SAME") for k in self.kernel_sizes
        ]
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype)(
            jnp.concatenate([x] + pools, axis=-1), train
        )


class C3SPP(C3):
    def inner(self, c_: int):
        return [SPP(c_, dtype=self.dtype)]


class SPPF(nn.Module):
    """Fast SPP: 3 chained same-k pools ≡ SPP(5,9,13) (layers.py:174-189)."""

    out_channels: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = x.shape[-1] // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        k = self.kernel_size
        y1 = nn.max_pool(x, (k, k), strides=(1, 1), padding="SAME")
        y2 = nn.max_pool(y1, (k, k), strides=(1, 1), padding="SAME")
        y3 = nn.max_pool(y2, (k, k), strides=(1, 1), padding="SAME")
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class Focus(nn.Module):
    """Space-to-depth 2x + conv (layers.py:192-202)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    act: Union[bool, str] = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # match the reference channel order: (::2,::2), (1::2,::2), (::2,1::2), (1::2,1::2)
        # with NCHW's [..., y, x] → NHWC's [:, y, x, :]
        patches = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return ConvBnAct(
            self.out_channels, self.kernel_size, self.stride, self.padding, self.groups, self.act, self.dtype
        )(patches, train)


class GhostConv(nn.Module):
    """Ghost convolution (layers.py:205-215)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    act: Union[bool, str] = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = self.out_channels // 2
        y = ConvBnAct(c_, self.kernel_size, self.stride, None, self.groups, self.act, self.dtype)(x, train)
        y2 = ConvBnAct(c_, 5, 1, None, c_, self.act, self.dtype)(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """(layers.py:218-233)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = self.out_channels // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype)(x, train)
        if self.stride == 2:
            y = DWConv(c_, self.kernel_size, self.stride, act=False, dtype=self.dtype)(y, train)
        y = GhostConv(self.out_channels, 1, 1, act=False, dtype=self.dtype)(y, train)
        if self.stride == 2:
            s = DWConv(x.shape[-1], self.kernel_size, self.stride, act=False, dtype=self.dtype)(x, train)
            s = ConvBnAct(self.out_channels, 1, 1, act=False, dtype=self.dtype)(s, train)
        else:
            s = x if x.shape[-1] == self.out_channels else 0.0 * y  # identity needs matching ch
        return y + s


class C3Ghost(C3):
    def inner(self, c_: int):
        return [GhostBottleneck(c_, dtype=self.dtype) for _ in range(self.n)]


class CrossConv(nn.Module):
    """(1,k)+(k,1) factored conv (layers.py:274-285)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    expansion: float = 1.0
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c_ = int(self.out_channels * self.expansion)
        y = ConvBnAct(c_, (1, self.kernel_size), (1, self.stride), dtype=self.dtype)(x, train)
        y = ConvBnAct(
            self.out_channels, (self.kernel_size, 1), (self.stride, 1), groups=self.groups, dtype=self.dtype
        )(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            return x + y
        return y


class Contract(nn.Module):
    """Space-to-depth by ``gain`` (layers.py:236-247)."""

    gain: int = 2

    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h/s, w/s, s, s, c
        return x.reshape(b, h // s, w // s, s * s * c)


class Expand(nn.Module):
    """Depth-to-space by ``gain`` (layers.py:250-261)."""

    gain: int = 2

    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h, w, s, s, c // (s * s))
        x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, s, w, s, c/s²
        return x.reshape(b, h * s, w * s, c // (s * s))


class Concat(nn.Module):
    """Channel concat of multiple inputs (layers.py:264-271)."""

    def __call__(self, xs: Sequence[Array], train: bool = False) -> Array:
        return jnp.concatenate(list(xs), axis=-1)


class Upsample(nn.Module):
    """Nearest-neighbor upsample (replaces ``nn.Upsample`` rows in configs)."""

    scale: int = 2
    method: str = "nearest"

    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        if self.method == "nearest":
            return jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)
        return jax.image.resize(x, (b, h * self.scale, w * self.scale, c), method=self.method)


class MaxPool2d(nn.Module):
    """``nn.MaxPool2d`` rows in legacy hub configs (yolov3-tiny backbone).

    torch semantics: kernel ``k``, stride ``s``, symmetric padding ``p``
    (pad value −inf so padded cells never win).
    """

    kernel: int = 2
    stride: int = 2
    padding: int = 0

    def __call__(self, x: Array, train: bool = False) -> Array:
        k, s, p = int(self.kernel), int(self.stride), int(self.padding)
        return nn.max_pool(
            x, (k, k), strides=(s, s), padding=[(p, p), (p, p)]
        )


class ZeroPad2d(nn.Module):
    """``nn.ZeroPad2d`` rows in legacy hub configs: (left, right, top, bottom)
    spatial zero-padding, NHWC."""

    pads: Tuple[int, int, int, int] = (0, 0, 0, 0)

    def __call__(self, x: Array, train: bool = False) -> Array:
        l, r, t, b = (int(v) for v in self.pads)
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class BatchNorm2d(nn.Module):
    """Standalone BatchNorm row (yolov5.py:133-134)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x)


class MixConv2d(nn.Module):
    """Mixed depthwise kernels (layers.py:309-331), equal_ch strategy."""

    out_channels: int
    kernel_sizes: Tuple[int, ...] = (1, 3)
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n = len(self.kernel_sizes)
        idx = jnp.floor(jnp.linspace(0, n - 1e-6, self.out_channels))
        splits = [int((idx == g).sum()) for g in range(n)]
        outs = []
        for i, (k, c_) in enumerate(zip(self.kernel_sizes, splits)):
            g = math.gcd(x.shape[-1], c_)
            outs.append(
                nn.Conv(
                    c_, (k, k), strides=(self.stride, self.stride),
                    padding=[(k // 2, k // 2)] * 2, feature_group_count=g,
                    use_bias=False, dtype=self.dtype, name=f"m{i}",
                )(x)
            )
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(y)
        return jax.nn.silu(y)
