"""Swin Transformer backbone — flax/NHWC, MXU-shaped window attention.

Behavioral reference: ``/root/reference/hnet/swin_transformer.py:19-609``
(upstream Microsoft Swin: PatchEmbed → 4 BasicLayers of
SwinTransformerBlocks with alternating W-MSA / SW-MSA, PatchMerging
downsampling, relative-position-biased window attention).

TPU-first notes (SURVEY.md §7.3 hard part #5):
  * window partition is pure reshape/transpose — zero-copy under XLA;
  * attention over (B·nW, win², C) batches lands on the MXU as one batched
    matmul; win²=49 pads to MXU tiles, so windows are merged into the batch
    dim rather than looped;
  * the shifted-window attention mask and relative-position index are
    computed in numpy at trace time and folded as constants;
  * shifts use ``jnp.roll`` (lowered to cheap collective-free slices);
  * stochastic depth (drop-path, linearly ramped over the block sequence) and
    dropout match the upstream regularizers (swin_transformer.py drop_path /
    drop_rate / attn_drop) — active only in train mode with a 'dropout' rng.

Feature maps are returned NHWC at strides {4, 8, 16, 32} for the FPN.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray


def window_partition(x: Array, ws: int) -> Array:
    """(B, H, W, C) → (B·nW, ws, ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(windows: Array, ws: int, H: int, W: int) -> Array:
    """(B·nW, ws, ws, C) → (B, H, W, C)."""
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws−1)² bias table (swin_transformer.py:77-88)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + [ws - 1, ws - 1]
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws², ws²) additive mask for SW-MSA (swin_transformer.py:215-232)."""
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class DropPath(nn.Module):
    """Stochastic depth: zero a residual branch per sample with prob ``rate``
    and rescale survivors (swin_transformer.py DropPath/timm semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.rate <= 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        """x: (B·nW, N=ws², C); mask: (nW, N, N) additive or None."""
        Bn, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(Bn, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0] * scale, k[0], v[0]  # (Bn, h, N, hd)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)  # MXU batched matmul

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: (B, H, W, C), any spatial size.

        Pad/crop lives INSIDE the block, exactly like the reference
        (swin_transformer.py:219-263 SwinTransformerBlock.forward): the
        post-norm1 tensor is zero-padded to window multiples, attention runs
        over the padded grid (shifted windows masked via the padded-grid
        slice trick), then the result is cropped back BEFORE the residual
        add — so pad pixels are fresh zeros every block and the residual
        stream never carries them.  Matching this is what makes the
        ragged-size golden test vs the real reference pass bit-for-bit.
        """
        B, H, W, C = x.shape
        ws = self.window_size
        shift = self.shift_size
        ph, pw = (-H) % ws, (-W) % ws
        Hp, Wp = H + ph, W + pw

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, ws, shift))
        else:
            mask = None
        windows = window_partition(x, ws).reshape(-1, ws * ws, C)
        attn = WindowAttention(C, ws, self.num_heads, attn_drop=self.attn_drop,
                               proj_drop=self.drop_rate, dtype=self.dtype,
                               name="attn")(windows, mask, train=train)
        x = window_reverse(attn.reshape(-1, ws, ws, C), ws, Hp, Wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if ph or pw:
            x = x[:, :H, :W]
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, train=train)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        y = nn.Dense(C, dtype=self.dtype, name="fc2")(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return x + dp(y, train=train)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        if H % 2 or W % 2:  # zero-pad odd sizes (swin_transformer.py:341-343)
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        )
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T/S/B family backbone; returns 4 pyramid features (strides 4-32)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0   # linearly ramped stochastic depth
    drop_rate: float = 0.0        # proj/MLP dropout
    attn_drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        # PatchEmbed
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), dtype=self.dtype, name="patch_embed",
        )(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        outs: List[Array] = []
        dim = self.embed_dim
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        blk_id = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            # window padding happens inside each block (reference semantics)
            ws = self.window_size
            for blk in range(depth):
                x = SwinBlock(
                    dim, heads, ws, shift_size=0 if blk % 2 == 0 else ws // 2,
                    mlp_ratio=self.mlp_ratio, drop_path=dpr[blk_id],
                    drop_rate=self.drop_rate, attn_drop=self.attn_drop_rate,
                    dtype=self.dtype, name=f"stage{stage}_block{blk}",
                )(x, train=train)
                blk_id += 1
            if stage in self.out_indices:
                outs.append(nn.LayerNorm(dtype=self.dtype, name=f"out_norm{stage}")(x))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
        return outs
