"""Device-side batched preprocessing graph.

The reference preprocesses on CPU with OpenCV per sample (resize / pad / HSV
jitter / normalize — ``/root/reference/metayolo/datasets.py:241-245``,
``engines/image_utils.py:598-613``).  On TPU the batch-uniform part moves on
device as one fused XLA graph (the BASELINE.json north star: "resize, pad,
stain normalization … into a batched on-device preprocessing graph"): uint8
tiles stream over PCIe/ICI and everything else happens at HBM bandwidth.

All functions take NHWC batches and are jit/vmap-friendly.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def normalize(images: Array, scale: float = 1.0 / 255.0,
              mean: Optional[Sequence[float]] = None,
              std: Optional[Sequence[float]] = None) -> Array:
    """uint8/float → float32 in [0,1] (optionally standardized)."""
    x = images.astype(jnp.float32) * scale
    if mean is not None:
        x = x - jnp.asarray(mean, jnp.float32)
    if std is not None:
        x = x / jnp.asarray(std, jnp.float32)
    return x


@functools.partial(jax.jit, static_argnames=("size", "method"))
def resize_batch(images: Array, size: Tuple[int, int], method: str = "bilinear") -> Array:
    """Batched resize to (h, w)."""
    B, _, _, C = images.shape
    return jax.image.resize(images, (B, size[0], size[1], C), method=method)


@functools.partial(jax.jit, static_argnames=("size",))
def letterbox_batch(images: Array, size: Tuple[int, int], fill: float = 114 / 255.0):
    """Aspect-preserving resize + center pad (augmentations.py:91-121).

    Returns (padded, gain, (pad_x, pad_y)) — the inverse transform feeds
    ``scale_coords`` for box rescaling back to original frames.
    """
    B, h, w, C = images.shape
    th, tw = size
    gain = min(th / h, tw / w)
    nh, nw = int(round(h * gain)), int(round(w * gain))
    resized = jax.image.resize(images, (B, nh, nw, C), method="bilinear")
    pad_y, pad_x = (th - nh) / 2, (tw - nw) / 2
    top, left = int(round(pad_y - 0.1)), int(round(pad_x - 0.1))
    out = jnp.full((B, th, tw, C), fill, resized.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (0, top, left, 0))
    return out, gain, (pad_x, pad_y)


def _rgb2hsv(x: Array) -> Array:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, -1)
    mn = jnp.min(x, -1)
    df = mx - mn
    dfs = jnp.where(df == 0, 1.0, df)
    h = jnp.where(
        mx == r, (g - b) / dfs % 6.0, jnp.where(mx == g, (b - r) / dfs + 2.0, (r - g) / dfs + 4.0)
    )
    h = jnp.where(df == 0, 0.0, h) / 6.0
    s = jnp.where(mx == 0, 0.0, df / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], -1)


def _hsv2rgb(x: Array) -> Array:
    h, s, v = x[..., 0] * 6.0, x[..., 1], x[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    # select chains, NOT jnp.choose: choose lowers to a per-element gather
    # from the stacked (6, ...) choices — measured ~360 ms for a (16, 640,
    # 640) batch on v5e vs ~2 ms for fused where-selects (VPU elementwise).
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0, jnp.where(i == 1, c1, jnp.where(
            i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))))

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], -1)


def hsv_jitter(images: Array, key: jax.Array, h_gain: float = 0.015,
               s_gain: float = 0.7, v_gain: float = 0.4) -> Array:
    """Per-image random HSV gains (image_utils.py:598-613), batched on device."""
    B = images.shape[0]
    kh, ks, kv = jax.random.split(key, 3)
    rh = jax.random.uniform(kh, (B, 1, 1), minval=-h_gain, maxval=h_gain)
    rs = jax.random.uniform(ks, (B, 1, 1), minval=-s_gain, maxval=s_gain) + 1.0
    rv = jax.random.uniform(kv, (B, 1, 1), minval=-v_gain, maxval=v_gain) + 1.0
    hsv = _rgb2hsv(jnp.clip(images, 0.0, 1.0))
    h = (hsv[..., 0] + rh) % 1.0
    s = jnp.clip(hsv[..., 1] * rs, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * rv, 0.0, 1.0)
    return _hsv2rgb(jnp.stack([h, s, v], -1))


def flips(images: Array, boxes_n: Array, key: jax.Array, p_ud: float = 0.5, p_lr: float = 0.5):
    """Per-image random horizontal/vertical flips of images + normalized xyxy
    boxes (datasets.py:417-427 semantics), batched on device."""
    B = images.shape[0]
    k1, k2 = jax.random.split(key)
    do_lr = jax.random.uniform(k1, (B,)) < p_lr
    do_ud = jax.random.uniform(k2, (B,)) < p_ud

    img_lr = jnp.where(do_lr[:, None, None, None], images[:, :, ::-1], images)
    img = jnp.where(do_ud[:, None, None, None], img_lr[:, ::-1], img_lr)

    sel_lr = do_lr.reshape((-1,) + (1,) * (boxes_n.ndim - 1))
    sel_ud = do_ud.reshape((-1,) + (1,) * (boxes_n.ndim - 1))
    x1, y1, x2, y2 = [boxes_n[..., i] for i in range(4)]
    bx = jnp.where(sel_lr, jnp.stack([1 - x2, y1, 1 - x1, y2], -1),
                   jnp.stack([x1, y1, x2, y2], -1))
    x1, y1, x2, y2 = [bx[..., i] for i in range(4)]
    by = jnp.where(sel_ud, jnp.stack([x1, 1 - y2, x2, 1 - y1], -1), bx)
    return img, by, (do_lr, do_ud)
