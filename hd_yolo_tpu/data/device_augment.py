"""Device-side training augmentation: the host recipe as ONE jitted graph.

The reference augments on CPU worker processes (mosaic assembly + per-tile
HSV/projective/flip chains, ``/root/reference/metayolo/datasets.py:646-724``,
``augmentations.py:124-165``) — sensible when a beefy many-core host feeds a
GPU.  TPU hosts are often thin (this image: ONE core), so the same recipe
host-side caps training at the loader rate (~4-16 img/s measured) while the
chip can step at ~180 img/s.  This module moves the whole per-step recipe
on-device, where it is a fraction of a millisecond of fused XLA:

  host (per step)      fetch cached raw uint8 tiles + padded targets, stack
  device (in the jit)  per-tile scale/translate warp → flips/transpose →
                       k×k batch-internal mosaic → random crop → (mixup) →
                       candidate filter + slot compaction → HSV jitter

Parity with the host pipeline (``data/augment.py``), given the shipped hyp
(degrees=shear=perspective=0 — ``configs/hyp-nuclei.yaml``):

  * geometric warp: exact same parameterization (T·S·C with angle 0,
    augmentations.py:124-165) via separable bilinear resampling on the MXU;
    cv2's constant border 114 reproduced analytically.
  * boxes: linear transform == the host's polygon-accurate recompute under a
    similarity transform; same box_candidates(wh>2, area>0.1, ar<20) filter
    and the same final >10 px small-object rule (dataset._to_padded).
  * 28×28 box-relative GT masks: invariant under scale/translate/flip except
    where the box is CLIPPED (tile edge / crop edge) — there the visible
    window is re-sampled bilinearly, matching the host's re-crop of the
    warped full-res mask to ~bilinear accuracy.
  * mosaic partners are drawn from the BATCH (random permutations) rather
    than the dataset — with shuffled epochs these are the same distribution;
    documented divergence.
  * photometric extras: blur/gray reproduced (p=0.01 each); median-blur and
    CLAHE are host-only (no cheap XLA form; at p=0.01 the effect on the
    recipe is negligible) — documented divergence.

degrees/shear/perspective ≠ 0 is rejected at build time: use the host
pipeline for rotational recipes (the shipped configs never set them).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .preproc import hsv_jitter

Array = jnp.ndarray

_BORDER = 114.0 / 255.0


# --------------------------------------------------------------------- warps
def _affine1d_matrix(S: int, scale: Array, shift: Array) -> Tuple[Array, Array]:
    """Per-image 1-D bilinear resampling matrices for dst = s·(src − S/2) + t.

    Returns (W, inb): W (B, S, S) with out = W @ src_rows, and inb (B, S) the
    in-bounds weight mass per output row — the constant-border term is
    ``(1 − inb) · border`` (exactly cv2.warpPerspective's BORDER_CONSTANT for
    a separable transform).
    """
    o = jnp.arange(S, dtype=jnp.float32)
    src = (o[None, :] - shift[:, None]) / scale[:, None] + S / 2.0  # (B, S)
    i = jnp.arange(S, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - i[None, None, :]))
    return w, w.sum(-1)


def _warp_images(img: Array, scale: Array, tx: Array, ty: Array) -> Array:
    """(B, S, S, C) float in [0,1] → warped, border 114/255.  Two MXU passes."""
    B, S = img.shape[0], img.shape[1]
    wy, ry = _affine1d_matrix(S, scale, ty)
    wx, rx = _affine1d_matrix(S, scale, tx)
    # rows: tmp[b, o, x, c] = Σ_i wy[b, o, i] img[b, i, x, c]
    tmp = jnp.einsum("boi,bixc->boxc", wy, img, preferred_element_type=jnp.float32)
    tmp = tmp + (1.0 - ry)[:, :, None, None] * _BORDER
    out = jnp.einsum("bpx,boxc->bopc", wx, tmp, preferred_element_type=jnp.float32)
    return out + (1.0 - rx)[:, None, :, None] * _BORDER


def _window_resample(masks: Array, lo: Array, hi: Array) -> Array:
    """Re-sample box-relative masks over a fractional sub-window.

    masks (..., M, M); lo/hi (..., 2) = (y, x) window in [0,1] box coords.
    out[j] samples src = (lo + (j+0.5)/M·(hi−lo))·M − 0.5; taps outside the
    original box contribute 0 (mask support is inside the box).  An identity
    window returns the mask bit-exactly.
    """
    M = masks.shape[-1]
    j = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M
    i = jnp.arange(M, dtype=jnp.float32)

    def mat(l, h):  # (...,) → (..., M, M)
        src = (l[..., None] + j * (h - l)[..., None]) * M - 0.5
        return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., :, None] - i))

    wy = mat(lo[..., 0], hi[..., 0])
    wx = mat(lo[..., 1], hi[..., 1])
    out = jnp.einsum("...oi,...ix->...ox", wy, masks)
    return jnp.einsum("...px,...ox->...op", wx, out)


def _clip_boxes_recrop_masks(boxes: Array, masks: Array, S: float):
    """Clip px boxes to [0, S] and re-sample masks to the visible window."""
    c = jnp.stack([
        jnp.clip(boxes[..., 0], 0.0, S), jnp.clip(boxes[..., 1], 0.0, S),
        jnp.clip(boxes[..., 2], 0.0, S), jnp.clip(boxes[..., 3], 0.0, S),
    ], -1)
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    lo = jnp.stack([(c[..., 1] - boxes[..., 1]) / h,
                    (c[..., 0] - boxes[..., 0]) / w], -1)
    hi = jnp.stack([(c[..., 3] - boxes[..., 1]) / h,
                    (c[..., 2] - boxes[..., 0]) / w], -1)
    ident = (lo[..., 0] <= 1e-6) & (lo[..., 1] <= 1e-6) \
        & (hi[..., 0] >= 1.0 - 1e-6) & (hi[..., 1] >= 1.0 - 1e-6)
    res = _window_resample(masks, lo, hi)
    return c, jnp.where(ident[..., None, None], masks, res)


def _box_candidates(b1: Array, b2: Array, wh_thr=2.0, ar_thr=20.0,
                    area_thr=0.1, eps=1e-16) -> Array:
    """augment.box_candidates, vectorized on device."""
    w1, h1 = b1[..., 2] - b1[..., 0], b1[..., 3] - b1[..., 1]
    w2, h2 = b2[..., 2] - b2[..., 0], b2[..., 3] - b2[..., 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


# ------------------------------------------------------------ per-tile chain
def _augment_tiles(key: jax.Array, img: Array, tgts: Dict[str, Dict[str, Array]],
                   hyp: Dict) -> Tuple[Array, Dict[str, Dict[str, Array]]]:
    """One per-tile augmentation chain (train_proc_multi semantics) for a
    (B, S, S, C) float batch + px-coordinate targets; ONE sampled transform
    per image applied to the image and every task's annotations."""
    B, S = img.shape[0], img.shape[1]
    ks, kt, kf1, kf2, ktr, kh, kp = jax.random.split(key, 7)

    sc = float(hyp.get("scale", 0.5))
    tr = float(hyp.get("translate", 0.1))
    s = jax.random.uniform(ks, (B,), minval=1.0 - sc, maxval=1.0 + sc)
    t = jax.random.uniform(kt, (B, 2), minval=(0.5 - tr) * S,
                           maxval=(0.5 + tr) * S)
    tx, ty = t[:, 0], t[:, 1]

    img = _warp_images(img, s, tx, ty)

    do_lr = jax.random.uniform(kf1, (B,)) < float(hyp.get("fliplr", 0.5))
    do_ud = jax.random.uniform(kf2, (B,)) < float(hyp.get("flipud", 0.5))
    do_tp = jax.random.uniform(ktr, (B,)) < float(hyp.get("transpose", 0.0))

    img = jnp.where(do_lr[:, None, None, None], img[:, :, ::-1], img)
    img = jnp.where(do_ud[:, None, None, None], img[:, ::-1], img)
    img = jnp.where(do_tp[:, None, None, None], jnp.swapaxes(img, 1, 2), img)

    out = {}
    for task, tg in tgts.items():
        b0 = tg["boxes"]                                # (B, T, 4) px, pre-warp
        # dst = s·(src − S/2) + t, per axis (projective_matrix, angle 0)
        c = jnp.stack([
            s[:, None] * (b0[..., 0] - S / 2) + tx[:, None],
            s[:, None] * (b0[..., 1] - S / 2) + ty[:, None],
            s[:, None] * (b0[..., 2] - S / 2) + tx[:, None],
            s[:, None] * (b0[..., 3] - S / 2) + ty[:, None],
        ], -1)
        clipped, masks = _clip_boxes_recrop_masks(c, tg["masks"], float(S))
        keep = _box_candidates(b0, clipped)

        lr = do_lr[:, None]
        ud = do_ud[:, None]
        tp = do_tp[:, None]
        x1, y1, x2, y2 = [clipped[..., i] for i in range(4)]
        x1, x2 = jnp.where(lr, S - x2, x1), jnp.where(lr, S - x1, x2)
        y1, y2 = jnp.where(ud, S - y2, y1), jnp.where(ud, S - y1, y2)
        masks = jnp.where(lr[..., None, None], masks[..., :, ::-1], masks)
        masks = jnp.where(ud[..., None, None], masks[..., ::-1, :], masks)
        bx = jnp.stack([jnp.where(tp, y1, x1), jnp.where(tp, x1, y1),
                        jnp.where(tp, y2, x2), jnp.where(tp, x2, y2)], -1)
        masks = jnp.where(tp[..., None, None], jnp.swapaxes(masks, -1, -2), masks)

        out[task] = {
            "boxes": bx, "labels": tg["labels"], "masks": masks,
            "valid": tg["valid"] & keep, "active": tg["active"],
        }

    # photometric extras (augmentations.py:24-31): 3×3 blur + gray, p each
    p_ph = float(hyp.get("photometric", 0.0))
    if p_ph > 0:
        kb, kg = jax.random.split(kp)
        do_b = jax.random.uniform(kb, (B,)) < p_ph
        blur = _box_blur3(img)
        img = jnp.where(do_b[:, None, None, None], blur, img)
        do_g = jax.random.uniform(kg, (B,)) < p_ph
        gray = (img * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
        img = jnp.where(do_g[:, None, None, None],
                        jnp.broadcast_to(gray, img.shape), img)

    img = hsv_jitter(img, kh, float(hyp.get("hsv_h", 0.015)),
                     float(hyp.get("hsv_s", 0.7)), float(hyp.get("hsv_v", 0.4)))
    return img, out


def _box_blur3(img: Array) -> Array:
    """cv2.blur(img, (3,3)) with edge replication, separable."""
    p = jnp.pad(img, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    v = (p[:, :-2] + p[:, 1:-1] + p[:, 2:]) / 3.0
    p = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    return (p[:, :, :-2] + p[:, :, 1:-1] + p[:, :, 2:]) / 3.0


# ----------------------------------------------------------------- top level
def _compact(tg: Dict[str, Array], T: int, S: float) -> Dict[str, Array]:
    """Reduce overfull target slots to T, largest-first among valid; zero the
    padded slots (CIoU sanitization invariant: padded GT carries zero-wh)."""
    b = tg["boxes"]
    area = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]) / (S * S)
    score = tg["valid"].astype(jnp.float32) * (1.0 + jnp.clip(area, 0.0, 1.0))
    order = jnp.argsort(-score, axis=-1)[..., :T]                  # (B, T)
    take = lambda a: jnp.take_along_axis(  # noqa: E731
        a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1)
    valid = take(tg["valid"][..., None])[..., 0]
    boxes = jnp.where(valid[..., None], take(tg["boxes"]), 0.0)
    masks = jnp.where(valid[..., None, None], take(tg["masks"]), 0.0)
    labels = jnp.where(valid, take(tg["labels"][..., None])[..., 0], 0)
    return {"boxes": boxes, "labels": labels, "masks": masks,
            "valid": valid, "active": tg["active"]}


def _concat_tasks(parts) -> Dict[str, Array]:
    cat = {k: jnp.concatenate([p[k] for p in parts], axis=1)
           for k in ("boxes", "labels", "masks", "valid")}
    cat["active"] = functools.reduce(jnp.logical_or, [p["active"] for p in parts])
    return cat


def make_device_augment(hyp: Dict, k_mosaic: int = 2):
    """Build ``augment(key, batch) -> batch`` running the train recipe on
    device.  ``batch`` is the raw-mode loader schema: image (B, S, S, 3)
    uint8/float, targets {task: {boxes (normalized xyxy), labels, masks
    (T, 28, 28), valid, active}}; the output image is float32 in [0,1]
    (pre-normalized — ``Model.trunk`` leaves floats untouched)."""
    for k in ("degrees", "shear", "perspective"):
        if float(hyp.get(k, 0.0)) != 0.0:
            raise ValueError(
                f"device augmentation supports the separable recipe only; "
                f"hyp[{k!r}]={hyp[k]} needs the host pipeline")
    if k_mosaic not in (1, 2):
        raise ValueError(f"k_mosaic={k_mosaic} not supported on device (1 or 2)")
    hyp = dict(hyp)

    def augment(key: jax.Array, batch: Dict) -> Dict:
        img = batch["image"]
        if jnp.issubdtype(img.dtype, jnp.integer):
            img = img.astype(jnp.float32) / 255.0
        B, S = img.shape[0], img.shape[1]
        tgts0 = batch["targets"]
        T = next(iter(tgts0.values()))["boxes"].shape[1]
        # normalized → px
        tgts0 = {t: {**tg, "boxes": tg["boxes"] * S} for t, tg in tgts0.items()}

        if k_mosaic == 1:
            key, kt = jax.random.split(key)
            img, tgts = _augment_tiles(kt, img, tgts0, hyp)
            merged = {t: tgts[t] for t in tgts}
            out_img = img
        else:
            # 2×2 batch-internal mosaic: quadrant 0 is the batch itself (every
            # image anchors one mosaic per step — the epoch-coverage property
            # of the host sampler), partners are random permutations.
            keys = jax.random.split(key, 10)
            key = keys[0]
            quads_img, quads_tgt = [], []
            for q in range(4):
                if q == 0:
                    gi, gt = img, tgts0
                else:
                    perm = jax.random.permutation(keys[q], B)
                    gi = img[perm]
                    gt = {t: {k: v[perm] for k, v in tg.items()}
                          for t, tg in tgts0.items()}
                wi, wt = _augment_tiles(keys[4 + q], gi, gt, hyp)
                oy, ox = (q // 2) * S, (q % 2) * S
                off = jnp.asarray([ox, oy, ox, oy], jnp.float32)
                wt = {t: {**tg, "boxes": tg["boxes"] + off} for t, tg in wt.items()}
                quads_img.append(wi)
                quads_tgt.append(wt)
            canvas = jnp.concatenate([
                jnp.concatenate(quads_img[0:2], axis=2),
                jnp.concatenate(quads_img[2:4], axis=2),
            ], axis=1)                                             # (B, 2S, 2S, C)
            merged = {t: _concat_tasks([qt[t] for qt in quads_tgt])
                      for t in tgts0}

            # random S-crop (datasets.py:697-712)
            kc, key = jax.random.split(keys[9])
            yx0 = jax.random.randint(kc, (B, 2), 0, S + 1)
            out_img = jax.vmap(
                lambda c, yx: jax.lax.dynamic_slice(
                    c, (yx[0], yx[1], 0), (S, S, c.shape[-1]))
            )(canvas, yx0)
            for t, tg in merged.items():
                off = jnp.stack([yx0[:, 1], yx0[:, 0], yx0[:, 1], yx0[:, 0]],
                                -1).astype(jnp.float32)[:, None, :]
                moved = tg["boxes"] - off
                clipped, masks = _clip_boxes_recrop_masks(moved, tg["masks"], float(S))
                w = clipped[..., 2] - clipped[..., 0]
                h = clipped[..., 3] - clipped[..., 1]
                a0 = jnp.maximum((moved[..., 2] - moved[..., 0])
                                 * (moved[..., 3] - moved[..., 1]), 1e-9)
                vis = (w * h / a0 > 0.1) & (w > 2) & (h > 2)
                merged[t] = {**tg, "boxes": clipped, "masks": masks,
                             "valid": tg["valid"] & vis}

        # mixup (Beta(32,32) blend of two mosaics, augmentations.py:271-276)
        p_mix = float(hyp.get("mixup", 0.0))
        if p_mix > 0:
            km1, km2, km3 = jax.random.split(key, 3)
            perm = jax.random.permutation(km1, B)
            lam = jax.random.beta(km2, 32.0, 32.0, (B,))
            do = jax.random.uniform(km3, (B,)) < p_mix
            lam = jnp.where(do, lam, 1.0)
            out_img = lam[:, None, None, None] * out_img \
                + (1 - lam)[:, None, None, None] * out_img[perm]
            for t, tg in merged.items():
                other = {k: v[perm] for k, v in tg.items()}
                other["valid"] = other["valid"] & do[:, None]
                other["active"] = tg["active"]
                merged[t] = _concat_tasks([tg, other])

        # final small-object rule (dataset._to_padded) + compaction + norm
        out_t = {}
        for t, tg in merged.items():
            w = tg["boxes"][..., 2] - tg["boxes"][..., 0]
            h = tg["boxes"][..., 3] - tg["boxes"][..., 1]
            tg = {**tg, "valid": tg["valid"] & (w > 10) & (h > 10)}
            tg = _compact(tg, T, float(S))
            out_t[t] = {**tg, "boxes": tg["boxes"] / S}
        return {"image": jnp.clip(out_img, 0.0, 1.0), "targets": out_t}

    return augment
