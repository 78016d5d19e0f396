"""ROI-align parity vs a scalar numpy port of torchvision's exact algorithm."""

import numpy as np
import jax
import jax.numpy as jnp

from hd_yolo_tpu.ops import roi_align, multiscale_roi_align


def np_bilinear(f, y, x):
    H, W = f.shape[:2]
    if y <= -1.0 or y >= H or x <= -1.0 or x >= W:
        return np.zeros(f.shape[2:], f.dtype)
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    yl, xl = int(np.floor(y)), int(np.floor(x))
    yh, xh = min(yl + 1, H - 1), min(xl + 1, W - 1)
    ly, lx = y - yl, x - xl
    return (
        (1 - ly) * (1 - lx) * f[yl, xl]
        + (1 - ly) * lx * f[yl, xh]
        + ly * (1 - lx) * f[yh, xl]
        + ly * lx * f[yh, xh]
    )


def np_roi_align(f, boxes, M, scale, n, aligned=False):
    K = len(boxes)
    out = np.zeros((K, M, M) + f.shape[2:], np.float64)
    off = 0.5 if aligned else 0.0
    for k, (x1, y1, x2, y2) in enumerate(boxes):
        sx1, sy1, sx2, sy2 = x1 * scale - off, y1 * scale - off, x2 * scale - off, y2 * scale - off
        rw, rh = sx2 - sx1, sy2 - sy1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / M, rh / M
        for i in range(M):
            for j in range(M):
                acc = 0.0
                for iy in range(n):
                    for ix in range(n):
                        y = sy1 + i * bh + (iy + 0.5) * bh / n
                        x = sx1 + j * bw + (ix + 0.5) * bw / n
                        acc = acc + np_bilinear(f, y, x)
                out[k, i, j] = acc / (n * n)
    return out


def test_roi_align_matches_torchvision_algorithm(rng):
    H, W, C = 24, 32, 3
    f = rng.standard_normal((H, W, C)).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 20.0, 16.0],
            [0.0, 0.0, 31.0, 23.0],
            [10.5, 3.25, 14.75, 9.5],  # fractional
            [30.0, 22.0, 40.0, 30.0],  # spills outside
            [5.0, 5.0, 5.2, 5.2],  # tiny → min-size-1 clamp path
        ],
        np.float32,
    )
    for scale in (1.0, 0.5):
        got = np.asarray(roi_align(jnp.asarray(f), jnp.asarray(boxes), 7, spatial_scale=scale))
        want = np_roi_align(f, boxes, 7, scale, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_aligned_mode(rng):
    f = rng.standard_normal((16, 16, 2)).astype(np.float32)
    boxes = np.array([[2.0, 2.0, 12.0, 14.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(f), jnp.asarray(boxes), 4, aligned=True))
    want = np_roi_align(f, boxes, 4, 1.0, 2, aligned=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_chunking_consistent(rng):
    f = rng.standard_normal((16, 16, 4)).astype(np.float32)
    xy = rng.uniform(0, 10, (150, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + rng.uniform(2, 6, (150, 2))], -1).astype(np.float32)
    a = np.asarray(roi_align(jnp.asarray(f), jnp.asarray(boxes), 5, chunk=256))
    b = np.asarray(roi_align(jnp.asarray(f), jnp.asarray(boxes), 5, chunk=32))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_multiscale_roi_align_selects_level(rng):
    C = 4
    feats = [
        jnp.asarray(rng.standard_normal((32, 32, C)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((16, 16, C)).astype(np.float32)),
    ]
    strides = [8.0, 16.0]
    boxes = np.array([[16.0, 16.0, 100.0, 100.0], [8.0, 8.0, 200.0, 200.0]], np.float32)
    levels = np.array([0, 1], np.int32)
    got = np.asarray(
        multiscale_roi_align(feats, jnp.asarray(boxes), jnp.asarray(levels), strides, 7)
    )
    want0 = np_roi_align(np.asarray(feats[0]), boxes[:1], 7, 1 / 8.0, 2)
    want1 = np_roi_align(np.asarray(feats[1]), boxes[1:], 7, 1 / 16.0, 2)
    np.testing.assert_allclose(got[0], want0[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[1], want1[0], rtol=1e-4, atol=1e-5)


def test_canvas_matches_onehot_path(rng):
    """The canvas multiscale formulation (one pass, level-translated coords
    with per-ROI bounds) must match the pool-every-level one-hot-select
    reference path exactly — including ROIs clipped at level borders."""
    from hd_yolo_tpu.ops.roi_align import multiscale_roi_align_batched

    B, K, C = 2, 17, 8
    strides = (8.0, 16.0, 32.0, 64.0)
    feats = [
        jnp.asarray(rng.standard_normal((B, 64 >> i, 64 >> i, C)).astype(np.float32))
        for i in range(4)
    ]
    boxes = rng.uniform(-40, 520, (B, K, 4)).astype(np.float32)  # some off-edge
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(2, 120, (B, K, 2))
    boxes = jnp.asarray(boxes)
    levels = jnp.asarray(rng.integers(0, 4, (B, K)).astype(np.int32))
    ref = multiscale_roi_align_batched(
        feats, boxes, levels, strides, 7, use_pallas=False
    )
    got = multiscale_roi_align_batched(feats, boxes, levels, strides, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    # gradients w.r.t. features agree too
    def loss(path):
        return lambda fs: jnp.sum(
            multiscale_roi_align_batched(list(fs), boxes, levels, strides, 7,
                                         use_pallas=path) ** 2
        )

    g1 = jax.grad(loss(None))(tuple(feats))
    g2 = jax.grad(loss(False))(tuple(feats))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_windowed_matches_canvas_for_in_window_rois(rng):
    """The opt-in gathered-window path must be bit-comparable to the exact
    canvas einsum whenever a ROI's sampled span fits the window (span ≤ w−2
    feature px at its level), including ROIs hanging off image edges and ROIs
    on the smallest level (whose window necessarily crosses stacked-canvas
    level boundaries — the bounded interp rows must zero those reads)."""
    from hd_yolo_tpu.ops.roi_align import multiscale_roi_align_batched

    B, K, C = 2, 29, 8
    strides = (8.0, 16.0, 32.0, 64.0)
    img = 256
    feats = [
        jnp.asarray(rng.standard_normal(
            (B, img // int(s), img // int(s), C)).astype(np.float32))
        for s in strides
    ]
    levels = rng.integers(0, 4, (B, K)).astype(np.int32)
    boxes = np.zeros((B, K, 4), np.float32)
    for b in range(B):
        for k in range(K):
            s = strides[levels[b, k]]
            w, h = rng.uniform(2, 10 * s, 2)  # span ≤ 10 cells < window−2
            x1 = rng.uniform(-12, img - 6)
            y1 = rng.uniform(-12, img - 6)
            boxes[b, k] = [x1, y1, x1 + w, y1 + h]
    boxes, levels = jnp.asarray(boxes), jnp.asarray(levels)

    ref = multiscale_roi_align_batched(feats, boxes, levels, strides, 7)
    got = multiscale_roi_align_batched(feats, boxes, levels, strides, 7,
                                       window=12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    # gradients w.r.t. features agree (the training mask loss uses the knob)
    def loss(window):
        return lambda fs: jnp.sum(
            multiscale_roi_align_batched(list(fs), boxes, levels, strides, 7,
                                         window=window) ** 2)

    g1 = jax.grad(loss(None))(tuple(feats))
    g2 = jax.grad(loss(12))(tuple(feats))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
