"""Pallas fused ROI-align: interpret-mode parity vs the XLA formulation."""

import numpy as np
import jax
import jax.numpy as jnp

from hd_yolo_tpu.ops.pallas_roi_align import roi_align_pallas
from hd_yolo_tpu.ops.roi_align import roi_align


def test_pallas_roi_align_matches_xla(rng):
    B, H, W, C, K = 2, 32, 32, 8, 10
    f = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    xy = rng.uniform(0, 200, (B, K, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + rng.uniform(10, 60, (B, K, 2))], -1))
    got = np.asarray(roi_align_pallas(f, boxes, 7, spatial_scale=1 / 8.0, interpret=True))
    want = np.asarray(
        jax.vmap(lambda ff, bb: roi_align(ff, bb, 7, spatial_scale=1 / 8.0))(f, boxes)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_roi_align_grad_matches_xla(rng):
    """custom_vjp: Pallas forward, XLA backward — grads match XLA autodiff."""
    f = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    boxes = jnp.asarray([[[2.0, 2.0, 10.0, 10.0], [4.0, 4.0, 14.0, 12.0]]])
    g1 = jax.grad(
        lambda x: jnp.sum(roi_align_pallas(x, boxes, 4, 1.0, 2, False, 4, True) ** 2)
    )(f)
    g2 = jax.grad(
        lambda x: jnp.sum(jax.vmap(lambda ff, bb: roi_align(ff, bb, 4))(x, boxes) ** 2)
    )(f)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_pallas_roi_align_pads_rois(rng):
    """K not divisible by kchunk → internal padding, clean trim."""
    f = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    boxes = jnp.asarray([[[2.0, 2.0, 10.0, 10.0], [0.0, 0.0, 16.0, 16.0],
                          [4.0, 4.0, 6.0, 6.0]]])
    out = np.asarray(roi_align_pallas(f, boxes, 4, kchunk=4, interpret=True))
    assert out.shape == (1, 3, 4, 4, 8)
    want = np.asarray(roi_align(f[0], boxes[0], 4))
    np.testing.assert_allclose(out[0], want, rtol=1e-5, atol=1e-5)


def test_pallas_canvas_multiscale_matches_xla(rng):
    """Fused multiscale canvas kernel (interpret mode) == the XLA canvas
    einsum path, including off-edge ROIs clipped at level borders, plus
    gradients w.r.t. features via the custom VJP."""
    from hd_yolo_tpu.ops.pallas_roi_align import multiscale_roi_align_canvas_pallas
    from hd_yolo_tpu.ops.roi_align import multiscale_roi_align_batched

    B, K, C = 2, 9, 8
    strides = (8.0, 16.0, 32.0, 64.0)
    feats = tuple(
        jnp.asarray(rng.standard_normal((B, 64 >> i, 64 >> i, C)).astype(np.float32))
        for i in range(4)
    )
    boxes = rng.uniform(-40, 520, (B, K, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(2, 120, (B, K, 2))
    boxes = jnp.asarray(boxes)
    levels = jnp.asarray(rng.integers(0, 4, (B, K)).astype(np.int32))

    got = multiscale_roi_align_canvas_pallas(
        feats, boxes, levels, strides, 7, 2, False, 4, True)
    ref = multiscale_roi_align_batched(
        list(feats), boxes, levels, strides, 7, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda fs: jnp.sum(multiscale_roi_align_canvas_pallas(
        fs, boxes, levels, strides, 7, 2, False, 4, True) ** 2))(feats)
    g2 = jax.grad(lambda fs: jnp.sum(multiscale_roi_align_batched(
        list(fs), boxes, levels, strides, 7, use_pallas=True) ** 2))(feats)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
