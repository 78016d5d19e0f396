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


def test_pallas_stem_matches_xla_conv(rng):
    """Fused stem kernel (s2d + conv + BN-fold + act) vs lax conv, several
    (K, s, p, C_in) stem shapes, interpret mode."""
    from jax import lax

    from hd_yolo_tpu.ops.pallas_stem import stem_conv_pallas

    for (H, W, K, s, p, C, N) in [(64, 64, 6, 2, 2, 3, 64),
                                  (40, 48, 4, 4, 0, 3, 96),
                                  (64, 64, 2, 2, 0, 4, 32)]:
        x = rng.standard_normal((2, H, W, C)).astype(np.float32)
        w = (rng.standard_normal((K, K, C, N)) * 0.1).astype(np.float32)
        scale = rng.uniform(0.5, 1.5, N).astype(np.float32)
        bias = (rng.standard_normal(N) * 0.1).astype(np.float32)

        ref = lax.conv_general_dilated(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16),
            (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = jax.nn.silu(ref.astype(np.float32) * scale + bias)

        got = stem_conv_pallas(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
            jnp.asarray(bias), stride=s, padding=p, act="silu",
            out_dtype=jnp.float32, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-2 * float(np.abs(ref).max()))


def test_convbnact_stem_fastpath_matches_standard(rng, monkeypatch):
    """ConvBnAct rerouted through the Pallas stem (gate monkeypatched on,
    interpret on CPU) must match its own standard XLA path on trained-ish
    BN stats, and training mode must never take the fast path."""
    from hd_yolo_tpu.models.layers import ConvBnAct
    from hd_yolo_tpu.ops import pallas_stem

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    m = ConvBnAct(64, 6, 2, 2, dtype=jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x, train=True)
    # make running stats non-trivial
    vs = jax.tree_util.tree_map(lambda a: a, vs)
    stats = dict(vs["batch_stats"]["bn"])
    stats["mean"] = jnp.asarray(rng.standard_normal(64).astype(np.float32)) * 0.1
    stats["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    vs = {"params": vs["params"], "batch_stats": {"bn": stats}}

    ref = m.apply(vs, x, train=False)

    calls = []
    orig = pallas_stem.stem_conv_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setenv("HDYOLO_PALLAS_STEM", "1")  # the fast path is opt-in
    monkeypatch.setattr(pallas_stem, "_device_ok", lambda: True)
    monkeypatch.setattr(pallas_stem, "stem_conv_pallas", spy)
    got = m.apply(vs, x, train=False)
    assert len(calls) == 1, "fast path not taken"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4 * float(np.abs(np.asarray(ref)).max()))

    # train=True must use the standard path (BN batch stats + grads)
    calls.clear()
    m.apply(vs, x, train=True, mutable=["batch_stats"])
    assert not calls


def test_pallas_mask_head_matches_flax(rng):
    """Fused mask head (4×conv + deconv + logits + select + sigmoid) vs the
    flax MaskHead chain, interpret mode, f32 — must be bit-comparable."""
    from hd_yolo_tpu.models.detect_head import MaskHead
    from hd_yolo_tpu.ops.pallas_mask_head import fused_mask_probs

    N, M, C, nc = 11, 14, 32, 5   # N not divisible by g → internal pad
    x = jnp.asarray(rng.standard_normal((N, M, M, C)).astype(np.float32))
    head = MaskHead(nc_masks=nc, dim_reduced=C, dtype=jnp.float32)
    v = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(v, x)
    labels = jnp.asarray(rng.integers(0, nc, (N,)).astype(np.int32))
    want = jax.nn.sigmoid(logits.astype(jnp.float32))
    want = jnp.take_along_axis(want, labels[:, None, None, None], axis=-1)[..., 0]
    got = fused_mask_probs(v["params"], x, labels, g=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_detect_fused_mask_head_matches_standard(rng, monkeypatch):
    """Full flagship-family forward with the fused mask head gated on
    (monkeypatched device check, interpret on CPU) must reproduce the
    standard path's mask output."""
    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg
    from hd_yolo_tpu.ops import pallas_stem

    spec = parse_model_cfg("yolov5s-test", "hyp-nuclei")
    model = Model(spec=spec, dtype=jnp.float32, max_masks=8, pre_nms_topk=64)
    x = jnp.asarray(rng.uniform(0, 1, (1, 160, 160, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(v, x, train=False, compute_masks=True)[1]

    monkeypatch.setenv("HDYOLO_PALLAS_MASKHEAD", "1")
    monkeypatch.setattr(pallas_stem, "_device_ok", lambda: True)
    got = model.apply(v, x, train=False, compute_masks=True)[1]
    for task in ref:
        np.testing.assert_allclose(np.asarray(got[task]["masks"]),
                                   np.asarray(ref[task]["masks"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[task]["mask_valid"]),
                                      np.asarray(ref[task]["mask_valid"]))
