"""Device-side augmentation (data/device_augment.py) vs the host recipe."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hd_yolo_tpu.data.device_augment import (
    _box_candidates,
    _clip_boxes_recrop_masks,
    _warp_images,
    _window_resample,
    make_device_augment,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_warp_images_matches_cv2(rng):
    """Separable MXU warp == cv2.warpPerspective for the T·S·C (angle 0)
    matrix family, constant border 114."""
    S = 64
    img = rng.uniform(0, 1, (3, S, S, 3)).astype(np.float32)
    scale = np.array([0.6, 1.0, 1.45], np.float32)
    tx = np.array([20.0, 32.0, 40.0], np.float32)
    ty = np.array([30.0, 32.0, 25.0], np.float32)

    got = np.asarray(_warp_images(jnp.asarray(img), jnp.asarray(scale),
                                  jnp.asarray(tx), jnp.asarray(ty)))
    for b in range(3):
        M = np.array([[scale[b], 0, -scale[b] * S / 2 + tx[b]],
                      [0, scale[b], -scale[b] * S / 2 + ty[b]],
                      [0, 0, 1]], np.float64)
        ref = cv2.warpPerspective(
            img[b], M, (S, S), borderValue=(114 / 255.0,) * 3,
            flags=cv2.INTER_LINEAR)
        # cv2 uses fixed-point bilinear (5-bit weights) → tolerance ~1/32
        np.testing.assert_allclose(got[b], ref, atol=0.04)


def test_window_resample_identity_and_shift(rng):
    m = rng.uniform(0, 1, (2, 5, 28, 28)).astype(np.float32)
    lo = np.zeros((2, 5, 2), np.float32)
    hi = np.ones((2, 5, 2), np.float32)
    out = np.asarray(_window_resample(jnp.asarray(m), jnp.asarray(lo), jnp.asarray(hi)))
    np.testing.assert_allclose(out, m, atol=1e-5)  # f32 grid epsilon

    # half-window in x: out[j] = src sampled at x in [0, .5] → integer-aligned
    # taps where (j+0.5)/2 - 0.5 is an integer
    hi2 = hi.copy()
    hi2[..., 1] = 0.5
    out = np.asarray(_window_resample(jnp.asarray(m), jnp.asarray(lo), jnp.asarray(hi2)))
    # column j=1 samples src x = (1.5/28)*0.5*28 - 0.5 = 0.25 → 0.75*m[...,0] + 0.25*m[...,1]
    np.testing.assert_allclose(out[..., 1], 0.75 * m[..., 0] + 0.25 * m[..., 1],
                               atol=1e-5)


def test_clip_recrop_keeps_content_aligned():
    """A box hanging off the left edge keeps its mask aligned to the visible
    window: content at image x=0 was at box fraction (-x1)/w."""
    S = 100.0
    m = np.zeros((1, 1, 28, 28), np.float32)
    m[0, 0, :, 14] = 1.0  # vertical stripe at box fraction ~14.5/28
    boxes = jnp.asarray([[[-40.0, 10.0, 40.0, 90.0]]])  # w=80, stripe at x≈1.43% vis
    c, m2 = _clip_boxes_recrop_masks(boxes, jnp.asarray(m), S)
    np.testing.assert_allclose(np.asarray(c), [[[0.0, 10.0, 40.0, 90.0]]])
    # visible window x ∈ [0.5, 1.0] of the box; stripe at frac (14.5)/28≈0.518
    # → new frac (0.518-0.5)/0.5 = 0.0357 → col ≈ 0.0357*28 - 0.5 ≈ 0.5
    got = np.asarray(m2)[0, 0]
    peak = got.sum(0).argmax()
    assert peak in (0, 1), got.sum(0)
    assert got.sum() > 0


def test_box_candidates_matches_host(rng):
    from hd_yolo_tpu.data.augment import box_candidates

    b1 = rng.uniform(0, 300, (64, 2))
    b1 = np.concatenate([b1, b1 + rng.uniform(1, 60, (64, 2))], 1).astype(np.float32)
    scale = 0.4
    b2 = (b1 * scale).astype(np.float32)
    b2[:, [0, 2]] += rng.uniform(-5, 5, (64, 1))
    b2 = np.clip(b2, 0, 200)
    ref = box_candidates(b1, b2)
    got = np.asarray(_box_candidates(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_array_equal(got, ref)


def _ident_hyp(**kw):
    h = dict(scale=0.0, translate=0.0, fliplr=0.0, flipud=0.0, transpose=0.0,
             hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, photometric=0.0, mixup=0.0,
             degrees=0.0, shear=0.0, perspective=0.0)
    h.update(kw)
    return h


def _batch(rng, B=2, S=64, T=8):
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    boxes = np.zeros((B, T, 4), np.float32)
    valid = np.zeros((B, T), bool)
    boxes[:, 0] = [0.2, 0.3, 0.6, 0.7]
    boxes[:, 1] = [0.5, 0.1, 0.9, 0.4]
    valid[:, :2] = True
    masks = rng.uniform(0, 1, (B, T, 28, 28)).astype(np.float32)
    masks[~valid] = 0.0
    labels = np.zeros((B, T), np.int32)
    labels[:, :2] = [1, 2]
    return {"image": img, "targets": {"det": {
        "boxes": boxes, "labels": labels, "masks": masks,
        "valid": valid, "active": np.ones(B, bool)}}}


def test_identity_recipe_is_identity(rng):
    """k_mosaic=1 with scale=translate=flip=hsv=0 must return the input
    (bilinear at integer coords, no-op color) bit-for-bit up to float."""
    batch = _batch(rng)
    aug = make_device_augment(_ident_hyp(), k_mosaic=1)
    out = jax.jit(aug)(jax.random.PRNGKey(0), batch)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               batch["image"].astype(np.float32) / 255.0,
                               atol=1e-5)
    tg = out["targets"]["det"]
    got_b = np.asarray(tg["boxes"])
    got_v = np.asarray(tg["valid"])
    # both boxes are >10px at S=64 (0.4*64=25.6, 0.3*64=19.2) → survive;
    # compaction orders by area (slot0 area .4*.4 > slot1 .4*.3)
    assert got_v[:, :2].all() and not got_v[:, 2:].any()
    np.testing.assert_allclose(
        got_b[0, :2], batch["targets"]["det"]["boxes"][0, :2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tg["masks"])[:, :2],
                               batch["targets"]["det"]["masks"][:, :2], atol=1e-5)


def test_mosaic_label_color_consistency(rng):
    """Solid-color tiles: after mosaic+crop every surviving box's center pixel
    must carry the color of the tile its label encodes."""
    B, S, T = 4, 64, 4
    colors = (np.arange(1, B + 1, dtype=np.float32) * 50).astype(np.uint8)
    img = np.zeros((B, S, S, 3), np.uint8)
    img += colors[:, None, None, None]
    boxes = np.zeros((B, T, 4), np.float32)
    boxes[:, 0] = [0.1, 0.1, 0.9, 0.9]
    valid = np.zeros((B, T), bool)
    valid[:, 0] = True
    labels = np.zeros((B, T), np.int32)
    labels[:, 0] = np.arange(1, B + 1)
    batch = {"image": img, "targets": {"det": {
        "boxes": boxes, "labels": labels,
        "masks": np.zeros((B, T, 28, 28), np.float32),
        "valid": valid, "active": np.ones(B, bool)}}}
    aug = make_device_augment(_ident_hyp(), k_mosaic=2)
    out = jax.jit(aug)(jax.random.PRNGKey(3), batch)
    oi = np.asarray(out["image"])
    tg = out["targets"]["det"]
    bx, lb, vd = (np.asarray(tg[k]) for k in ("boxes", "labels", "valid"))
    assert vd.any(), "crop killed every box in every image"
    for b in range(B):
        for t in range(bx.shape[1]):
            if not vd[b, t]:
                continue
            cx = int((bx[b, t, 0] + bx[b, t, 2]) / 2 * S)
            cy = int((bx[b, t, 1] + bx[b, t, 3]) / 2 * S)
            px = oi[b, min(cy, S - 1), min(cx, S - 1), 0] * 255.0
            assert abs(px - float(colors[lb[b, t] - 1])) < 1.0, (b, t, px, lb[b, t])


def test_flip_recipe_flips_boxes_and_masks(rng):
    batch = _batch(rng, B=1)
    aug = make_device_augment(_ident_hyp(fliplr=1.0), k_mosaic=1)
    out = jax.jit(aug)(jax.random.PRNGKey(1), batch)
    img = np.asarray(out["image"])
    np.testing.assert_allclose(
        img, (batch["image"].astype(np.float32) / 255.0)[:, :, ::-1], atol=1e-5)
    b0 = batch["targets"]["det"]["boxes"][0, 0]
    exp = np.array([1 - b0[2], b0[1], 1 - b0[0], b0[3]], np.float32)
    got = np.asarray(out["targets"]["det"]["boxes"])[0]
    assert any(np.allclose(g, exp, atol=1e-5) for g in got)
    # mask content mirrored
    m0 = batch["targets"]["det"]["masks"][0, 0]
    gm = np.asarray(out["targets"]["det"]["masks"])[0]
    assert any(np.allclose(g, m0[:, ::-1], atol=1e-5) for g in gm)


def test_scale_moves_box_with_content(rng):
    """Zoom-in around center: a centered bright square's detected extent in
    the output image must match the transformed box."""
    S = 64
    img = np.zeros((1, S, S, 3), np.uint8)
    img[0, 24:40, 24:40] = 255
    boxes = np.zeros((1, 4, 4), np.float32)
    boxes[0, 0] = [24 / S, 24 / S, 40 / S, 40 / S]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    batch = {"image": img, "targets": {"det": {
        "boxes": boxes, "labels": np.ones((1, 4), np.int32),
        "masks": np.zeros((1, 4, 28, 28), np.float32),
        "valid": valid, "active": np.ones(1, bool)}}}
    # scale sampled from [1-s, 1+s]; pin it by sampling many keys and
    # checking consistency rather than exact value
    aug = make_device_augment(_ident_hyp(scale=0.4), k_mosaic=1)
    for seed in range(4):
        out = jax.jit(aug)(jax.random.PRNGKey(seed), batch)
        oi = np.asarray(out["image"])[0, :, :, 0]
        tg = out["targets"]["det"]
        if not np.asarray(tg["valid"])[0, 0]:
            continue
        bx = np.asarray(tg["boxes"])[0, 0] * S
        ys, xs = np.nonzero(oi > 0.5)
        assert abs(xs.min() - bx[0]) <= 1.5 and abs(xs.max() + 1 - bx[2]) <= 1.5
        assert abs(ys.min() - bx[1]) <= 1.5 and abs(ys.max() + 1 - bx[3]) <= 1.5


def test_rotational_hyp_rejected():
    with pytest.raises(ValueError):
        make_device_augment(_ident_hyp(degrees=10.0))


def test_raw_dataset_mode_schema(tmp_path, rng):
    """host_augment=False serves deterministic, cacheable samples whose
    schema feeds make_device_augment directly."""
    from tools.flagship_train_check import make_nucls_dataset
    from hd_yolo_tpu.config import load_dataset_info
    from hd_yolo_tpu.data.dataset import DataLoader, DetectionDataset

    data = make_nucls_dataset(tmp_path, n_images=4, img_size=96)
    info = load_dataset_info(data)
    ds = DetectionDataset(info["train"], {"img_size": 96}, train=True,
                          max_targets=16, cache_images=True, host_augment=False)
    s1, s2 = ds[0], ds[0]
    assert s2 is s1, "raw samples must cache"
    assert s1["image"].dtype == np.uint8
    dl = DataLoader(ds, 2, workers=1)
    b = next(iter(dl))
    aug = make_device_augment(_ident_hyp(), k_mosaic=2)
    out = jax.jit(aug)(jax.random.PRNGKey(0), b)
    assert np.asarray(out["image"]).shape == (2, 96, 96, 3)
    for tg in out["targets"].values():
        assert np.asarray(tg["boxes"]).shape == (2, 16, 4)
        v = np.asarray(tg["valid"])
        z = np.asarray(tg["boxes"])[~v]
        assert (z == 0).all(), "padded slots must carry zero boxes"


def test_train_step_with_device_augment(rng):
    """The augment composes inside the jitted train step and produces finite
    loss/grads on a tiny model."""
    import optax

    from hd_yolo_tpu.engines.train_step import TrainState, make_train_step
    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg

    spec = parse_model_cfg("yolov5s-test", "hyp-nuclei")
    model = Model(spec=spec, dtype=jnp.float32, max_masks=8, pre_nms_topk=64)
    B, S, T = 2, 64, 8
    x0 = jnp.zeros((B, S, S, 3), jnp.float32)
    batch = _batch(rng, B=B, S=S, T=T)
    tname = spec.headers[0].tag
    batch["targets"] = {tname: batch["targets"]["det"]}
    tgt0 = jax.tree.map(jnp.asarray, batch["targets"])
    variables = model.init(jax.random.PRNGKey(0), x0, tgt0, train=True)
    tx = optax.sgd(1e-3)
    aug = make_device_augment(_ident_hyp(scale=0.2, fliplr=0.5), k_mosaic=2)
    step = make_train_step(model, tx, mask_weight=1.0, seed=0, augment_fn=aug)
    state = TrainState.create(variables, tx)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
