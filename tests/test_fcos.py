"""FCOS header: assignment semantics, loss finiteness, overfit recovery,
and HNet config plumbing (reference hnet/detection/fcos.py:1-224)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hd_yolo_tpu.hnet.fcos import FCOS, _size_ranges


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _feats(rng, B=1, base=16, C=32, levels=3):
    return [
        jnp.asarray(rng.uniform(0, 1, (B, base >> i, base >> i, C)).astype(np.float32))
        for i in range(levels)
    ]


def test_size_ranges():
    assert _size_ranges(3, 64.0) == ((0.0, 64.0), (64.0, 128.0), (128.0, 1e8))


def test_fcos_losses_finite_and_outputs_static(rng):
    m = FCOS(num_classes=3, strides=(8.0, 16.0, 32.0), num_detections=10,
             pre_nms_topk=64)
    feats = _feats(rng)
    targets = {
        "boxes": jnp.asarray([[[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]]]),
        "labels": jnp.asarray([[1, 3]]),
        "valid": jnp.ones((1, 2), bool),
    }
    vars_ = m.init(jax.random.PRNGKey(0), feats, (128, 128), targets)
    losses, outputs = m.apply(vars_, feats, (128, 128), targets)
    for k in ("fcos_cls_loss", "fcos_reg_loss", "fcos_ctr_loss"):
        assert np.isfinite(float(losses[k])), k
    assert outputs["boxes"].shape == (1, 10, 4)
    assert outputs["valid"].dtype == bool
    lab = np.asarray(outputs["labels"])
    v = np.asarray(outputs["valid"])
    assert np.all(lab[~v] == -100)


def test_fcos_zero_valid_targets_no_nan(rng):
    """Empty image: every loss must stay finite (masked means)."""
    m = FCOS(num_classes=2, strides=(8.0, 16.0, 32.0))
    feats = _feats(rng)
    targets = {
        "boxes": jnp.zeros((1, 3, 4)),
        "labels": jnp.zeros((1, 3), jnp.int32),
        "valid": jnp.zeros((1, 3), bool),
    }
    vars_ = m.init(jax.random.PRNGKey(0), feats, (128, 128), targets)
    losses, _ = m.apply(vars_, feats, (128, 128), targets)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_fcos_image_weight_drops_image(rng):
    """image_weight=0 must zero an image's contribution (double-pass pad ROIs)."""
    m = FCOS(num_classes=2, strides=(8.0, 16.0, 32.0))
    feats = _feats(rng, B=2)
    targets = {
        "boxes": jnp.asarray([[[0.1, 0.1, 0.5, 0.5]]] * 2),
        "labels": jnp.ones((2, 1), jnp.int32),
        "valid": jnp.ones((2, 1), bool),
    }
    vars_ = m.init(jax.random.PRNGKey(0), feats, (128, 128), targets)
    both = m.apply(vars_, feats, (128, 128), targets,
                   method=FCOS.compute_losses)
    w = jnp.asarray([1.0, 0.0])
    first = m.apply(vars_, feats, (128, 128), targets, w,
                    method=FCOS.compute_losses)
    only_first = m.apply(
        vars_, [f[:1] for f in feats], (128, 128),
        jax.tree.map(lambda x: x[:1], targets), method=FCOS.compute_losses)
    np.testing.assert_allclose(
        float(first["fcos_cls_loss"]), float(only_first["fcos_cls_loss"]), rtol=1e-5)
    assert not np.isclose(float(both["fcos_cls_loss"]), float(first["fcos_cls_loss"]))


@pytest.mark.slow
def test_fcos_overfit_recovers_box(rng):
    """Direct overfit: the header learns to localize one synthetic box."""
    import optax

    m = FCOS(num_classes=2, strides=(8.0, 16.0, 32.0), num_detections=5,
             pre_nms_topk=64, score_thresh=0.05, center_sample_radius=1.5)
    feats = _feats(rng, base=16, C=16)
    gt_px = np.asarray([[24.0, 24.0, 88.0, 88.0]])
    targets = {
        "boxes": jnp.asarray(gt_px[None] / 128.0),
        "labels": jnp.asarray([[1]]),
        "valid": jnp.ones((1, 1), bool),
    }
    vars_ = m.init(jax.random.PRNGKey(0), feats, (128, 128), targets)
    tx = optax.adam(2e-3)
    opt = tx.init(vars_["params"])

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            l = m.apply({"params": p}, feats, (128, 128), targets,
                        method=FCOS.compute_losses)
            return l["fcos_cls_loss"] + l["fcos_reg_loss"] + l["fcos_ctr_loss"]
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    params = vars_["params"]
    first = None
    for i in range(150):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))

    out = m.apply({"params": params}, feats, (128, 128), method=FCOS.infer)
    v = np.asarray(out["valid"][0])
    assert v.any(), "no detections after overfit"
    best = np.asarray(out["boxes"][0])[0]
    # IoU of the top detection with GT
    x1 = max(best[0], gt_px[0, 0]); y1 = max(best[1], gt_px[0, 1])
    x2 = min(best[2], gt_px[0, 2]); y2 = min(best[3], gt_px[0, 3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    a1 = (best[2] - best[0]) * (best[3] - best[1])
    a2 = (gt_px[0, 2] - gt_px[0, 0]) * (gt_px[0, 3] - gt_px[0, 1])
    iou = inter / (a1 + a2 - inter)
    assert iou > 0.5, (best, iou)
    assert int(np.asarray(out["labels"][0])[0]) == 1


@pytest.mark.slow
def test_hnet_fcos_header_plumbs(rng):
    """'fcos' header type through HNet: losses + outputs via the double pass."""
    from hd_yolo_tpu.hnet import HNet

    cfg = {
        "backbone": {"type": "darknet", "width": 0.25, "depth": 0.33},
        "fpn": {"out_channels": 32},
        "headers": {
            "det": {"type": "fcos", "num_classes": 2, "pre_nms_topk": 64,
                    "num_detections": 8, "roi_size": 32, "size_base": 16.0},
        },
    }
    model = HNet.from_cfg(cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    targets = {"det": {
        "boxes": jnp.asarray([[[0.1, 0.1, 0.4, 0.4]]]),
        "labels": jnp.asarray([[1]]),
        "valid": jnp.ones((1, 1), bool),
    }}
    vars_ = model.init(jax.random.PRNGKey(0), x, targets, train=False)
    losses, outputs = model.apply(vars_, x, targets, train=False)
    for k, v in losses["det"].items():
        assert np.isfinite(float(v)), k
    assert "boxes" in outputs["det"]
