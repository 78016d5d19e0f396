"""Anchor-free head: SimOTA assignment properties + head forward/loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.models.anchor_free_head import (
    AnchorFreeDetect,
    make_cell_centers,
    simota_assign,
)


def test_cell_centers():
    centers, strides = make_cell_centers([(2, 2), (1, 1)], [8.0, 16.0])
    assert centers.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(centers[0]), [4.0, 4.0])
    np.testing.assert_allclose(np.asarray(centers[4]), [8.0, 8.0])
    assert float(strides[4]) == 16.0


def test_simota_assigns_best_cell():
    centers, strides = make_cell_centers([(8, 8)], [8.0])
    N = centers.shape[0]
    # one gt box at cells (2..4); predictions perfectly matching it at cell 18
    gt = jnp.asarray([[16.0, 16.0, 40.0, 40.0]])
    pred = jnp.tile(jnp.asarray([[0.0, 0.0, 8.0, 8.0]]), (N, 1))
    pred = pred.at[18].set(jnp.asarray([16.0, 16.0, 40.0, 40.0]))
    cls_logits = jnp.zeros((N, 3))
    obj = jnp.zeros((N,))
    best_gt, fg, m_iou = simota_assign(
        pred, cls_logits, obj, centers, strides, gt, jnp.asarray([1]), jnp.ones(1, bool)
    )
    fg = np.asarray(fg)
    assert fg[18]  # the perfect cell is foreground
    assert float(m_iou[18]) == pytest.approx(1.0)
    # no assignments to cells far outside the center prior
    assert not fg[0]


def test_simota_no_valid_gt():
    centers, strides = make_cell_centers([(4, 4)], [8.0])
    N = centers.shape[0]
    best_gt, fg, m_iou = simota_assign(
        jnp.zeros((N, 4)), jnp.zeros((N, 2)), jnp.zeros((N,)),
        centers, strides, jnp.zeros((3, 4)), jnp.ones((3,), jnp.int32),
        jnp.zeros(3, bool),
    )
    assert not np.asarray(fg).any()


def test_anchor_free_loss_finite_with_zero_valid_targets(rng):
    """Padded zero-wh GT boxes must not NaN-poison CIoU via masked means
    (ADVICE r1 high): an image with NO valid targets exercises best_gt=0
    pointing at a degenerate box."""
    head = AnchorFreeDetect(nc=4, strides=(8.0,), width=16, pre_nms_topk=32)
    feats = [jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))]
    B, T = 2, 5
    targets = {
        "boxes": jnp.zeros((B, T, 4)),            # all-padded, zero-wh
        "labels": jnp.zeros((B, T), jnp.int32),
        "valid": jnp.zeros((B, T), bool),
    }
    variables = head.init(jax.random.PRNGKey(0), feats, targets, train=True)

    def loss_fn(params):
        (l, _), _ = head.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            feats, targets, train=True, mutable=["batch_stats"],
        )
        return l["det_loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)


@pytest.mark.slow
def test_anchor_free_head_end_to_end(rng):
    head = AnchorFreeDetect(nc=4, strides=(8.0, 16.0, 32.0), width=32, pre_nms_topk=128)
    feats = [
        jnp.asarray(rng.standard_normal((2, 16 // (2**i), 16 // (2**i), 32)).astype(np.float32))
        for i in range(3)
    ]
    B, T = 2, 6
    xy = rng.uniform(0.1, 0.6, (B, T, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.3, (B, T, 2)).astype(np.float32)
    targets = {
        "boxes": jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, 1.0)], -1)),
        "labels": jnp.asarray(rng.integers(1, 5, (B, T))),
        "valid": jnp.ones((B, T), bool),
    }
    variables = head.init(jax.random.PRNGKey(0), feats, targets, train=True)
    (losses, _), _ = head.apply(variables, feats, targets, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(losses["det_loss"]))
    for k in ("obj", "cls", "box"):
        assert np.isfinite(float(losses["loss_items"][k]))

    # grads flow everywhere
    def loss_fn(params):
        (l, _), _ = head.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            feats, targets, train=True, mutable=["batch_stats"],
        )
        return l["det_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
    nz = sum(bool(np.abs(np.asarray(g)).sum() > 0) for _, g in flat)
    assert nz / len(flat) > 0.9

    # inference outputs
    _, out = head.apply(variables, feats, train=False)
    assert out["boxes"].shape == (2, 300, 4)
    lab = np.asarray(out["labels"])
    v = np.asarray(out["valid"])
    assert np.all(lab[~v] == -100)


@pytest.mark.slow
def test_anchor_free_overfit_recovers_box(rng):
    """Learning evidence (VERDICT r3 #6): SimOTA + the decoupled head can
    actually fit — one synthetic box is recovered at IoU>0.5 with the right
    label after a short Adam overfit (mirrors the FCOS overfit test;
    reference anchor: loss_yolov6.py:126-520 training path)."""
    import optax

    head = AnchorFreeDetect(
        nc=2, strides=(8.0, 16.0, 32.0), width=16, pre_nms_topk=64,
        nms_params=(("conf_thres", 0.05), ("iou_thres", 0.45), ("max_det", 5)),
    )
    feats = [
        jnp.asarray(rng.uniform(0, 1, (1, 16 >> i, 16 >> i, 16)).astype(np.float32))
        for i in range(3)
    ]
    gt_px = np.asarray([[24.0, 24.0, 88.0, 88.0]])
    targets = {
        "boxes": jnp.asarray(gt_px[None] / 128.0),
        "labels": jnp.asarray([[1]]),
        "valid": jnp.ones((1, 1), bool),
    }
    variables = head.init(jax.random.PRNGKey(0), feats, targets, train=True)
    tx = optax.adam(5e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, bstats, opt):
        def loss_fn(p):
            (l, _), mut = head.apply({"params": p, "batch_stats": bstats},
                                     feats, targets, train=True,
                                     mutable=["batch_stats"])
            return l["det_loss"], mut["batch_stats"]
        (loss, bstats2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), bstats2, opt, loss

    params, bstats = variables["params"], variables["batch_stats"]
    first = None
    for _ in range(500):
        params, bstats, opt, loss = step(params, bstats, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))

    _, out = head.apply({"params": params, "batch_stats": bstats}, feats,
                        train=False)
    v = np.asarray(out["valid"][0])
    assert v.any(), "no detections after overfit"
    best = np.asarray(out["boxes"][0])[0]
    x1 = max(best[0], gt_px[0, 0]); y1 = max(best[1], gt_px[0, 1])
    x2 = min(best[2], gt_px[0, 2]); y2 = min(best[3], gt_px[0, 3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    a1 = (best[2] - best[0]) * (best[3] - best[1])
    a2 = (gt_px[0, 2] - gt_px[0, 0]) * (gt_px[0, 3] - gt_px[0, 1])
    assert inter / (a1 + a2 - inter) > 0.5, best
    assert int(np.asarray(out["labels"][0])[0]) == 1
