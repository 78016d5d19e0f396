"""Multi-head (multi-task) model + mask-IoU validation path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.models import Model, parse_model_cfg
from hd_yolo_tpu.engines import val as val_engine

from test_model import make_targets


def test_multihead_spec():
    spec = parse_model_cfg("yolov5s-multihead-test", "hyp-nuclei")
    tags = [h.tag for h in spec.headers]
    assert tags == ["det", "detSC"]
    assert spec.headers[0].nc == 7 and spec.headers[1].nc == 4
    # both headers share the same trunk save points
    assert spec.headers[0].from_idx == spec.headers[1].from_idx


@pytest.mark.slow
def test_multihead_train_and_infer():
    m = Model.from_cfg(
        "yolov5s-multihead-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64
    )
    rng = np.random.default_rng(0)
    B, T = 2, 8
    x = jnp.asarray(rng.uniform(0, 1, (B, 128, 128, 3)).astype(np.float32))
    targets = {
        **make_targets(rng, B, T, 7, task="det"),
        **make_targets(rng, B, T, 4, task="detSC"),
    }
    # task 'det' only active on image 0, 'detSC' only on image 1
    v0 = np.asarray(targets["det"]["valid"]).copy(); v0[1] = False
    v1 = np.asarray(targets["detSC"]["valid"]).copy(); v1[0] = False
    targets["det"]["valid"] = jnp.asarray(v0)
    targets["detSC"]["valid"] = jnp.asarray(v1)

    variables = m.init(jax.random.PRNGKey(0), x, targets, train=True, compute_masks=True)

    def loss_fn(params):
        (losses, _), _ = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, targets, train=True, compute_masks=True, mutable=["batch_stats"],
        )
        return m.total_loss(losses), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    for tag in ("det", "detSC"):
        assert np.isfinite(float(losses[tag]["det_loss"])), tag
    # trunk gets gradient from BOTH headers; each header only from its own loss
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bad = [jax.tree_util.keystr(k) for k, g in flat if not np.isfinite(np.asarray(g)).all()]
    assert not bad
    trunk_nz = [np.abs(np.asarray(g)).sum() > 0 for k, g in flat
                if "blocks_0" in jax.tree_util.keystr(k)]
    assert all(trunk_nz)

    _, out = m.apply(variables, x, train=False, compute_masks=True)
    assert set(out.keys()) == {"det", "detSC"}
    assert out["det"]["score_vector"].shape[-1] == 8   # 1+7
    assert out["detSC"]["score_vector"].shape[-1] == 5  # 1+4


@pytest.mark.slow
def test_val_mask_iou_type():
    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64)
    rng = np.random.default_rng(1)
    x0 = jnp.zeros((2, 128, 128, 3))
    targets = make_targets(rng, 2, 8, 4)
    variables = m.init(jax.random.PRNGKey(0), x0, targets, train=True, compute_masks=True)

    def data_iter():
        r = np.random.default_rng(2)
        imgs = r.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
        yield imgs, jax.tree.map(np.asarray, make_targets(r, 2, 8, 4))

    fitness, stats, _ = val_engine.run(
        m, variables, data_iter(), compute_masks=True, iou_type="masks", verbose=False
    )
    assert np.isfinite(fitness)
    assert "det" in stats


def test_paste_for_mask_eval():
    entry = {
        "boxes": np.array([[8.0, 8.0, 24.0, 24.0]]),
        "masks": np.ones((1, 28, 28), np.float32),
        "labels": np.array([1]),
    }
    out = val_engine.paste_for_mask_eval(entry, 32, 32)
    m = out["masks"][0]
    assert m.dtype == bool and m.shape == (32, 32)
    assert m[16, 16] and not m[2, 2]


def test_configurable_hierarchy():
    """hyp[tag]['hierarchy'] rows define the label tree; scores multiply down
    the tree (yolo_head.py:473-511 semantics, NuCLS-style 2-level example)."""
    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.models import parse_model_cfg
    from hd_yolo_tpu.models.detect_head import Detect

    hyp = load_cfg("hyp-nuclei")
    hyp["det"]["hierarchy"] = [[0, [1, 2]], [1, [3, 4]]]
    spec = parse_model_cfg("yolov5s-test", hyp)
    d = Detect(spec=spec.headers[0])
    scores = jnp.asarray([[[0.5, 0.8, 0.6, 0.9, 0.4]]])
    out = np.asarray(d.hierarchical_scores(scores))[0, 0]
    np.testing.assert_allclose(
        out, [0.5, 0.4, 0.3, 0.5 * 0.8 * 0.9, 0.5 * 0.8 * 0.4], atol=1e-6
    )


def test_val_plots_dir(tmp_path):
    import os
    import jax

    from hd_yolo_tpu.models import Model

    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8,
                       pre_nms_topk=64)
    rng = np.random.default_rng(3)
    x0 = jnp.zeros((2, 128, 128, 3))
    targets = make_targets(rng, 2, 8, 4)
    variables = m.init(jax.random.PRNGKey(0), x0, targets, train=True, compute_masks=True)

    def data_iter():
        r = np.random.default_rng(4)
        yield (r.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32),
               jax.tree.map(np.asarray, make_targets(r, 2, 8, 4)))

    val_engine.run(m, variables, data_iter(), compute_masks=False,
                   verbose=False, plots_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "det_img0.png")
    assert os.path.exists(tmp_path / "det_img1.png")


def test_multi_label_output_path():
    """hyp multi_label=true emits per-class boolean labels (yolo_head.py:339-341)."""
    import jax

    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.models import Model

    hyp = load_cfg("hyp-nuclei")
    hyp["det"]["multi_label"] = True
    hyp["det"]["conf_thres"] = 0.001
    m = Model.from_cfg("yolov5s-test", hyp, mask_rois=4, max_masks=8, pre_nms_topk=64)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False, compute_masks=False)
    _, out = m.apply(v, x, train=False, compute_masks=False)
    o = out["det"]
    assert "multi_labels" in o
    assert o["multi_labels"].shape == (1, 300, 5)
    assert o["multi_labels"].dtype == bool


def test_loss_utility_variants():
    """QFocal / BCE-blur / autobalance parity helpers (loss.py:51-121,233-237)."""
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models.losses import (
        autobalance_update,
        bce_blur_with_logits,
        bce_with_logits,
        focal_factor,
        q_focal_factor,
    )

    logits = jnp.asarray([-2.0, 0.0, 3.0])
    targets = jnp.asarray([0.0, 1.0, 1.0])
    qf = q_focal_factor(logits, targets, gamma=1.5)
    assert qf.shape == logits.shape
    # confident-correct prediction → near-zero modulation; wrong → large
    assert float(qf[2]) < float(q_focal_factor(jnp.asarray([-3.0]), jnp.asarray([1.0]), 1.5)[0])

    # bce-blur: confident FALSE POSITIVE down-weighted vs plain bce
    fp_logit, fp_target = jnp.asarray([4.0]), jnp.asarray([0.0])
    assert float(bce_blur_with_logits(fp_logit, fp_target)[0]) < float(
        bce_with_logits(fp_logit, fp_target)[0])
    # true positives barely affected
    tp_logit, tp_target = jnp.asarray([4.0]), jnp.asarray([1.0])
    import numpy as np
    np.testing.assert_allclose(float(bce_blur_with_logits(tp_logit, tp_target)[0]),
                               float(bce_with_logits(tp_logit, tp_target)[0]), rtol=0.05)

    b = autobalance_update([4.0, 1.0, 0.4], [0.5, 0.1, 0.05], ssi=1)
    assert b.shape == (3,)
    np.testing.assert_allclose(float(b[1]), 1.0, rtol=1e-6)  # renormalized
    assert np.isfinite(np.asarray(b)).all()
