"""Validation loop integration: model → APMeter → fitness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.engines import val as val_engine
from hd_yolo_tpu.models import Model

from test_model import make_targets


def test_flatten_onehot_objects():
    x = {
        "boxes": np.array([[0, 0, 10, 10], [5, 5, 20, 20]], np.float64),
        "labels": np.array([[0, 1, 0], [1, 0, 1]], np.float64),  # onehot nc+1=3
    }
    out = val_engine.flatten_onehot_objects(x)
    # row0 → class 1; row1 → unlabeled(−100) + class 2
    assert out["labels"].tolist() == [1, -100, 2]
    assert out["boxes"].shape == (3, 4)
    np.testing.assert_array_equal(out["boxes"][1], out["boxes"][2])


@pytest.mark.slow
def test_val_run_end_to_end():
    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64)
    rng = np.random.default_rng(0)
    x = jnp.zeros((2, 128, 128, 3))
    targets = make_targets(rng, 2, 8, 4)
    variables = m.init(jax.random.PRNGKey(0), x, targets, train=True, compute_masks=True)

    def data_iter():
        r = np.random.default_rng(1)
        for _ in range(2):
            imgs = r.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
            t = make_targets(r, 2, 8, 4)
            yield imgs, jax.tree.map(np.asarray, t)

    meta = {"det": {"labels_text": {1: "tumor", 2: "stromal", 3: "sTILs", 4: "other"}}}
    fitness, stats, times = val_engine.run(
        m, variables, data_iter(), meta_info=meta, verbose=True
    )
    assert np.isfinite(fitness)
    assert "det" in stats
    assert set(stats["det"]) >= {"mp", "mr", "f1", "map50", "map", "fitness"}
    assert len(times) == 3


@pytest.mark.slow
def test_val_run_uint8_matches_float():
    """The loader ships raw uint8 tiles; val must normalize them to the same
    inputs a float [0,1] batch produces.  Regression: a blind float32 cast
    handed the model 0..255 floats and zeroed every engine-loop val."""
    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8,
                       pre_nms_topk=64)
    rng = np.random.default_rng(0)
    x = jnp.zeros((2, 128, 128, 3))
    targets = make_targets(rng, 2, 8, 4)
    variables = m.init(jax.random.PRNGKey(0), x, targets, train=True,
                       compute_masks=True)

    imgs8 = np.random.default_rng(1).integers(
        0, 256, (2, 128, 128, 3)).astype(np.uint8)
    tg = jax.tree.map(np.asarray, make_targets(np.random.default_rng(2), 2, 8, 4))
    meta = {"det": {"labels_text": {1: "a", 2: "b", 3: "c", 4: "d"}}}
    runs = {}
    for name, imgs in (("uint8", imgs8),
                       ("float", imgs8.astype(np.float32) / 255.0)):
        fit, stats, _ = val_engine.run(
            m, variables, iter([(imgs, tg)]), meta_info=meta, verbose=False)
        runs[name] = (fit, stats)
    assert runs["uint8"][0] == pytest.approx(runs["float"][0], abs=1e-6)
    s8 = runs["uint8"][1]["det"]
    sf = runs["float"][1]["det"]
    for k in s8:
        assert s8[k] == pytest.approx(sf[k], abs=1e-6), k
