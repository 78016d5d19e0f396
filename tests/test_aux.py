"""Aux subsystems: plots, ensemble merge, hyp evolution, profiling, autoanchor."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.engines.autoanchor import check_anchors, kmean_anchors, anchor_fitness
from hd_yolo_tpu.engines.evolve import META, evolve, mutate
from hd_yolo_tpu.engines.plots import (
    overlay_detections,
    plot_apmeter_stats,
    save_detection_overlay,
)
from hd_yolo_tpu.models.ensemble import merge_outputs
from hd_yolo_tpu.utils.profiling import Profile, Timeout, model_info


def test_overlay_detections(rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes = np.array([[10, 10, 30, 30], [40, 5, 60, 25]], np.float32)
    masks = np.ones((2, 28, 28), np.float32)
    out = overlay_detections(img, boxes, np.array([1, 2]), np.array([0.9, 0.8]), masks,
                             labels_text={1: "tumor", 2: "stromal"})
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # something was drawn


def test_save_overlay_and_curves(tmp_path, rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = {"boxes": np.array([[10, 10, 30, 30]]), "labels": np.array([1]),
           "scores": np.array([0.9])}
    tgt = {"boxes": np.array([[12, 12, 32, 32]]), "labels": np.array([1])}
    p = str(tmp_path / "overlay.png")
    panel = save_detection_overlay(p, img, out, tgt)
    assert os.path.exists(p) and panel.shape[1] == 128  # side-by-side

    stats = {
        "labels": [1, 2], "px": np.linspace(0, 1, 1000),
        "py": np.random.rand(2, 1000), "f1": np.random.rand(2, 1000),
        "p": np.random.rand(2, 1000), "r": np.random.rand(2, 1000),
        "ap": np.random.rand(2, 10),
    }
    plot_apmeter_stats(stats, str(tmp_path), "t_", {1: "tumor", 2: "stromal"})
    assert os.path.exists(tmp_path / "t_PR_curve.png")
    assert os.path.exists(tmp_path / "t_F1_curve.png")


def test_ensemble_merge_dedups():
    def member(score):
        return {
            "boxes": jnp.asarray([[[10.0, 10.0, 30.0, 30.0], [0, 0, 0, 0]]]),
            "scores": jnp.asarray([[score, 0.0]]),
            "labels": jnp.asarray([[1, -100]]),
            "valid": jnp.asarray([[True, False]]),
        }

    merged = merge_outputs([member(0.9), member(0.7)], max_det=8)
    v = np.asarray(merged["valid"][0])
    assert v.sum() == 1  # identical boxes collapse
    assert float(np.asarray(merged["scores"][0])[v][0]) == pytest.approx(0.9)


def test_mutate_respects_bounds():
    hyp = {k: (lo + hi) / 2 for k, (g, lo, hi) in META.items()}
    import random

    r = random.Random(0)
    for _ in range(20):
        out = mutate(hyp, [], rng=r)
        for k, (g, lo, hi) in META.items():
            assert lo - 1e-9 <= out[k] <= hi + 1e-9, k


def test_evolve_improves(tmp_path):
    # toy objective: fitness maximal when lr0 ≈ 0.03
    def train_fn(h):
        return 1.0 - abs(h["lr0"] - 0.03) * 10

    hyp = {"lr0": 0.1, "lrf": 0.1, "momentum": 0.9}
    best_hyp, best_fit = evolve(train_fn, hyp, generations=25, save_dir=str(tmp_path), seed=0)
    assert best_fit > 1.0 - abs(0.1 - 0.03) * 10  # improved over initial
    assert os.path.exists(tmp_path / "evolve.csv")


def test_autoanchor(rng):
    wh = rng.uniform(8, 128, (500, 2)).astype(np.float64)
    bpr, aat = check_anchors(wh, [[10, 13, 16, 30, 33, 23]], [8.0], anchor_t=4.0)
    assert 0 <= bpr <= 1
    k = kmean_anchors(wh, n=6, gen=100, seed=0)
    assert k.shape == (6, 2)
    # evolved anchors fit the data better than a bad guess
    bad = np.full((6, 2), 500.0)
    assert anchor_fitness(k, wh, 0.25) > anchor_fitness(bad, wh, 0.25)


def test_profile_and_timeout():
    with Profile() as p:
        sum(range(1000))
    assert p.dt >= 0
    with Timeout(1, suppress=True):
        pass  # no-op completes fine


@pytest.mark.slow
def test_model_info():
    import jax

    from hd_yolo_tpu.models import Model

    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False, compute_masks=True)
    info = model_info(m, v, input_shape=(1, 128, 128, 3))
    assert info["n_params"] > 1e6
