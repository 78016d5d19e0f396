"""keep_res data path, autobatch, label remap."""

import numpy as np
import pytest

from hd_yolo_tpu.engines.autobatch import autobatch
from hd_yolo_tpu.utils.label_remap import remap_det_conv

from test_data import synthetic_dataset  # noqa: F401  (fixture)
from hd_yolo_tpu.data.dataset import DetectionDataset


def test_keep_res_val_path(synthetic_dataset):  # noqa: F811
    # 96px source at keep_res=2.0 → 192px content, center-cropped to 128
    ds = DetectionDataset(
        synthetic_dataset, {"img_size": 128, "keep_res": 2.0}, train=False, max_targets=16
    )
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    t = s["targets"]["det"]
    if t["valid"].any():
        b = t["boxes"][t["valid"]]
        assert (b >= 0).all() and (b <= 1).all()

    # keep_res=1.0 with small source → padded up to 128; boxes keep pixel scale
    ds2 = DetectionDataset(
        synthetic_dataset, {"img_size": 128, "keep_res": 1.0}, train=False, max_targets=16
    )
    s2 = ds2[0]
    t2 = s2["targets"]["det"]
    b2 = t2["boxes"][t2["valid"]] * 128
    # original boxes were 30px wide at 96px scale; unresized → still 30px
    w = b2[:, 2] - b2[:, 0]
    assert np.isclose(w[0], 30.0, atol=1.5)


def test_keep_res_train_mosaic(synthetic_dataset):  # noqa: F811
    ds = DetectionDataset(
        synthetic_dataset,
        {"img_size": 128, "patch_size": 96, "k_mosaic": 2, "keep_res": 1.0,
         "scale": 0.1, "translate": 0.05},
        train=True, max_targets=32,
    )
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)


def test_autobatch_linear_fit(monkeypatch):
    """Simulated device: mem = 1GiB + 0.5GiB·batch, limit 16GiB @0.8 → b=25."""

    class FakeDev:
        def __init__(self):
            self._used = 0

        def memory_stats(self):
            return {"bytes_in_use": self._used, "bytes_limit": 16 * 2**30}

    dev = FakeDev()

    def step(b):
        dev._used = 1 * 2**30 + int(0.5 * 2**30) * b

    b = autobatch(step, fraction=0.8, probes=(1, 2, 4), device=dev)
    assert b == int((16 * 0.8 - 1) / 0.5)


def test_autobatch_no_stats():
    class NoStats:
        def memory_stats(self):
            return {}

    assert autobatch(lambda b: None, fallback=7, device=NoStats()) == 7


def test_remap_det_conv_swaps_classes(rng):
    na, nc = 3, 4
    C = 8
    kernel = rng.standard_normal((1, 1, C, na * (5 + nc))).astype(np.float32)
    bias = rng.standard_normal(na * (5 + nc)).astype(np.float32)
    # new order: [class2, class1] (1-based old ids)
    k2, b2 = remap_det_conv(kernel, bias, na, nc, [2, 1])
    assert k2.shape == (1, 1, C, na * 7) and b2.shape == (na * 7,)
    old = kernel.reshape(1, 1, C, na, 9)
    new = k2.reshape(1, 1, C, na, 7)
    np.testing.assert_array_equal(new[..., :5], old[..., :5])     # box+obj kept
    np.testing.assert_array_equal(new[..., 5], old[..., 6])       # new c1 = old c2
    np.testing.assert_array_equal(new[..., 6], old[..., 5])       # new c2 = old c1
    # blank class (0) seeds from objectness
    k3, _ = remap_det_conv(kernel, bias, na, nc, [1, 0])
    new3 = k3.reshape(1, 1, C, na, 7)
    np.testing.assert_array_equal(new3[..., 6], old[..., 4])
