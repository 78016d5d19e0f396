"""Native C++ data-pipeline core vs the numpy/cv2 reference paths."""

import numpy as np
import pytest

from hd_yolo_tpu import native
from hd_yolo_tpu.data.mask import Mask, polygons_to_mask, rle_decode, rle_encode

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_rle_roundtrip_native(rng):
    m = (rng.uniform(0, 1, (43, 29)) > 0.55).astype(np.uint8)
    counts = native.rle_encode(m)
    assert counts == rle_encode(m)["counts"]  # matches the numpy codec
    back = native.rle_decode(counts, 43, 29)
    np.testing.assert_array_equal(back, m)
    # cross-check: numpy decode of native counts
    np.testing.assert_array_equal(rle_decode({"size": [43, 29], "counts": counts}), m)


def test_fill_polys_vs_cv2():
    poly = [np.array([[4, 4], [24, 4], [24, 18], [4, 18]], np.float32)]
    want = polygons_to_mask(poly, (28, 28))  # cv2 path
    got = native.fill_polys(poly, 28, 28)
    inter = (want & got).sum()
    union = (want | got).sum()
    # cv2 draws boundary pixels inclusively (outline + fill); the scanline
    # codec uses half-open crossings — up to one boundary row/col differs.
    assert inter / union > 0.88
    assert (got & ~want).sum() == 0  # native never exceeds cv2's region


def test_fill_polys_concave():
    # L-shape (concave) exercises the even-odd scanline
    poly = [np.array([[2, 2], [20, 2], [20, 8], [10, 8], [10, 20], [2, 20]], np.float32)]
    got = native.fill_polys(poly, 24, 24)
    assert got[4, 4] == 1 and got[15, 5] == 1
    assert got[15, 15] == 0  # notch is empty


def test_bilinear_resize_vs_cv2(rng):
    import cv2

    src = rng.uniform(0, 1, (17, 23)).astype(np.float32)
    got = native.bilinear_resize(src, 28, 28)
    want = cv2.resize(src, (28, 28), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_box_crop_resize_vs_mask_class(rng):
    m = (rng.uniform(0, 1, (64, 64)) > 0.4).astype(np.float32)
    box = np.array([10.2, 8.7, 40.9, 36.1], np.float32)
    got = native.box_crop_resize(m, box, 28)
    want = Mask(m.astype(np.uint8), (64, 64), "mask").box_crop(box, 28)
    np.testing.assert_allclose(got, want, atol=1e-4)

    # degenerate box → zeros
    z = native.box_crop_resize(m, np.array([50, 50, 50, 50], np.float32), 28)
    assert z.sum() == 0
