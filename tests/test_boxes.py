"""Golden tests for box geometry vs independent numpy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.ops import (
    bbox_iou,
    box_iou,
    clip_boxes,
    mask_iou,
    paired_box_iou,
    wh_iou,
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
)


def _np_iou_matrix(a, b):
    n, m = len(a), len(b)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            xx1 = max(a[i, 0], b[j, 0])
            yy1 = max(a[i, 1], b[j, 1])
            xx2 = min(a[i, 2], b[j, 2])
            yy2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            out[i, j] = inter / (area_a + area_b - inter)
    return out


def random_boxes(rng, n, scale=100.0):
    xy = rng.uniform(0, scale, (n, 2))
    wh = rng.uniform(scale * 0.01, scale / 2, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_xywh_roundtrip(rng):
    boxes = random_boxes(rng, 50)
    back = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(boxes))))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-4)


def test_xywhn_roundtrip(rng):
    boxes = random_boxes(rng, 20, scale=600.0)
    n = xyxy2xywhn(jnp.asarray(boxes), w=640, h=480)
    back = np.asarray(xywhn2xyxy(n, w=640, h=480))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-3)


def test_box_iou_matrix(rng):
    a, b = random_boxes(rng, 17), random_boxes(rng, 13)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou_matrix(a, b), rtol=1e-5, atol=1e-6)


def test_paired_box_iou(rng):
    a, b = random_boxes(rng, 25), random_boxes(rng, 25)
    got = np.asarray(paired_box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.diag(_np_iou_matrix(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bbox_iou_plain_matches_paired(rng):
    a, b = random_boxes(rng, 25), random_boxes(rng, 25)
    got = np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b), xywh=False)).squeeze(-1)
    want = np.diag(_np_iou_matrix(a, b))
    # bbox_iou adds +eps to h and union; tolerance covers it
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_ciou_bounds_and_identity(rng):
    a = random_boxes(rng, 10)
    a_xywh = np.asarray(xyxy2xywh(jnp.asarray(a)))
    same = np.asarray(bbox_iou(jnp.asarray(a_xywh), jnp.asarray(a_xywh), xywh=True, CIoU=True))
    np.testing.assert_allclose(same.squeeze(-1), 1.0, atol=1e-5)
    b = random_boxes(rng, 10)
    b_xywh = np.asarray(xyxy2xywh(jnp.asarray(b)))
    ciou = np.asarray(bbox_iou(jnp.asarray(a_xywh), jnp.asarray(b_xywh), xywh=True, CIoU=True))
    assert np.all(ciou <= 1.0) and np.all(ciou >= -1.5)


def test_wh_iou():
    wh1 = jnp.asarray([[2.0, 2.0]])
    wh2 = jnp.asarray([[2.0, 2.0], [4.0, 4.0], [1.0, 4.0]])
    got = np.asarray(wh_iou(wh1, wh2))
    np.testing.assert_allclose(got[0], [1.0, 4 / 16, 2 / (4 + 4 - 2)], rtol=1e-6)


def test_clip_boxes():
    b = jnp.asarray([[-5.0, -5.0, 700.0, 500.0]])
    got = np.asarray(clip_boxes(b, (480, 640)))
    np.testing.assert_allclose(got, [[0, 0, 640, 480]])


def test_mask_iou_dice():
    a = jnp.ones((2, 1, 4, 4))
    b = jnp.ones((2, 1, 4, 4))
    np.testing.assert_allclose(np.asarray(mask_iou(a, b, factor="dice")), 1.0)
    np.testing.assert_allclose(np.asarray(mask_iou(a, b, factor="iou")), 1.0)
    half = a.at[:, :, :2].set(0.0)
    np.testing.assert_allclose(np.asarray(mask_iou(half, b, factor="iou")), 0.5)
