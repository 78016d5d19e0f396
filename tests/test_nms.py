"""NMS parity vs a naive sequential greedy reference (= torchvision.ops.nms)."""

import numpy as np
import jax
import jax.numpy as jnp

from hd_yolo_tpu.ops import nms_padded, batched_nms_padded
from hd_yolo_tpu.ops.nms import nms_per_image


def np_nms(boxes, scores, iou_thr):
    """Sequential greedy NMS, stable desc sort by score (ties: lower index first)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (ai + aj - inter) > iou_thr:
                suppressed[j] = True
    return np.array(keep, np.int32)


def random_boxes(rng, n, scale=100.0):
    xy = rng.uniform(0, scale, (n, 2))
    wh = rng.uniform(4, scale / 2, (n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_nms_matches_greedy(rng):
    for trial in range(5):
        n = 200
        boxes = random_boxes(rng, n, scale=80.0)  # dense → many overlaps
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        want = np_nms(boxes, scores, 0.45)[:50]
        idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.45, 50)
        got = np.asarray(idx)[np.asarray(keep)]
        np.testing.assert_array_equal(got, want)


def test_nms_respects_validity(rng):
    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[: n // 2] = True
    want = np_nms(boxes[: n // 2], scores[: n // 2], 0.5)
    idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 32)
    got = np.asarray(idx)[np.asarray(keep)]
    np.testing.assert_array_equal(got, want[:32])


def test_nms_all_invalid():
    boxes = jnp.zeros((16, 4))
    idx, keep = nms_padded(boxes, jnp.zeros(16), jnp.zeros(16, bool), 0.5, 8)
    assert not np.asarray(keep).any()


def test_nms_max_det_truncation(rng):
    n = 100
    # Non-overlapping boxes → all kept → truncated at max_det in score order.
    boxes = np.stack(
        [np.arange(n) * 20.0, np.zeros(n), np.arange(n) * 20.0 + 10, np.full(n, 10.0)], -1
    ).astype(np.float32)
    scores = rng.permutation(n).astype(np.float32) / n
    idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5, 10)
    got = np.asarray(idx)[np.asarray(keep)]
    want = np.argsort(-scores, kind="stable")[:10]
    np.testing.assert_array_equal(got, want)


def test_nms_tile_boundaries(rng):
    """Exercise multiple tiles + cross-tile suppression with small tile size."""
    n = 300
    boxes = random_boxes(rng, n, scale=60.0)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    want = np_nms(boxes, scores, 0.3)[:100]
    idx, keep = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.3, 100, tile=32
    )
    got = np.asarray(idx)[np.asarray(keep)]
    np.testing.assert_array_equal(got, want)


def test_batched_nms_classes_dont_suppress(rng):
    # identical boxes in different classes must both survive
    boxes = np.tile(random_boxes(rng, 1), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([0, 1], np.int32)
    idx, keep = batched_nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), jnp.ones(2, bool), 0.5, 4
    )
    assert int(np.asarray(keep).sum()) == 2


def test_nms_per_image_shapes_and_filtering(rng):
    K, nc = 128, 4
    preds = np.zeros((K, 5 + nc + 1), np.float32)
    preds[:, 0:2] = rng.uniform(100, 500, (K, 2))
    preds[:, 2:4] = rng.uniform(8, 60, (K, 2))
    preds[:, 4] = rng.uniform(0, 1, K)
    preds[:, 5 : 5 + nc] = rng.uniform(0, 1, (K, nc))
    preds[:, -1] = rng.integers(0, 4, K)
    out = nms_per_image(jnp.asarray(preds), nc=nc, conf_thres=0.3, iou_thres=0.45, max_det=32)
    assert out["boxes"].shape == (32, 4)
    assert out["scores"].shape == (32, 1 + nc)
    assert out["extra"].shape == (32, 1)
    v = np.asarray(out["valid"])
    # every kept det must have obj score > conf_thres
    assert np.all(np.asarray(out["scores"])[v, 0] > 0.3)
    # batched via vmap compiles and runs
    batch = jnp.stack([jnp.asarray(preds)] * 3)
    outs = jax.vmap(lambda p: nms_per_image(p, nc=nc, conf_thres=0.3, iou_thres=0.45, max_det=32))(
        batch
    )
    assert outs["boxes"].shape == (3, 32, 4)


def test_pallas_nms_matches_xla(rng):
    """The VMEM-resident Pallas sweep must be bit-identical to the XLA
    formulation (interpret mode on CPU; hardware is exercised by bench/WSI)."""
    from hd_yolo_tpu.ops.pallas_nms import nms_padded_pallas

    for K, thr in ((128, 0.45), (384, 0.3), (1024, 0.6)):
        b = np.concatenate(
            [rng.uniform(0, 600, (K, 2)), rng.uniform(4, 64, (K, 2))], -1
        ).astype(np.float32)
        b[:, 2:] += b[:, :2]
        s = rng.uniform(0, 1, K).astype(np.float32)
        v = rng.uniform(0, 1, K) > 0.1
        i1, k1 = nms_padded(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v), thr, 300)
        i2, k2 = nms_padded_pallas(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v),
                                   thr, 300, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    # degenerate probes: all invalid, duplicates, non-multiple-of-128 K
    K = 200
    b = np.tile(np.asarray([[10, 10, 50, 50]], np.float32), (K, 1))
    s = np.linspace(1, 0, K).astype(np.float32)
    v = np.ones(K, bool)
    i1, k1 = nms_padded(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v), 0.45, 16)
    i2, k2 = nms_padded_pallas(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v),
                               0.45, 16, interpret=True)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    assert int(np.asarray(k2).sum()) == 1
    v0 = np.zeros(K, bool)
    _, k3 = nms_padded_pallas(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v0),
                              0.45, 16, interpret=True)
    assert int(np.asarray(k3).sum()) == 0


def test_presorted_fast_path_identical(rng):
    """presorted=True on already-sorted inputs == full argsort path."""
    from hd_yolo_tpu.ops.pallas_nms import nms_padded_pallas

    K = 300
    b = np.concatenate([rng.uniform(0, 600, (K, 2)), rng.uniform(4, 64, (K, 2))], -1
                       ).astype(np.float32)
    b[:, 2:] += b[:, :2]
    s = rng.uniform(0, 1, K).astype(np.float32)
    v = rng.uniform(0, 1, K) > 0.2
    order = np.argsort(-np.where(v, s, -np.inf), kind="stable")
    bs, ss, vs = b[order], s[order], v[order]
    i0, k0 = nms_padded(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs), 0.45, 100)
    i1, k1 = nms_padded(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs), 0.45, 100,
                        presorted=True)
    i2, k2 = nms_padded_pallas(jnp.asarray(bs), jnp.asarray(ss), jnp.asarray(vs),
                               0.45, 100, presorted=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k2))
