"""segment_max_with_argmax + paste_masks_in_image behavior tests."""

import numpy as np
import jax.numpy as jnp

from hd_yolo_tpu.ops import segment_max_with_argmax, paste_masks_in_image


def test_segment_max_basic():
    vals = jnp.asarray([0.1, 0.9, 0.5, 0.7, 0.2])
    ids = jnp.asarray([0, 0, 1, 1, 1])
    mx, arg = segment_max_with_argmax(vals, ids, num_segments=3)
    np.testing.assert_allclose(np.asarray(mx[:2]), [0.9, 0.7])
    np.testing.assert_array_equal(np.asarray(arg[:2]), [1, 3])
    # empty segment: sentinel index == len(values)
    assert int(arg[2]) == 5


def test_segment_max_ties_pick_first():
    vals = jnp.asarray([0.5, 0.5, 0.5])
    ids = jnp.asarray([0, 0, 0])
    _, arg = segment_max_with_argmax(vals, ids, num_segments=1)
    assert int(arg[0]) == 0


def test_segment_max_random_vs_numpy(rng):
    n, s = 200, 17
    vals = rng.standard_normal(n).astype(np.float32)
    ids = rng.integers(0, s, n)
    mx, arg = segment_max_with_argmax(jnp.asarray(vals), jnp.asarray(ids), num_segments=s)
    for seg in range(s):
        members = np.where(ids == seg)[0]
        if len(members):
            want_max = vals[members].max()
            np.testing.assert_allclose(float(mx[seg]), want_max, rtol=1e-6)
            assert vals[int(arg[seg])] == want_max
        else:
            assert int(arg[seg]) == n


def test_paste_masks_box_interior():
    K, M, H, W = 2, 8, 32, 48
    masks = jnp.ones((K, M, M))
    boxes = jnp.asarray([[8.0, 8.0, 24.0, 24.0], [0.0, 0.0, 48.0, 32.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, H, W))
    assert out.shape == (K, H, W)
    # center of box 0 fully inside → ~1; far outside → 0
    assert out[0, 16, 16] > 0.99
    assert out[0, 2, 40] == 0.0
    assert out[1].mean() > 0.9  # full-frame box


def test_paste_masks_chunked_consistent(rng):
    K, M = 70, 8
    masks = rng.uniform(0, 1, (K, M, M)).astype(np.float32)
    xy = rng.uniform(0, 20, (K, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + rng.uniform(4, 10, (K, 2))], -1).astype(np.float32)
    a = np.asarray(paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), 40, 40, chunk=128))
    b = np.asarray(paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), 40, 40, chunk=16))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
