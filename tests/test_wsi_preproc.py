"""WSI tiling/stitching + device preprocessing tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.wsi import sliding_window_grid, extract_tiles, slide_inference
from hd_yolo_tpu.data.preproc import (
    letterbox_batch,
    hsv_jitter,
    flips,
    normalize,
    _rgb2hsv,
    _hsv2rgb,
)


def test_grid_covers_slide():
    g = sliding_window_grid(1000, 1500, tile=640, overlap=64)
    assert g.min() >= 0
    assert (g[:, 0] + 640 <= 1000).all() and (g[:, 1] + 640 <= 1500).all()
    # coverage: union of tiles touches all 4 corners
    assert (g == [0, 0]).all(1).any()
    assert ((g[:, 0] == 1000 - 640) & (g[:, 1] == 1500 - 640)).any()
    # small slide → single tile
    assert len(sliding_window_grid(320, 320, 640, 64)) == 1


def test_extract_tiles_content(rng):
    slide = jnp.asarray(rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))
    origins = jnp.asarray([[0, 0], [100, 60]], jnp.int32)
    tiles = np.asarray(extract_tiles(slide, origins, 64))
    np.testing.assert_array_equal(tiles[0], np.asarray(slide)[:64, :64])
    np.testing.assert_array_equal(tiles[1], np.asarray(slide)[100:164, 60:124])


def test_slide_inference_stitching(rng):
    """Toy detector: reports a fixed box at tile-local (10,10)-(30,30) per tile.
    Stitched output must be in slide coords and deduped by global NMS."""
    D = 4

    def forward(tiles):
        B = tiles.shape[0]
        boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 30.0, 30.0]]), (B, D, 1))
        # only first det valid per tile
        valid = jnp.tile(jnp.asarray([True] + [False] * (D - 1)), (B, 1))
        scores = jnp.tile(jnp.asarray([0.9] + [0.0] * (D - 1)), (B, 1))
        labels = jnp.ones((B, D), jnp.int32)
        return {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}

    slide = jnp.zeros((200, 328, 3))
    out = slide_inference(forward, slide, tile=128, overlap=28, batch=2, max_total=64)
    v = out["valid"]
    kept_boxes = out["boxes"][v]
    # tile grid: ys = [0, 72], xs = [0, 100, 200]; 6 tiles, all boxes distinct
    assert v.sum() == 6
    want = {(y + 10, x + 10) for y in (0, 72) for x in (0, 100, 200)}
    got = {(int(b[1]), int(b[0])) for b in kept_boxes}
    assert got == want


def test_slide_inference_dedups_overlap():
    """Detections from overlapping tiles pointing at the same slide location
    must collapse to one."""

    def forward(tiles):
        B = tiles.shape[0]
        # each tile sees a box at slide coords (50,50)-(70,70); convert to local
        return {
            "boxes": jnp.tile(jnp.asarray([[40.0, 40.0, 60.0, 60.0]]), (B, 1, 1)),
            "scores": jnp.full((B, 1), 0.8),
            "labels": jnp.ones((B, 1), jnp.int32),
            "valid": jnp.ones((B, 1), bool),
        }

    # two tiles offset by 10 px: local box (40..60) maps to (40..60) and (50..70)
    slide = jnp.zeros((128, 138, 3))
    out = slide_inference(forward, slide, tile=128, overlap=118, batch=2, max_total=16)
    boxes = out["boxes"][out["valid"]]
    # the two boxes are offset 10px on x only: intersection 10×20=200,
    # union 2·400−200=600 → IoU 0.33 < 0.45 → BOTH survive global NMS
    assert out["valid"].sum() == 2


def test_slide_inference_with_masks():
    """Forward emitting masks with capacity R < max_det must stitch without
    index corruption, and each surviving mask must travel with its box
    (regression: masks were flattened at R-capacity but indexed at
    max_det-capacity)."""
    D, R = 4, 2  # det capacity > mask capacity

    def forward(tiles):
        B = tiles.shape[0]
        boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 30.0, 30.0]]), (B, D, 1))
        valid = jnp.tile(jnp.asarray([True] + [False] * (D - 1)), (B, 1))
        scores = jnp.tile(jnp.asarray([0.9] + [0.0] * (D - 1)), (B, 1))
        labels = jnp.ones((B, D), jnp.int32)
        # mask fingerprint = tile mean intensity, so we can match mask↔tile
        fp = jnp.mean(tiles, axis=(1, 2, 3))
        masks = jnp.tile(fp[:, None, None, None], (1, R, 8, 8))
        mask_valid = jnp.tile(jnp.asarray([True] + [False] * (R - 1)), (B, 1))
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid, "masks": masks, "mask_valid": mask_valid}

    # give every tile a distinct intensity so fingerprints differ
    H, W, tile, overlap = 200, 328, 128, 28
    slide = np.zeros((H, W, 3), np.float32)
    grid = sliding_window_grid(H, W, tile, overlap)
    for i, (y, x) in enumerate(grid):  # later tiles overwrite overlaps — fine,
        slide[y : y + tile, x : x + tile] = 0.1 * (i + 1)  # fp is tile-mean anyway
    expect_fp = {
        (int(y), int(x)): float(slide[y : y + tile, x : x + tile].mean())
        for y, x in grid
    }

    out = slide_inference(
        forward, jnp.asarray(slide), tile=tile, overlap=overlap, batch=2, max_total=64
    )
    v = out["valid"]
    assert v.sum() == len(grid)
    assert out["masks"].shape[1:] == (8, 8)
    for b, m, mv in zip(out["boxes"][v], out["masks"][v], out["mask_valid"][v]):
        assert mv  # every kept det was a mask-slot-0 det
        origin = (int(b[1]) - 10, int(b[0]) - 10)
        np.testing.assert_allclose(m, expect_fp[origin], atol=1e-5)


def test_letterbox_and_hsv(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 100, 200, 3)).astype(np.float32))
    padded, gain, (px, py) = letterbox_batch(imgs, (128, 128))
    assert padded.shape == (2, 128, 128, 3)
    assert gain == 128 / 200
    # top/bottom pad filled
    np.testing.assert_allclose(np.asarray(padded)[:, : int(py) - 1], 114 / 255.0, atol=1e-6)

    out = hsv_jitter(imgs, jax.random.PRNGKey(0))
    assert out.shape == imgs.shape
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1.0
    # zero gains → identity
    same = hsv_jitter(imgs, jax.random.PRNGKey(0), 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(same), np.asarray(imgs), atol=1e-4)


def test_hsv_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32))
    back = _hsv2rgb(_rgb2hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_hsv_matches_colorsys(rng):
    """Both directions against the stdlib reference (roundtrip alone would
    pass a matched pair of bugs).  Guards the where-select rewrite of
    _hsv2rgb (jnp.choose was a per-element gather, ~360 ms/batch on TPU)."""
    import colorsys

    x = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    hsv = np.asarray(_rgb2hsv(jnp.asarray(x[None, None])))[0, 0]
    rgb = np.asarray(_hsv2rgb(jnp.asarray(hsv[None, None])))[0, 0]
    for k in range(64):
        want_hsv = colorsys.rgb_to_hsv(*x[k])
        np.testing.assert_allclose(hsv[k], want_hsv, atol=1e-5)
        np.testing.assert_allclose(rgb[k], x[k], atol=1e-5)


def test_flips_consistency(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([[0.1, 0.2, 0.5, 0.6]]), (4, 3, 1))
    out_img, out_boxes, (lr, ud) = flips(imgs, boxes, jax.random.PRNGKey(1))
    lr, ud = np.asarray(lr), np.asarray(ud)
    for b in range(4):
        want = np.asarray(imgs[b])
        wb = np.array([0.1, 0.2, 0.5, 0.6])
        if lr[b]:
            want = want[:, ::-1]
            wb = np.array([1 - 0.5, 0.2, 1 - 0.1, 0.6])
        if ud[b]:
            want = want[::-1]
            wb = np.array([wb[0], 1 - wb[3], wb[2], 1 - wb[1]])
        np.testing.assert_allclose(np.asarray(out_img[b]), want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_boxes[b, 0]), wb, atol=1e-6)


def test_normalize():
    x = jnp.full((1, 2, 2, 3), 255.0)
    np.testing.assert_allclose(np.asarray(normalize(x)), 1.0)


def test_slide_inference_over_mask_capacity():
    """VERDICT r2 weak #4: a tile with more surviving detections than mask
    capacity (R < n_det) must surface mask_valid=False (not a silently-zero
    mask treated as real) for detections gathered from slots >= R, and
    mask_valid=True masks must be intact."""
    D, R = 12, 4  # 12 valid dets per tile, only 4 mask slots

    def forward(tiles):
        B, t = tiles.shape[0], tiles.shape[1]
        # non-overlapping 16px boxes in a row: NMS suppresses nothing
        x0 = 20.0 * jnp.arange(D) + 2.0
        boxes = jnp.stack([x0, jnp.full((D,), 2.0), x0 + 16.0,
                           jnp.full((D,), 18.0)], -1)
        boxes = jnp.tile(boxes[None], (B, 1, 1))
        scores = jnp.tile(jnp.linspace(0.9, 0.5, D)[None], (B, 1))
        return {
            "boxes": boxes, "scores": scores,
            "labels": jnp.ones((B, D), jnp.int32),
            "valid": jnp.ones((B, D), bool),
            "masks": jnp.ones((B, R, 8, 8), jnp.float32),
            "mask_valid": jnp.ones((B, R), bool),
        }

    slide = jnp.zeros((256, 256, 3), jnp.float32)
    out = slide_inference(forward, slide, tile=256, overlap=0, batch=1,
                          max_total=64)
    v = out["valid"]
    assert v.sum() == D
    mv = out["mask_valid"][v]
    # exactly the R in-capacity slots carry real masks...
    assert mv.sum() == R
    for m, ok in zip(out["masks"][v], mv):
        if ok:
            np.testing.assert_allclose(m, 1.0)
        else:  # ...and over-capacity slots are explicit: invalid + zero
            np.testing.assert_allclose(m, 0.0)


def test_slide_inference_derives_mask_valid():
    """A forward that emits masks WITHOUT mask_valid still gets correct
    capacity semantics (mask_valid derived from valid[:, :R] + pad)."""
    D, R = 6, 2

    def forward(tiles):
        B = tiles.shape[0]
        x0 = 30.0 * jnp.arange(D) + 2.0
        boxes = jnp.stack([x0, jnp.full((D,), 2.0), x0 + 20.0,
                           jnp.full((D,), 25.0)], -1)
        return {
            "boxes": jnp.tile(boxes[None], (B, 1, 1)),
            "scores": jnp.tile(jnp.linspace(0.9, 0.4, D)[None], (B, 1)),
            "labels": jnp.ones((B, D), jnp.int32),
            "valid": jnp.ones((B, D), bool),
            "masks": jnp.ones((B, R, 8, 8), jnp.float32),
        }

    out = slide_inference(forward, jnp.zeros((200, 200, 3), jnp.float32),
                          tile=200, overlap=0, batch=1, max_total=32)
    v = out["valid"]
    assert v.sum() == D
    assert "mask_valid" in out
    assert out["mask_valid"][v].sum() == R


def test_slide_inference_fused_matches_streaming(rng):
    """fused=True (one-dispatch scan program) must reproduce the streaming
    path exactly: same kept set, boxes, scores, masks — incl. capacity
    padding, grid-pad duplicate tiles and mask_valid semantics."""
    D, M = 6, 3

    def forward(fvars, tiles):
        B = tiles.shape[0]
        mean = tiles.mean(axis=(1, 2, 3))
        boxes = jnp.zeros((B, D, 4))
        boxes = boxes.at[:, 0].set(jnp.asarray([5.0, 7.0, 60.0, 50.0]))
        boxes = boxes.at[:, 1].set(jnp.asarray([70.0, 70.0, 110.0, 100.0]))
        scores = jnp.zeros((B, D))
        scores = scores.at[:, 0].set(0.6 + 0.3 * mean + fvars["bias"])
        scores = scores.at[:, 1].set(0.5 + 0.2 * mean)
        labels = jnp.tile(jnp.arange(D) % 2, (B, 1)).astype(jnp.int32)
        valid = jnp.zeros((B, D), bool).at[:, :2].set(True)
        masks = mean[:, None, None, None] * jnp.ones((B, M, 8, 8))
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid, "masks": masks}

    fvars = {"bias": jnp.float32(0.05)}
    slide = jnp.asarray(rng.uniform(0, 1, (300, 430, 3)).astype(np.float32))
    kw = dict(tile=128, overlap=28, batch=4, max_total=64)  # 12 tiles → pad 4
    a = slide_inference(forward, slide, forward_vars=fvars, **kw)
    b = slide_inference(forward, slide, forward_vars=fvars, fused=True, **kw)
    assert set(a) == set(b)
    assert np.array_equal(a["valid"], b["valid"])
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
    assert a["valid"].sum() > 0
    # uint8 quantization in fused mode
    q = slide_inference(forward, slide, forward_vars=fvars, fused=True,
                        mask_uint8=True, **kw)
    assert q["masks"].dtype == np.uint8
    np.testing.assert_allclose(
        q["masks"].astype(np.float32),
        np.round(np.clip(b["masks"], 0, 1) * 255), atol=1,
    )


@pytest.mark.parametrize("H,W", [(320, 416), (300, 410)])
def test_band_limited_stitch_matches_full_nms(rng, H, W):
    """Band-limited stitching (NMS only over overlap-band detections) must
    reproduce the full global NMS exactly: per-tile survivors are mutually
    below the threshold and interior boxes cannot intersect other tiles'
    boxes (wsi/tiling._band_flags invariant).  The (300, 410) case is NOT
    stride-aligned: sliding_window_grid snaps the last row/col inward, the
    effective overlap between the last two tiles exceeds the nominal one,
    and the band width must widen to match (ADVICE r4 high)."""
    from hd_yolo_tpu.wsi.tiling import sliding_window_grid

    tile, overlap = 128, 32
    grid = sliding_window_grid(H, W, tile, overlap)
    # per-tile detections on a 40px lattice of 24px boxes (mutual IoU 0
    # within a tile; lattice-aligned across tiles -> exact duplicates in the
    # overlap bands with different scores)
    per_tile = []
    for (y0, x0) in grid:
        cells = [(cy, cx) for cy in range(8, tile - 26, 40)
                 for cx in range(8, tile - 26, 40)]
        take = rng.permutation(len(cells))[: rng.integers(4, len(cells))]
        boxes, scores, labels = [], [], []
        for t in take:
            cy, cx = cells[t]
            # slide-aligned coords so overlap duplicates coincide exactly
            gy, gx = y0 + cy, x0 + cx
            gy, gx = gy - gy % 8, gx - gx % 8
            boxes.append([gx - x0, gy - y0, gx - x0 + 24, gy - y0 + 24])
            scores.append(float(rng.uniform(0.2, 0.95)))
            labels.append(int(rng.integers(1, 3)))
        per_tile.append((np.asarray(boxes, np.float32),
                         np.asarray(scores, np.float32),
                         np.asarray(labels, np.int32)))

    D = 16
    calls = {"i": 0}

    def forward(tiles):
        B = tiles.shape[0]
        bx = np.zeros((B, D, 4), np.float32)
        sc = np.zeros((B, D), np.float32)
        lb = np.ones((B, D), np.int32)
        va = np.zeros((B, D), bool)
        for j in range(B):
            k = min(calls["i"], len(per_tile) - 1)
            b, s, l = per_tile[k]
            n = min(len(b), D)
            bx[j, :n], sc[j, :n], lb[j, :n], va[j, :n] = b[:n], s[:n], l[:n], True
            calls["i"] += 1
        return {"boxes": jnp.asarray(bx), "scores": jnp.asarray(sc),
                "labels": jnp.asarray(lb), "valid": jnp.asarray(va)}

    slide = jnp.zeros((H, W, 3))
    kw = dict(tile=tile, overlap=overlap, batch=2, max_total=256)
    calls["i"] = 0
    full = slide_inference(forward, slide, band_limit=False, **kw)
    calls["i"] = 0
    banded = slide_inference(forward, slide, band_limit=True, **kw)

    def rows(out):
        v = out["valid"]
        return {tuple(np.round(b, 2)) + (round(float(s), 4), int(l))
                for b, s, l in zip(out["boxes"][v], out["scores"][v],
                                   out["labels"][v])}

    assert rows(full) == rows(banded)
    assert banded["valid"].sum() > 10  # non-trivial scene


@pytest.mark.parametrize("fused", [False, True])
def test_mask_row_compaction_and_row_keys(rng, fused):
    """Device-side mask-row compaction (mask_rows=K fetches only the top-K
    mask rows + a slot index) must be output-identical to the dense fetch
    while the capacity holds; over capacity the LOWEST-scored rows lose
    mask_valid.  row_keys drops non-whitelisted per-row outputs."""
    D, M = 6, 4

    def forward(fvars, tiles):
        B = tiles.shape[0]
        mean = tiles.mean(axis=(1, 2, 3))
        boxes = jnp.zeros((B, D, 4))
        boxes = boxes.at[:, 0].set(jnp.asarray([5.0, 7.0, 60.0, 50.0]))
        boxes = boxes.at[:, 1].set(jnp.asarray([70.0, 70.0, 110.0, 100.0]))
        scores = jnp.zeros((B, D))
        scores = scores.at[:, 0].set(0.55 + 0.4 * mean)
        scores = scores.at[:, 1].set(0.25 + 0.2 * mean)
        labels = jnp.tile(1 + jnp.arange(D) % 2, (B, 1)).astype(jnp.int32)
        valid = jnp.zeros((B, D), bool).at[:, :2].set(True)
        masks = (0.6 + 0.4 * mean[:, None, None, None]
                 ) * jnp.ones((B, M, 8, 8))
        extra = jnp.ones((B, D, 3))  # stand-in for score_vector
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid, "masks": masks, "score_vector": extra}

    fvars = {"bias": jnp.float32(0.0)}
    slide = jnp.asarray(rng.uniform(0, 1, (300, 430, 3)).astype(np.float32))
    kw = dict(tile=128, overlap=28, batch=4, max_total=64, fused=fused,
              forward_vars=fvars)
    dense = slide_inference(forward, slide, mask_rows=None, **kw)
    comp = slide_inference(forward, slide, mask_rows=32, **kw)  # ≥ eligible
    assert set(dense) == set(comp)
    mv = dense["mask_valid"]
    for k in dense:
        if k == "masks":  # meaningful only where mask_valid; compacted
            np.testing.assert_allclose(dense[k][mv], comp[k][mv], atol=1e-6)
            assert not comp[k][~mv].any()  # zeroed, not garbage
        else:
            np.testing.assert_allclose(dense[k], comp[k], atol=1e-6,
                                       err_msg=k)

    # bit-packed masks through the compact path too
    compb = slide_inference(forward, slide, mask_rows=32, mask_bits=True,
                            **kw)
    np.testing.assert_array_equal(compb["masks"][mv], dense["masks"][mv] > 0.5)

    # over-capacity: only the lowest-scored mask rows lose mask_valid
    tiny = slide_inference(forward, slide, mask_rows=4, **kw)
    lost = dense["mask_valid"] & ~tiny["mask_valid"]
    if lost.any():
        assert (dense["scores"][lost].max()
                <= dense["scores"][tiny["mask_valid"]].min() + 1e-6)
    kept = tiny["mask_valid"]
    np.testing.assert_allclose(tiny["masks"][kept], dense["masks"][kept],
                               atol=1e-6)
    assert not tiny["masks"][~kept].any()

    # row_keys: whitelisted payload only; core keys always survive
    lite = slide_inference(forward, slide, row_keys=("masks",), **kw)
    assert "score_vector" not in lite
    for k in ("boxes", "scores", "labels", "valid", "masks", "mask_valid"):
        assert k in lite, k
    np.testing.assert_allclose(lite["boxes"], dense["boxes"], atol=1e-6)


def test_band_limit_snapped_grid_duplicate_suppressed():
    """ADVICE r4 high repro: tile=256, overlap=32, H=300 → the snapped last
    row origin is 44, so the two tiles share a 212px strip; a duplicate box
    deep inside both tiles' nominal (overlap+margin) interiors used to bypass
    the band NMS and get kept twice.  The geometry-derived band width must
    suppress it exactly like full NMS."""
    tile, overlap, H, W = 256, 32, 300, 256
    box = np.asarray([100.0, 150.0, 140.0, 190.0])  # slide coords, in both
    D = 4

    def forward(tiles):
        B = tiles.shape[0]
        bx = np.zeros((B, D, 4), np.float32)
        sc = np.zeros((B, D), np.float32)
        lb = np.ones((B, D), np.int32)
        va = np.zeros((B, D), bool)
        origins = [(0, 0), (44, 0)]
        for j in range(min(B, 2)):
            y0, x0 = origins[j]
            bx[j, 0] = box - np.asarray([x0, y0, x0, y0])
            sc[j, 0] = 0.9 - 0.1 * j
            va[j, 0] = True
        return {"boxes": jnp.asarray(bx), "scores": jnp.asarray(sc),
                "labels": jnp.asarray(lb), "valid": jnp.asarray(va)}

    slide = jnp.zeros((H, W, 3))
    kw = dict(tile=tile, overlap=overlap, batch=2, max_total=64)
    full = slide_inference(forward, slide, band_limit=False, **kw)
    banded = slide_inference(forward, slide, band_limit=True, **kw)
    assert int(full["valid"].sum()) == 1
    assert int(banded["valid"].sum()) == 1
    kept = banded["boxes"][banded["valid"]]
    np.testing.assert_allclose(kept[0], box, atol=1e-4)
    assert float(banded["scores"][banded["valid"]][0]) == pytest.approx(0.9)
