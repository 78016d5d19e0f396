"""Data pipeline: Mask codec, augmentations, CSV dataset → padded batches."""

import os

import cv2
import numpy as np
import pytest

from hd_yolo_tpu.data.mask import (
    Mask,
    mask_to_polygons,
    polygons_to_mask,
    rle_decode,
    rle_encode,
)
from hd_yolo_tpu.data.augment import random_projective, random_flips, box_candidates
from hd_yolo_tpu.data.dataset import DetectionDataset, DataLoader, collate_padded


def test_rle_roundtrip(rng):
    m = (rng.uniform(0, 1, (37, 23)) > 0.6).astype(np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)
    # pycocotools convention: empty mask = single zero-run
    z = np.zeros((5, 5), np.uint8)
    assert rle_encode(z)["counts"] == [25]
    np.testing.assert_array_equal(rle_decode(rle_encode(z)), z)


def test_polygon_rasterize_roundtrip():
    poly = [np.array([[4, 4], [20, 4], [20, 16], [4, 16]], np.float32)]
    m = polygons_to_mask(poly, (24, 24))
    assert m[10, 10] == 1 and m[0, 0] == 0
    polys = mask_to_polygons(m)
    m2 = polygons_to_mask(polys, (24, 24))
    assert (m2 & m).sum() / max(m.sum(), 1) > 0.9


def test_mask_modes_and_geometry():
    poly = [np.array([[4, 4], [12, 4], [12, 12], [4, 12]], np.float32)]
    pm = Mask(poly, (16, 16), "poly")
    bm = pm.mask()
    rm = pm.rle()
    np.testing.assert_array_equal(rm.mask().m, bm.m)
    b = pm.box()
    assert tuple(b) == (4.0, 4.0, 12.0, 12.0)
    # flip horizontal: box mirrors
    fb = pm.flip(horizontal=True).box()
    assert tuple(fb) == (4.0, 4.0, 12.0, 12.0)  # symmetric square
    shifted = pm.pad(2, 3, (20, 20))
    assert tuple(shifted.box()) == (7.0, 6.0, 15.0, 14.0)
    # box_crop on the binary mask gives a filled 28x28 patch
    crop = bm.box_crop(np.array([4, 4, 12, 12]), 28)
    assert crop.shape == (28, 28) and crop.mean() > 0.8


def test_random_projective_keeps_valid_boxes(rng):
    img = np.full((64, 64, 3), 200, np.uint8)
    poly = [np.array([[20, 20], [44, 20], [44, 44], [20, 44]], np.float32)]
    ann = {
        "boxes": np.array([[20, 20, 44, 44]], np.float32),
        "labels": np.array([1]),
        "masks": [Mask(poly, (64, 64), "poly")],
    }
    np.random.seed(0)
    img2, ann2 = random_projective(img, ann, {"translate": 0.0, "scale": 0.1, "degrees": 5.0})
    assert img2.shape == img.shape
    if len(ann2["boxes"]):
        b = ann2["boxes"][0]
        assert b[2] > b[0] and b[3] > b[1]


def test_box_candidates():
    b1 = np.array([[0, 0, 20, 20]], np.float32)
    keep = box_candidates(b1, np.array([[0, 0, 1, 1]], np.float32))
    assert not keep[0]
    keep = box_candidates(b1, np.array([[0, 0, 18, 18]], np.float32))
    assert keep[0]


@pytest.fixture
def synthetic_dataset(tmp_path, rng):
    """4 images, 2 tasks; det task has boxes+poly masks, detSC has boxes only."""
    rows = []
    for i in range(4):
        img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        img_path = tmp_path / f"img{i}.png"
        cv2.imwrite(str(img_path), img)
        # det annotation with masks
        boxes = np.array([[10, 10, 40, 40], [50, 50, 90, 88]], np.float32)
        polys = np.empty(2, object)
        for j, b in enumerate(boxes):
            polys[j] = [np.array([[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]], np.float32)]
        ann_path = tmp_path / f"ann{i}_det.npz"
        np.savez(ann_path, boxes=boxes, labels=np.array([1, 2]), masks=polys, size=np.array([96, 96]))
        rows.append(
            dict(image_path=f"img{i}.png", image_id=f"im{i}", ann_id=f"a{i}d",
                 ann_path=f"ann{i}_det.npz", task_id="det", mask_mode="poly")
        )
    import pandas as pd

    csv = tmp_path / "index.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv)


def test_dataset_val_mode(synthetic_dataset):
    ds = DetectionDataset(
        synthetic_dataset, {"img_size": 128}, train=False, max_targets=16
    )
    assert len(ds) == 4 and ds.task_ids == ["det"]
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    t = s["targets"]["det"]
    assert t["boxes"].shape == (16, 4) and t["valid"].sum() == 2
    # normalized xyxy
    b = t["boxes"][t["valid"]]
    assert (b >= 0).all() and (b <= 1).all()
    np.testing.assert_allclose(b[0], [10 / 96, 10 / 96, 40 / 96, 40 / 96], atol=1e-5)
    assert t["masks"][0].mean() > 0.8  # filled box mask
    assert t["labels"][t["valid"]].tolist() == [1, 2]


def test_dataset_train_mosaic(synthetic_dataset):
    ds = DetectionDataset(
        synthetic_dataset,
        {"img_size": 128, "patch_size": 96, "k_mosaic": 2, "scale": 0.1, "translate": 0.05},
        train=True,
        max_targets=32,
    )
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    t = s["targets"]["det"]
    assert t["boxes"].shape == (32, 4)
    assert bool(t["active"])
    if t["valid"].any():
        b = t["boxes"][t["valid"]]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_loader_batches(synthetic_dataset):
    ds = DetectionDataset(synthetic_dataset, {"img_size": 128}, train=False, max_targets=8)
    dl = DataLoader(ds, batch_size=2, workers=2, shuffle=False)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 128, 128, 3)
    assert b["targets"]["det"]["boxes"].shape == (2, 8, 4)
    assert b["targets"]["det"]["valid"].dtype == bool

    # infinite loader keeps going past one epoch
    it = iter(DataLoader(ds, batch_size=2, workers=1, infinite=True))
    for _ in range(5):
        next(it)


def test_train_proc_multi_consistent_across_tasks(rng):
    """Multi-task tiles must receive ONE shared geometric transform."""
    from hd_yolo_tpu.data.augment import train_proc_multi

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    box = np.array([[20, 20, 44, 44]], np.float32)
    anns = {
        "det": {"boxes": box.copy(), "labels": np.array([1]), "masks": [None]},
        "detSC": {"boxes": box.copy(), "labels": np.array([2]), "masks": [None]},
    }
    np.random.seed(0)
    import random as _r

    _r.seed(0)
    out_img, out = train_proc_multi(img, anns, {"scale": 0.3, "translate": 0.2,
                                                "degrees": 20.0})
    if len(out["det"]["boxes"]) and len(out["detSC"]["boxes"]):
        np.testing.assert_allclose(out["det"]["boxes"], out["detSC"]["boxes"], atol=1e-4)


def test_mixup_and_copy_paste(rng):
    from hd_yolo_tpu.data.augment import copy_paste, mixup
    from hd_yolo_tpu.data.mask import Mask

    img1 = np.full((32, 32, 3), 100, np.uint8)
    img2 = np.full((32, 32, 3), 200, np.uint8)
    a1 = {"x": {"boxes": np.array([[2, 2, 10, 10]], np.float32),
                "labels": np.array([1]), "masks": [None]}}
    a2 = {"x": {"boxes": np.array([[20, 20, 30, 30]], np.float32),
                "labels": np.array([2]), "masks": [None]}}
    img, merged = mixup(img1, a1, img2, a2)
    assert merged["x"]["boxes"].shape == (2, 4)
    assert 100 <= img.mean() <= 200

    # copy_paste: masked object on the left mirrors to the right
    m = np.zeros((32, 32), np.uint8)
    m[4:10, 2:8] = 1
    ann = {"boxes": np.array([[2, 4, 8, 10]], np.float32),
           "labels": np.array([1]), "masks": [Mask(m, (32, 32), "mask")]}
    img3 = np.zeros((32, 32, 3), np.uint8)
    img3[4:10, 2:8] = 255
    out_img, out_ann = copy_paste(img3, ann, p=1.0)
    assert out_ann["boxes"].shape == (2, 4)
    assert out_img[6, 32 - 5].sum() > 0  # mirrored pixels pasted


def test_image_cache_identical_and_immutable(synthetic_dataset):
    """cache_images: identical pixels/targets as the uncached path, cache is
    populated after first touch, and cached arrays are write-protected."""
    from hd_yolo_tpu.data.dataset import DetectionDataset

    hyp = {"img_size": 96}
    plain = DetectionDataset(synthetic_dataset, hyp, train=False, max_targets=8)
    cached = DetectionDataset(synthetic_dataset, hyp, train=False, max_targets=8,
                              cache_images=True)
    for i in range(len(plain)):
        a = plain[i]
        b1 = cached[i]
        b2 = cached[i]  # second read hits the cache
        np.testing.assert_array_equal(a["image"], b1["image"])
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(
            np.asarray(a["targets"]["det"]["boxes"]),
            np.asarray(b2["targets"]["det"]["boxes"]),
        )
    assert all(im is not None for im in cached._img_cache)
    assert all(not im.flags.writeable for im in cached._img_cache)
    assert all(im is None for im in plain._img_cache)


def test_transpose_and_photometric_augs(rng):
    """Diagonal flip swaps xy of boxes/masks; photometric extras are
    image-only and shape-preserving."""
    from hd_yolo_tpu.data.augment import apply_transpose, random_photometric
    from hd_yolo_tpu.data.mask import Mask

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    poly = [np.array([[10, 20], [30, 20], [30, 40], [10, 40]], np.float32)]
    ann = {"boxes": np.array([[10, 20, 30, 40]], np.float32),
           "labels": np.array([1]),
           "masks": [Mask(poly, (64, 64), "poly")]}
    t_img, t_ann = apply_transpose(img, ann)
    np.testing.assert_array_equal(t_img, np.swapaxes(img, 0, 1))
    np.testing.assert_allclose(t_ann["boxes"], [[20, 10, 40, 30]])
    m = t_ann["masks"][0].mask().m
    src = ann["masks"][0].mask().m
    np.testing.assert_array_equal(m, src.T)
    # double transpose = identity
    b_img, b_ann = apply_transpose(t_img, t_ann)
    np.testing.assert_array_equal(b_img, img)
    np.testing.assert_allclose(b_ann["boxes"], ann["boxes"])

    out = random_photometric(img.copy(), {"photometric": 1.0})
    assert out.shape == img.shape and out.dtype == img.dtype
    assert not np.array_equal(out, img)  # p=1 applies every extra
    same = random_photometric(img.copy(), {"photometric": 0.0})
    np.testing.assert_array_equal(same, img)


def test_class_and_image_weights():
    from hd_yolo_tpu.utils.general import (
        check_img_size,
        check_version,
        labels_to_class_weights,
        labels_to_image_weights,
    )

    labels = [np.array([0, 0, 0]), np.array([0, 1, -100]), np.array([], np.int64)]
    cw = labels_to_class_weights(labels, nc=3)
    assert cw.shape == (3,)
    assert cw[2] == 0.0 and cw[1] > cw[0]           # rarer class weighs more
    np.testing.assert_allclose(cw.sum(), 2.0, rtol=1e-6)  # n nonzero classes
    iw = labels_to_image_weights(labels, 3, cw)
    assert iw[0] > 0 and iw[2] == 0.0
    assert labels_to_class_weights([None], 3).size == 0

    assert check_img_size(640, 64) == 640
    assert check_img_size(650, 64) == 704
    assert check_version("1.2.3", "1.0.3")
    assert not check_version("0.9", "1.0")
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        check_version("0.9", "1.0", hard=True)
