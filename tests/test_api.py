"""User-facing API: Detector/Detections, NuCLS converter, REST serving."""

import json
import threading
import urllib.request

import cv2
import numpy as np
import pytest

from hd_yolo_tpu.data.nucls import (
    CLASSES,
    VAL_TO_LABEL,
    convert_to_coco,
    get_slide_id,
    parse_fov_csv,
)


def test_val_to_label_map():
    assert VAL_TO_LABEL["tumor"] == 1
    assert VAL_TO_LABEL["fibroblast"] == 2
    assert VAL_TO_LABEL["plasma cell"] == 3
    assert VAL_TO_LABEL["unlabeled"] == -100
    assert VAL_TO_LABEL["tumor nuclei"] == 1  # identity entries


def test_get_slide_id():
    assert get_slide_id("TCGA-XX-YYYY-DX1_fov1") == "TCGA-XX-YYYY-DX1"


def test_parse_fov_csv(tmp_path):
    import pandas as pd

    df = pd.DataFrame(
        {
            "group": ["tumor", "fibroblast", "unlabeled"],
            "type": ["polyline", "rectangle", "polyline"],
            "xmin": [10, 50, 80], "ymin": [10, 50, 80],
            "xmax": [30, 70, 90], "ymax": [30, 70, 90],
            # first polyline has ≥4 unique xs (valid); third is degenerate
            "coords_x": ["10,30,28,12,10", "", "80,80,80,80"],
            "coords_y": ["10,12,30,28,20", "", "80,81,82,83"],
        }
    )
    p = tmp_path / "fov.csv"
    df.to_csv(p)
    ann = parse_fov_csv(str(p))
    assert ann["labels"].tolist() == [1, 2, -100]
    assert ann["masks"][0].shape == (5, 2)
    assert ann["masks"][1] is None
    assert ann["masks"][2] is None  # degenerate polyline dropped


def test_convert_to_coco(tmp_path):
    boxes = np.array([[5, 5, 25, 25]], np.float32)
    polys = np.empty(1, object)
    polys[0] = [np.array([[5, 5], [25, 5], [25, 25], [5, 25]], np.float32)]
    np.savez(tmp_path / "a0.npz", boxes=boxes, labels=np.array([1]),
             masks=polys, size=np.array([32, 32]))
    (tmp_path / "index.csv").write_text(
        "image_path,image_id,ann_id,ann_path,task_id,mask_mode\n"
        "img.png,im0,a0,a0.npz,det,poly\n"
    )
    coco = convert_to_coco(str(tmp_path / "index.csv"), str(tmp_path / "coco.json"))
    assert len(coco["images"]) == 1 and len(coco["annotations"]) == 1
    a = coco["annotations"][0]
    assert a["bbox"] == [5.0, 5.0, 20.0, 20.0]
    assert "segmentation" in a and a["segmentation"]["size"] == [32, 32]
    assert len(coco["categories"]) == len(CLASSES)


@pytest.fixture(scope="module")
def detector():
    from hd_yolo_tpu.detector import Detector

    return Detector("yolov5s-test", "hyp-nuclei", input_size=128,
                    max_masks=8, pre_nms_topk=64,
                    labels_text={1: "tumor", 2: "stromal"})


@pytest.mark.slow
def test_detector_any_input(tmp_path, detector, rng):
    img = rng.integers(0, 255, (100, 160, 3), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    res = detector([img, path])
    assert len(res) == 2
    rows = res.to_records()
    for r in rows:
        assert 0 <= r["xmin"] <= 160 and 0 <= r["ymax"] <= 100
    df = res.pandas()
    assert set(df.columns) >= {"xmin", "confidence", "name"} or len(df) == 0
    panel = res.render(0)
    assert panel.shape == img.shape


@pytest.mark.slow
def test_detector_slide(detector, rng):
    """Detector.slide: stitched whole-slide records in slide coords; fused
    and streaming paths agree; small slides pad up to one tile."""
    slide = rng.integers(0, 255, (300, 300, 3), dtype=np.uint8)
    res = detector.slide(slide, tile=128, overlap=28, batch=2, max_total=64)
    assert len(res) == 1
    rec = res[0]
    task = next(iter(rec))
    o = rec[task]
    assert o["boxes"].shape[1] == 4
    assert (o["boxes"][:, [0, 1]] <= 300).all() if len(o["boxes"]) else True
    stream = detector.slide(slide, tile=128, overlap=28, batch=2,
                            max_total=64, fused=False)
    s = stream[0][task]
    assert np.array_equal(np.asarray(o["labels"]), np.asarray(s["labels"]))
    np.testing.assert_allclose(o["boxes"], s["boxes"], atol=1e-4)
    # smaller than one tile: pads, still returns a record
    tiny = detector.slide(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8),
                          tile=128, batch=1, max_total=16)
    t = tiny[0][task]
    if len(t["boxes"]):
        assert (t["boxes"][:, 0] < 80).all() and (t["boxes"][:, 1] < 64).all()


@pytest.mark.slow
def test_rest_serving(detector, rng):
    import hd_yolo_tpu.serving as serving
    from http.server import ThreadingHTTPServer

    serving._detector = detector
    server = ThreadingHTTPServer(("127.0.0.1", 0), serving.Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".png", img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/object-detection/hd_yolo",
            data=enc.tobytes(), headers={"Content-Type": "image/png"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.load(r)
        assert isinstance(payload, list)
        # slide endpoint: tiled + stitched, records in slide coordinates
        big = rng.integers(0, 255, (200, 260, 3), dtype=np.uint8)
        ok, enc2 = cv2.imencode(".png", big)
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/slide/hd_yolo",
            data=enc2.tobytes(), headers={"Content-Type": "image/png"},
        )
        with urllib.request.urlopen(req2) as r:
            payload2 = json.load(r)
        assert isinstance(payload2, list)
        for row in payload2:
            assert 0 <= row["xmin"] <= 260 and 0 <= row["ymax"] <= 200
    finally:
        server.shutdown()


def test_convert_to_yolo_and_detectron2(tmp_path):
    import cv2

    from hd_yolo_tpu.data.nucls import convert_to_detectron2, convert_to_yolo

    cv2.imwrite(str(tmp_path / "img.png"),
                np.zeros((32, 32, 3), np.uint8))
    boxes = np.array([[5, 5, 25, 25], [0, 0, 2, 40]], np.float32)  # 2nd clips
    polys = np.empty(2, object)
    polys[0] = [np.array([[5, 5], [25, 5], [25, 25], [5, 25]], np.float32)]
    polys[1] = []
    np.savez(tmp_path / "a0.npz", boxes=boxes, labels=np.array([1, 2]),
             masks=polys, size=np.array([32, 32]))
    (tmp_path / "index.csv").write_text(
        "image_path,image_id,ann_id,ann_path,task_id,mask_mode\n"
        "img.png,im0,a0,a0.npz,det,poly\n"
    )

    out = convert_to_yolo(str(tmp_path / "index.csv"), str(tmp_path / "yolo"),
                          masks_dir=str(tmp_path / "yolo_masks"))
    lines = (tmp_path / "yolo" / "labels" / "im0.txt").read_text().splitlines()
    assert len(lines) == 2
    cls, cx, cy, w, h = lines[0].split()
    assert cls == "0"  # 1-based → 0-based
    np.testing.assert_allclose([float(cx), float(cy), float(w), float(h)],
                               [15 / 32, 15 / 32, 20 / 32, 20 / 32])
    assert (tmp_path / "yolo" / "images" / "im0.png").exists()
    assert (tmp_path / "yolo_masks" / "im0.pkl").exists()

    recs = convert_to_detectron2(str(tmp_path / "index.csv"),
                                 str(tmp_path / "d2.pkl"))
    assert len(recs) == 1
    anns = recs[0]["annotations"]
    assert len(anns) == 2
    assert anns[0]["bbox_mode"] == 0 and anns[0]["category_id"] == 0
    assert anns[0]["bbox"] == [5.0, 5.0, 25.0, 25.0]
    assert len(anns[0]["segmentation"]) >= 1  # flattened-xy polygon list
    assert anns[1]["bbox"] == [0.0, 0.0, 2.0, 32.0]  # clipped to image
    assert anns[1]["segmentation"] == []
    assert (tmp_path / "d2.pkl").exists()
