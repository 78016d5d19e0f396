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
    finally:
        server.shutdown()
