#!/usr/bin/env python3
"""Deployment smoke on the real chip (VERDICT r2 item 8): export the AOT
artifact, start the stdlib REST server, POST a real tile, check the response
schema + latency — the flask_rest_api/restapi.py:16-31 analog driven
end-to-end.

    python tools/deploy_smoke.py [--weights /tmp/flagship_r3/run/final]
"""

import argparse
import json
import socket
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--cfg", default="yolov5s-test")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--tasks", default="",
                    help="comma-separated header tags to smoke per-task REST "
                         "rows for (multi-task models; empty = default task)")
    ap.add_argument("--out", default="DEPLOY_SMOKE.json")
    args = ap.parse_args()

    import os

    if os.environ.get("DEPLOY_SMOKE_CPU"):  # mechanics check off-TPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.detector import Detector
    from hd_yolo_tpu.engines.evaluate import export_aot
    from hd_yolo_tpu.serving import serve

    det = Detector(args.cfg, "hyp-nuclei", args.weights, input_size=args.img)
    results = {"cfg": args.cfg, "weights": args.weights or "random-init",
               "device": str(jax.devices()[0])}

    # ---- 1. AOT export round-trip
    aot_path = "/tmp/deploy_smoke.aot"
    export_aot(det.model, det.variables, (1, args.img, args.img, 3), aot_path)
    from jax import export as jexport

    blob = Path(aot_path).read_bytes()
    reloaded = jexport.deserialize(bytearray(blob))
    out = reloaded.call(det.variables,
                        jnp.zeros((1, args.img, args.img, 3), jnp.float32))
    task = next(iter(out))
    results["aot_bytes"] = len(blob)
    results["aot_tasks"] = sorted(out)
    assert "boxes" in out[task]
    print(json.dumps({k: results[k] for k in ("aot_bytes", "aot_tasks")}),
          flush=True)

    # ---- 2. REST server + real tile POST
    port = 18123
    t = threading.Thread(target=serve, args=(det, "127.0.0.1", port),
                         daemon=True)
    t.start()
    for _ in range(50):
        try:
            socket.create_connection(("127.0.0.1", port), 1).close()
            break
        except OSError:
            time.sleep(0.2)

    # a rendered synthetic H&E tile (same generator as the training check) so
    # trained weights actually produce detections in the response
    from tools.flagship_train_check import render_tile

    rng = np.random.default_rng(0)
    tile, _, _, _ = render_tile(rng, args.img, 30)
    tile = cv2.cvtColor(tile, cv2.COLOR_RGB2BGR)  # POST bytes are decoded BGR
    ok, png = cv2.imencode(".png", tile)
    assert ok
    boundary = "smokeboundary"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="image"; filename="tile.png"\r\n'
            f"Content-Type: image/png\r\n\r\n").encode() + png.tobytes() + \
        f"\r\n--{boundary}--\r\n".encode()
    def post_tile(task=None):
        q = f"?task={task}" if task else ""
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/object-detection{q}", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        # first request compiles; second is steady state
        urllib.request.urlopen(req, timeout=1500).read()
        t0 = time.time()
        resp = json.loads(urllib.request.urlopen(req, timeout=1500).read())
        return resp, round(time.time() - t0, 3)

    resp, results["rest_latency_s"] = post_tile()
    rows = resp if isinstance(resp, list) else resp.get("predictions", resp)
    results["rest_n_rows"] = len(rows)
    if rows:
        row = rows[0]
        assert {"xmin", "ymin", "xmax", "ymax", "confidence",
                "class"} <= set(row) or {"boxes", "scores"} <= set(row), row
        results["rest_row_keys"] = sorted(rows[0])
    for task in [t for t in args.tasks.split(",") if t]:
        tresp, lat = post_tile(task)
        trows = tresp if isinstance(tresp, list) else tresp.get(
            "predictions", tresp)
        assert all(r.get("task") == task for r in trows), (task, trows[:1])
        results[f"rest_rows_{task}"] = len(trows)
        results[f"rest_latency_{task}_s"] = lat
    print(json.dumps({k: results[k] for k in results if k.startswith("rest")}),
          flush=True)

    # ---- 3. /v1/slide on a synthetic multi-tile slide (serving.py:81-86)
    slide_px = args.img + args.img // 2   # forces a 2x2 tile grid
    simg = np.full((slide_px, slide_px, 3), 230, np.uint8)
    simg += rng.integers(-12, 12, simg.shape).astype(np.uint8)
    from tools.flagship_train_check import CLASS_AXES, CLASS_COLORS

    gt = 0
    for _ in range(60):
        c = int(rng.integers(1, 5))
        ax, ay = CLASS_AXES[c]
        cx = int(rng.integers(ax + 2, slide_px - ax - 2))
        cy = int(rng.integers(ay + 2, slide_px - ay - 2))
        poly = cv2.ellipse2Poly((cx, cy), (ax, ay),
                                int(rng.integers(0, 180)), 0, 360, 12)
        cv2.fillPoly(simg, [poly], CLASS_COLORS[c])
        gt += 1
    ok, spng = cv2.imencode(".png", cv2.cvtColor(simg, cv2.COLOR_RGB2BGR))
    assert ok
    sbody = (f"--{boundary}\r\nContent-Disposition: form-data; "
             f'name="image"; filename="slide.png"\r\n'
             f"Content-Type: image/png\r\n\r\n").encode() + spng.tobytes() + \
        f"\r\n--{boundary}--\r\n".encode()
    sreq = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/slide", data=sbody,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    urllib.request.urlopen(sreq, timeout=1800).read()   # compile
    t0 = time.time()
    sresp = json.loads(urllib.request.urlopen(sreq, timeout=1800).read())
    results["slide_latency_s"] = round(time.time() - t0, 3)
    srows = sresp if isinstance(sresp, list) else sresp.get("predictions", sresp)
    results["slide_px"] = slide_px
    results["slide_gt_nuclei"] = gt
    results["slide_n_rows"] = len(srows)
    if srows:
        # records must be in SLIDE coordinates: some box beyond one tile
        assert any(max(r.get("xmax", 0), r.get("ymax", 0)) > args.img
                   for r in srows), "no detection beyond the first tile"
    print(json.dumps({k: results[k] for k in results
                      if k.startswith("slide")}), flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
