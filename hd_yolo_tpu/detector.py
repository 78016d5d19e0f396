"""User-facing inference API — the AutoShape / Detections analog.

Behavioral reference: ``AutoShape`` + ``Detections``
(``/root/reference/metayolo/common.py:376-570``): accept numpy/PIL/path
inputs of any size, letterbox to the model frame, run jitted inference,
rescale boxes back, expose pandas/record exports and overlay rendering.
``DetectMultiBackend``'s ten deployment backends collapse to the one jitted
path + the jax.export AOT artifact (SURVEY.md §7.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import load_cfg
from .data.preproc import letterbox_batch, normalize
from .engines.checkpoint import load_inference
from .models import Model
from .ops.boxes import scale_coords


class Detections:
    """Per-image results holder with convenience exports (common.py:468-570)."""

    def __init__(self, records: List[Dict[str, Dict[str, np.ndarray]]],
                 images: List[np.ndarray], labels_text: Optional[Dict[int, str]] = None):
        self.records = records
        self.images = images
        self.labels_text = labels_text or {}

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]

    def to_records(self, task: Optional[str] = None) -> List[Dict[str, Any]]:
        rows = []
        for i, rec in enumerate(self.records):
            for t, o in rec.items():
                if task and t != task:
                    continue
                for b, s, l in zip(o["boxes"], o["scores"], o["labels"]):
                    rows.append({
                        "image": i, "task": t,
                        "xmin": float(b[0]), "ymin": float(b[1]),
                        "xmax": float(b[2]), "ymax": float(b[3]),
                        "confidence": float(s), "class": int(l),
                        "name": self.labels_text.get(int(l), str(int(l))),
                    })
        return rows

    def pandas(self, task: Optional[str] = None):
        import pandas as pd

        return pd.DataFrame(self.to_records(task))

    def render(self, i: int = 0, task: Optional[str] = None) -> np.ndarray:
        from .engines.plots import overlay_detections

        rec = self.records[i]
        t = task or next(iter(rec))
        o = rec[t]
        return overlay_detections(
            self.images[i], o["boxes"], o["labels"], o["scores"], o.get("masks"),
            labels_text=self.labels_text,
        )


class Detector:
    """Any-input inference wrapper around a trained model."""

    def __init__(
        self,
        cfg: Union[str, dict] = "yolov5l6-mask",
        hyp: Union[str, dict] = "hyp-nuclei",
        weights: Optional[str] = None,
        input_size: int = 640,
        dtype=jnp.bfloat16,
        labels_text: Optional[Dict[int, str]] = None,
        seed: int = 0,
        **model_kwargs,
    ):
        self.model = Model.from_cfg(cfg, hyp, dtype=dtype, **model_kwargs)
        self.input_size = input_size
        self.labels_text = labels_text or {}
        if weights:
            # pin params to device once: load_inference returns HOST arrays,
            # and jit would re-upload the full ~0.3 GB flagship tree through
            # the tunnel on EVERY call (measured 11-27 s/request in serving)
            self.variables = jax.device_put(load_inference(weights))
        else:
            x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
            self.variables = jax.jit(
                lambda k: self.model.init(k, x0, train=False, compute_masks=True)
            )(jax.random.PRNGKey(seed))
        self._fwd = jax.jit(
            lambda v, x, cm: self.model.apply(v, x, train=False, compute_masks=cm),
            static_argnames=("cm",),
        )
        self._task_fwd: Dict[Any, Any] = {}

    @staticmethod
    def _to_numpy(im) -> np.ndarray:
        if isinstance(im, str):
            import cv2

            arr = cv2.imread(im)
            assert arr is not None, f"cannot read {im}"
            return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
        if hasattr(im, "convert"):  # PIL
            return np.asarray(im.convert("RGB"))
        return np.asarray(im)

    def __call__(
        self,
        images: Union[Any, Sequence[Any]],
        compute_masks: bool = True,
        task: Optional[str] = None,
    ) -> Detections:
        """Run every header; ``task`` filters the returned records to one
        header (REST ``?task=`` rides this — multi-task models per
        yolo.py:62-76)."""
        single = not isinstance(images, (list, tuple))
        if single:
            images = [images]
        arrs = [self._to_numpy(im) for im in images]
        sizes = [a.shape[:2] for a in arrs]

        records: List[Dict[str, Dict[str, np.ndarray]]] = []
        # group identical sizes to batch; simple per-size batching
        for a, (h, w) in zip(arrs, sizes):
            x = normalize(jnp.asarray(a)[None])
            padded, gain, (px, py) = letterbox_batch(x, (self.input_size, self.input_size))
            _, out = self._fwd(self.variables, padded, compute_masks)
            rec: Dict[str, Dict[str, np.ndarray]] = {}
            for t, o in out.items():
                v = np.asarray(o["valid"][0])
                boxes = np.asarray(
                    scale_coords(
                        (self.input_size, self.input_size),
                        o["boxes"][0],
                        (h, w),
                        ratio_pad=((gain, gain), (px, py)),
                    )
                )
                entry = {
                    "boxes": boxes[v],
                    "scores": np.asarray(o["scores"][0])[v],
                    "labels": np.asarray(o["labels"][0])[v],
                }
                if "masks" in o:
                    # masks cover only the first R (score-ordered) detections;
                    # pad to full capacity so rows stay aligned with boxes[v]
                    m = np.asarray(o["masks"][0])
                    R, D = m.shape[0], v.shape[0]
                    mfull = np.zeros((D,) + m.shape[1:], m.dtype)
                    mfull[:R] = m
                    hm = np.zeros((D,), bool)
                    hm[:R] = np.asarray(o.get("mask_valid", o["valid"][:, :R])[0])
                    entry["masks"] = mfull[v]
                    entry["has_mask"] = hm[v]
                rec[t] = entry
            if task is not None:
                rec = {task: rec[task]}
            records.append(rec)
        return Detections(records, arrs, self.labels_text)

    def slide(
        self,
        image: Any,
        task: Optional[str] = None,
        tile: Optional[int] = None,
        overlap: int = 64,
        batch: int = 8,
        compute_masks: bool = True,
        fused: bool = True,
        mask_uint8: bool = False,
        iou_thres: float = 0.45,
        max_total: int = 4096,
    ) -> Detections:
        """Tiled whole-slide inference with stitched global NMS.

        The product form of the reference's tile → ``merge_outputs`` →
        ``rescale_outputs`` flow (``yolo_head.py:450-471``): the slide goes to
        device once (uint8 stays uint8 — the model normalizes at entry), tiles
        are extracted on device, and detections come back in slide coords.
        ``fused=True`` runs extraction+forward+stitching as one jitted program.

        Returns a one-record :class:`Detections` (record key = ``task``).
        """
        from .wsi.tiling import slide_inference

        arr = self._to_numpy(image)
        tile = tile or self.input_size
        task = task or self.model.spec.headers[0].tag
        h, w = arr.shape[:2]
        if h < tile or w < tile:  # small slides: pad to one full tile
            arr = np.pad(arr, ((0, max(0, tile - h)), (0, max(0, tile - w)), (0, 0)))

        key = (task, compute_masks)
        if key not in self._task_fwd:
            self._task_fwd[key] = jax.jit(
                lambda v, t: self.model.apply(
                    v, t, train=False, compute_masks=compute_masks
                )[1][task]
            )
        out = slide_inference(
            self._task_fwd[key], jnp.asarray(arr),
            tile=tile, overlap=overlap, batch=batch, iou_thres=iou_thres,
            max_total=max_total, mask_uint8=mask_uint8,
            fused=fused, forward_vars=self.variables,
        )
        v = out["valid"]
        # drop detections that only exist inside the small-slide pad
        inb = (out["boxes"][:, 0] < w) & (out["boxes"][:, 1] < h)
        v = v & inb
        entry: Dict[str, np.ndarray] = {
            "boxes": np.minimum(out["boxes"][v], [w, h, w, h]),
            "scores": out["scores"][v],
            "labels": out["labels"][v],
        }
        if "masks" in out:
            entry["masks"] = out["masks"][v]
            entry["has_mask"] = out["mask_valid"][v]
        return Detections([{task: entry}], [arr[:h, :w]], self.labels_text)
