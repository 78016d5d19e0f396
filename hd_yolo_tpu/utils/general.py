"""Misc training utilities.

Behavioral reference: ``/root/reference/metayolo/models/utils_general.py``
(:41-93 ``labels_to_class_weights``/``labels_to_image_weights``, :96-107
``check_img_size``) and ``/root/reference/metayolo/__init__.py:93``
``check_version``.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np


def labels_to_class_weights(labels: Sequence[np.ndarray], nc: int) -> np.ndarray:
    """Inverse-frequency class weights over per-image label arrays
    (utils_general.py:41-62): ignore negative (unlabeled) ids, weight 1/count
    for present classes, 0 for absent, normalized to sum to the number of
    non-empty classes."""
    if not len(labels) or labels[0] is None:
        return np.zeros(0, np.float32)
    classes = np.concatenate([np.asarray(l).reshape(-1) for l in labels]).astype(np.int64)
    classes = classes[classes >= 0]
    counts = np.bincount(classes, minlength=nc)[:nc]
    weights = np.where(counts > 0, 1.0 / np.maximum(counts, 1), 0.0)
    n_nonzero = int((counts > 0).sum())
    total = weights.sum()
    if total > 0:
        weights = weights / total * n_nonzero
    return weights.astype(np.float32)


def labels_to_image_weights(labels: Sequence[np.ndarray], nc: int,
                            class_weights: np.ndarray) -> np.ndarray:
    """Per-image sampling weights = Σ_class class_weight·count
    (utils_general.py:85-93) — feed to a weighted sampler for
    class-balanced epochs."""
    out = np.zeros(len(labels), np.float64)
    cw = np.asarray(class_weights, np.float64).reshape(-1)[:nc]
    for i, l in enumerate(labels):
        cls = np.asarray(l).reshape(-1).astype(np.int64)
        cls = cls[cls >= 0]
        counts = np.bincount(cls, minlength=nc)[:nc]
        out[i] = float((cw * counts).sum())
    return out


def check_img_size(img_size: int, stride: int = 32, floor: int = 0) -> int:
    """Round the image size up to a multiple of the max stride
    (utils_general.py check_img_size semantics: warn-and-adjust)."""
    new = max(int(np.ceil(img_size / stride) * stride), floor)
    if new != img_size:
        import logging

        logging.getLogger("hd_yolo_tpu").warning(
            f"img_size {img_size} is not a multiple of stride {stride}; using {new}"
        )
    return new


def check_version(current: str, minimum: str, name: str = "version",
                  hard: bool = False) -> bool:
    """Dotted-version >= comparison (metayolo/__init__.py:93)."""

    def parse(v: str):
        return tuple(int(x) for x in re.findall(r"\d+", v)[:3])

    ok = parse(current) >= parse(minimum)
    if not ok and hard:
        raise AssertionError(f"{name} {minimum} required, found {current}")
    return ok
