"""hd_yolo_tpu — TPU-native multi-task nuclei detection / instance segmentation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``impromptuRong/hd_yolo`` framework (multi-level nuclei/nodule detection +
instance/panoptic segmentation for digital-pathology whole-slide images).

Design principles (TPU-first, not a port):
  * NHWC layouts, bf16 compute, static shapes everywhere (padded + masked
    detection structures instead of data-dependent filtering).
  * All hot ops (NMS, ROI-align, mask paste, matcher) are jit-compatible
    XLA/Pallas programs — no host round-trips inside the step.
  * Scaling via ``jax.sharding.Mesh`` + NamedSharding: batch over the ``data``
    axis, WSI tile grids over the ``tile`` axis; collectives ride ICI.

Reference parity map lives in SURVEY.md; each module's docstring cites the
reference file:line ranges whose behavior it reproduces.
"""

import logging
import os

__version__ = "0.1.0"

LOGGER = logging.getLogger("hd_yolo_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(os.environ.get("HD_YOLO_LOGLEVEL", "INFO"))

from .config import load_cfg  # noqa: E402,F401

_LAZY = {
    "Detector": ".detector",
    "Detections": ".detector",
    "Model": ".models",
    "Ensemble": ".models.ensemble",
    "HNet": ".hnet",
}


def __getattr__(name):  # lazy top-level API: hd_yolo_tpu.Detector etc.
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
