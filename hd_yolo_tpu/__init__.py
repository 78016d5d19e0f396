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

# Persistent XLA compilation cache (measured: the flagship train graph takes
# ~10 min to compile over the remote-compile tunnel; a cache hit is <1 s).
# Replaces nothing in the reference (TorchScript re-scripts per process) —
# this is the TPU-native analog of warm-started deployment.  Opt out with
# HDYOLO_NO_COMPILE_CACHE=1 or by setting JAX_COMPILATION_CACHE_DIR yourself.
if not os.environ.get("HDYOLO_NO_COMPILE_CACHE"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hd_yolo_tpu", "xla"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")

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
