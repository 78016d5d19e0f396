"""Model assembly: config-driven backbone / neck / multi-task headers.

Mirrors the reference's split (``/root/reference/metayolo/models/yolov5.py:155-161``):
the trunk (backbone + FPN neck) is task-agnostic and shared; each task header
owns its anchors, losses, NMS params, mask branch and label hierarchy.
"""

from .layers import ConvBnAct  # noqa: F401
from .builder import build_network_spec, parse_model_cfg  # noqa: F401
from .yolo import Model  # noqa: F401
from .detect_head import Detect  # noqa: F401
