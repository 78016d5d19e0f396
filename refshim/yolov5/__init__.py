"""Shim package for the reference's external ``yolov5`` dependency
(ultralytics checkout assumed side-by-side upstream).  Only the import is
needed: ``hnet/backbones.py:10`` imports ``yolov5.yolo.Model`` but no code
path in the reference tree constructs it (HNet builds Swin or timm
backbones, hnet.py:111-121)."""
from . import yolo  # noqa: F401
