"""The reference aliases ``yolov5.yolo.Model`` (hnet/backbones.py:10) but
never instantiates it; metayolo's own Model is the in-tree equivalent the
fork evolved from, so point the alias there."""
from metayolo.models.yolo import Model  # noqa: F401
