"""Shim for the one ``mmcv`` name the reference imports
(`/root/reference/hnet/swin_transformer.py:15`: ``load_checkpoint``)."""

from . import runner  # noqa: F401
