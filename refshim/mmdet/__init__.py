"""Shim for the one ``mmdet`` name the reference imports
(`/root/reference/hnet/swin_transformer.py:16`: ``get_root_logger``)."""

from . import utils  # noqa: F401
