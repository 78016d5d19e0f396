"""WSI (whole-slide image) spatial scaling: tile grids, batched on-device
tile extraction, stitched slide inference.

This is the domain's analog of sequence parallelism (SURVEY.md §5.7): the
reference tiles gigapixel slides with ``sliding_window_scanner`` +
``extract_roi_feature_maps`` (``/root/reference/hnet/utils.py:37-147``) and
stitches with ``Detect.merge_outputs`` / ``Ensemble.merge``; here the tile
grid is a sharded batch axis and stitching is a global class-aware NMS.
"""

from .tiling import (  # noqa: F401
    sliding_window_grid,
    extract_tiles,
    slide_inference,
    slide_inference_sharded,
)
