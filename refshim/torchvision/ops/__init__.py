from . import boxes, misc, poolers
from ._roi_align import roi_align
from .boxes import (batched_nms, box_area, box_iou, clip_boxes_to_image, nms,
                    remove_small_boxes)
from .misc import FrozenBatchNorm2d
from .poolers import MultiScaleRoIAlign

__all__ = [
    "boxes", "misc", "poolers", "roi_align", "nms", "batched_nms", "box_iou",
    "box_area", "clip_boxes_to_image", "remove_small_boxes",
    "FrozenBatchNorm2d", "MultiScaleRoIAlign",
]
