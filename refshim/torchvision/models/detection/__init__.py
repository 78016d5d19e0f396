from . import (_utils, faster_rcnn, image_list, mask_rcnn, roi_heads, rpn,
               transform)

__all__ = ["_utils", "faster_rcnn", "image_list", "mask_rcnn", "roi_heads",
           "rpn", "transform"]
