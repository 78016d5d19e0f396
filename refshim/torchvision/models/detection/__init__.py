from . import image_list, mask_rcnn, roi_heads, transform

__all__ = ["image_list", "mask_rcnn", "roi_heads", "transform"]
