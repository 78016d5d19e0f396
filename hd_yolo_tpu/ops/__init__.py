"""TPU-native compute kernels replacing the reference's torchvision/torch_scatter C++/CUDA ops.

See SURVEY.md §2.3 for the native-dependency inventory this package covers:
  boxes.py      — coordinate converts + IoU family (utils_general.py:109-297)
  nms.py        — padded fixed-shape NMS (utils_general.py:299-356, torchvision.ops.nms)
  roi_align.py  — bilinear ROI-align (torchvision.ops.roi_align)
  paste.py      — paste_masks_in_image equivalent (torchvision C++ paths)
  scatter.py    — segment max/argmax (torch_scatter.scatter_max)
"""

from .boxes import (  # noqa: F401
    box_area,
    box_iou,
    bbox_iou,
    clip_boxes,
    mask_iou,
    paired_box_iou,
    wh_iou,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
    scale_coords,
)
from .nms import nms_padded, batched_nms_padded  # noqa: F401
from .roi_align import roi_align, multiscale_roi_align  # noqa: F401
from .paste import paste_masks_in_image  # noqa: F401
from .scatter import segment_max_with_argmax  # noqa: F401
