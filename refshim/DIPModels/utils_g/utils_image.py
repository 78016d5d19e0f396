"""Stand-in for the author's private DIPModels.utils_g.utils_image, which
``/root/reference/utils_nucls.py:11`` wildcard-imports.  Only the names the
reference's evaluation path executes are implemented (rgba2rgb, img_as,
get_mask_bbox, the re-exported stdlib/skimage handles); plotting helpers are
minimal matplotlib versions."""

import numbers  # noqa: F401  (re-exported via the wildcard import)
import os  # noqa: F401
from collections import defaultdict  # noqa: F401

import numpy as np
from matplotlib import pyplot as plt  # noqa: F401

import skimage  # noqa: F401  (the shim package)
import skimage.io  # noqa: F401
from skimage import (img_as_bool, img_as_float, img_as_float32,  # noqa: F401
                     img_as_float64, img_as_int, img_as_ubyte, img_as_uint)
from skimage.color import gray2rgb, rgba2rgb  # noqa: F401


def img_as(dtype):
    """Return the converter for a dtype spec ('float32', np.uint8, ...)."""
    key = np.dtype(dtype).name if not isinstance(dtype, str) else dtype
    table = {
        "float32": img_as_float32, "float64": img_as_float64,
        "float": img_as_float, "uint8": img_as_ubyte, "uint16": img_as_uint,
        "int16": img_as_int, "bool": img_as_bool,
    }
    return table[key]


def get_mask_bbox(mask):
    """[x1, y1, x2, y2] extent of a binary mask (empty -> [-1]*4)."""
    pos = np.where(np.asarray(mask) > 0)
    if len(pos[0]) == 0:
        return [-1, -1, -1, -1]
    return [np.min(pos[1]), np.min(pos[0]), np.max(pos[1]), np.max(pos[0])]


def plot_image(ax, image, **kwargs):
    ax.imshow(image, **kwargs)
    ax.axis("off")
    return ax


def overlay_detections(ax, bboxes=None, labels=None, masks=None, scores=None,
                       labels_color=None, labels_text=None, show_bboxes=True,
                       show_texts=True, show_masks=True, show_scores=True):
    import matplotlib.patches as patches

    if bboxes is not None and show_bboxes:
        for i, b in enumerate(np.asarray(bboxes)):
            ax.add_patch(patches.Rectangle((b[0], b[1]), b[2] - b[0], b[3] - b[1],
                                           fill=False, linewidth=1))
    return ax


class ColorDodge:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, image, *args, **kwargs):
        return image


class ColorJitter(ColorDodge):
    pass


class Normalize(ColorDodge):
    pass
