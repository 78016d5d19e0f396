"""skimage.util subset: crop/pad (image_utils.py:215-219)."""

import numpy as np


def crop(ar, crop_width, copy=False, order="K"):
    ar = np.asarray(ar)
    if isinstance(crop_width, int):
        crop_width = [(crop_width, crop_width)] * ar.ndim
    crops = []
    for cw in crop_width:
        if isinstance(cw, int):
            cw = (cw, cw)
        elif len(cw) == 1:
            cw = (cw[0], cw[0])
        crops.append(cw)
    crops += [(0, 0)] * (ar.ndim - len(crops))
    slices = tuple(slice(a, d - b if b else None)
                   for (a, b), d in zip(crops, ar.shape))
    cropped = ar[slices]
    return np.array(cropped, order=order, copy=True) if copy else cropped


def pad(ar, pad_width, mode="constant", **kwargs):
    return np.pad(np.asarray(ar), pad_width, mode=mode, **kwargs)


def dtype_limits(image, clip_negative=False):
    """(min, max) intensity range of the image's dtype — the published
    skimage contract (also re-exported at top level pre-0.16, which is where
    the reference's adjust_* family calls it: image_utils.py:542,548,555)."""
    img = np.asarray(image)
    if img.dtype == np.bool_:
        lo, hi = False, True
    elif np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        lo, hi = info.min, info.max
    else:
        lo, hi = -1.0, 1.0
    if clip_negative:
        lo = max(lo, 0)
    return lo, hi
