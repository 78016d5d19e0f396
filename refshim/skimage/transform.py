"""skimage.transform subset over cv2 (resize/rescale; order 0/1/3 map to
nearest/bilinear/bicubic)."""

import cv2
import numpy as np

_INTERP = {0: cv2.INTER_NEAREST, 1: cv2.INTER_LINEAR, 3: cv2.INTER_CUBIC}


def resize(image, output_shape, order=1, preserve_range=False,
           anti_aliasing=None, **kwargs):
    image = np.asarray(image)
    h, w = int(output_shape[0]), int(output_shape[1])
    src = image if preserve_range else np.asarray(
        __import__("skimage").img_as_float(image))
    out = cv2.resize(src, (w, h), interpolation=_INTERP.get(order, cv2.INTER_LINEAR))
    if image.ndim == 3 and out.ndim == 2:
        out = out[..., None]
    return out


def rescale(image, scale, order=1, preserve_range=False, **kwargs):
    image = np.asarray(image)
    h = int(round(image.shape[0] * scale))
    w = int(round(image.shape[1] * scale))
    return resize(image, (h, w), order=order, preserve_range=preserve_range)
