"""Minimal scikit-image surface for the reference's image_utils
(``/root/reference/metayolo/engines/image_utils.py:9-23``) and IO call sites
(evaluation.py:7, utils_nucls via DIPModels).  Conversions follow the
published skimage dtype contract (img_as_*), color math uses the standard
public formulas (HSV via matplotlib, H&E stain separation via the
Ruifrok–Johnston matrices)."""

import numpy as np

__version__ = "0.19.0+hdyolo.shim"


def img_as_float32(img):
    return _as_float(img, np.float32)


def img_as_float64(img):
    return _as_float(img, np.float64)


def img_as_float(img):
    if np.issubdtype(np.asarray(img).dtype, np.floating):
        return np.asarray(img)
    return _as_float(img, np.float64)


def _as_float(img, dtype):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return (img / 255.0).astype(dtype)
    if img.dtype == np.uint16:
        return (img / 65535.0).astype(dtype)
    if img.dtype == np.bool_:
        return img.astype(dtype)
    if np.issubdtype(img.dtype, np.signedinteger):
        info = np.iinfo(img.dtype)
        return (img / max(abs(info.min), info.max)).astype(dtype)
    return img.astype(dtype)


def img_as_ubyte(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    if img.dtype == np.bool_:
        return img.astype(np.uint8) * 255
    if img.dtype == np.uint16:
        return (img // 257).astype(np.uint8)
    if np.issubdtype(img.dtype, np.floating):
        return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    raise TypeError(f"img_as_ubyte shim: unsupported dtype {img.dtype}")


def img_as_uint(img):
    img = np.asarray(img)
    if img.dtype == np.uint16:
        return img
    if img.dtype == np.uint8:
        return img.astype(np.uint16) * 257
    if np.issubdtype(img.dtype, np.floating):
        return np.clip(np.round(img * 65535.0), 0, 65535).astype(np.uint16)
    raise TypeError(f"img_as_uint shim: unsupported dtype {img.dtype}")


def img_as_int(img):
    img = np.asarray(img)
    if np.issubdtype(img.dtype, np.floating):
        return np.clip(np.round(img * 32767.0), -32768, 32767).astype(np.int16)
    return img.astype(np.int16)


def img_as_bool(img):
    img = np.asarray(img)
    if img.dtype == np.bool_:
        return img
    if np.issubdtype(img.dtype, np.floating):
        return img >= 0.5
    return img >= (np.iinfo(img.dtype).max // 2 + 1)


from . import color, io, morphology, transform, util  # noqa: E402
from .util import dtype_limits  # noqa: E402  (pre-0.16 top-level re-export)

__all__ = ["color", "io", "morphology", "transform", "util", "__version__",
           "img_as_float32", "img_as_float64", "img_as_float", "img_as_ubyte",
           "img_as_uint", "img_as_int", "img_as_bool"]

from . import draw  # noqa: E402

__all__.append("draw")

from . import measure  # noqa: E402

__all__.append("measure")
