"""ctypes bindings for the first-party C++ data-pipeline core.

Loads ``native/libhdyolo_native.so`` (built via ``make -C native``; auto-built
on first import when a compiler is available).  Every entry point has a numpy
fallback in data/mask.py, so the package works without the native library —
it just runs the per-sample hot loop slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from . import LOGGER

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhdyolo_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    if not os.path.isfile(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.isfile(_LIB_PATH)
    except Exception as e:  # no compiler / build failure → numpy fallback
        LOGGER.debug(f"native build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.rle_decode.argtypes = [p_i64, i64, i64, i64, p_u8]
    lib.rle_encode.argtypes = [p_u8, i64, i64, p_i64, i64]
    lib.rle_encode.restype = i64
    lib.fill_polys.argtypes = [p_f32, p_i64, i64, i64, i64, p_u8]
    lib.bilinear_resize.argtypes = [p_f32, i64, i64, p_f32, i64, i64]
    lib.box_crop_resize.argtypes = [p_f32, i64, i64, p_f32, p_f32, i64]
    lib.box_crop_resize.restype = i64
    lib.rle_decode_batch.argtypes = [p_i64, p_i64, p_i64, i64, i64, i64, p_u8]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def rle_decode(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    c = np.ascontiguousarray(counts, np.int64)
    out = np.empty((h, w), np.uint8)
    lib.rle_decode(c, len(c), h, w, out)
    return out


def rle_encode(mask: np.ndarray) -> List[int]:
    lib = get_lib()
    assert lib is not None
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    buf = np.empty(h * w + 2, np.int64)
    n = lib.rle_encode(m, h, w, buf, len(buf))
    assert n > 0
    return buf[:n].tolist()


def fill_polys(polys: Sequence[np.ndarray], h: int, w: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    polys = [np.ascontiguousarray(p, np.float32).reshape(-1, 2) for p in polys if len(p) >= 3]
    out = np.zeros((h, w), np.uint8)
    if not polys:
        return out
    pts = np.ascontiguousarray(np.concatenate(polys), np.float32)
    sizes = np.asarray([len(p) for p in polys], np.int64)
    lib.fill_polys(pts, sizes, len(polys), h, w, out)
    return out


def bilinear_resize(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    s = np.ascontiguousarray(src, np.float32)
    out = np.empty((dh, dw), np.float32)
    lib.bilinear_resize(s, s.shape[0], s.shape[1], out, dh, dw)
    return out


def box_crop_resize(mask: np.ndarray, box: np.ndarray, m: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(mask, np.float32)
    b = np.ascontiguousarray(box, np.float32)
    out = np.zeros((m, m), np.float32)
    rc = lib.box_crop_resize(src, src.shape[0], src.shape[1], b, out, m)
    if rc != 0:
        out[:] = 0
    return out
