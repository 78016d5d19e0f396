"""skimage.measure subset: find_contours / label / regionprops-lite
(reference display path: metayolo/datasets.py overlay helpers)."""

import cv2
import numpy as np
from scipy import ndimage


def find_contours(image, level=0.5, **kwargs):
    """Iso-contours of a 2-D array as (row, col) float arrays (cv2-based
    approximation of the published marching-squares contract)."""
    mask = (np.asarray(image, np.float64) > level).astype(np.uint8)
    cs, _ = cv2.findContours(mask, cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE)
    out = []
    for c in cs:
        xy = c[:, 0, :].astype(np.float64)          # (N, [col, row])
        out.append(xy[:, ::-1])                      # → (row, col)
    return out


def label(image, connectivity=None, return_num=False):
    lab, n = ndimage.label(np.asarray(image))
    return (lab, n) if return_num else lab
