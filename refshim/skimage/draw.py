"""skimage.draw subset: polygon2mask / polygon (utils_nucls.py:102
``format_annotations`` rasterizes NuCLS polyline annotations)."""

import numpy as np
from matplotlib.path import Path


def polygon2mask(image_shape, polygon):
    """Boolean mask from (N, 2) (row, col) polygon vertices."""
    polygon = np.asarray(polygon, float)
    h, w = int(image_shape[0]), int(image_shape[1])
    rr, cc = np.mgrid[0:h, 0:w]
    pts = np.stack([rr.ravel(), cc.ravel()], -1)
    mask = Path(polygon).contains_points(pts, radius=0.5)
    return mask.reshape(h, w)


def polygon(r, c, shape=None):
    rr = np.asarray(r, float)
    cc = np.asarray(c, float)
    if shape is None:
        shape = (int(rr.max()) + 1, int(cc.max()) + 1)
    mask = polygon2mask(shape, np.stack([rr, cc], -1))
    out = np.nonzero(mask)
    return out[0], out[1]
