"""skimage.morphology subset over scipy.ndimage."""

import numpy as np
from scipy import ndimage


def disk(radius):
    L = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(L, L)
    return (X**2 + Y**2) <= radius**2


def binary_dilation(image, footprint=None):
    return ndimage.binary_dilation(image, structure=footprint)


def binary_erosion(image, footprint=None):
    return ndimage.binary_erosion(image, structure=footprint)


def remove_small_objects(ar, min_size=64, connectivity=1):
    ar = np.asarray(ar)
    lab, n = ndimage.label(ar, structure=ndimage.generate_binary_structure(ar.ndim, connectivity))
    sizes = ndimage.sum_labels(np.ones_like(lab), lab, index=np.arange(1, n + 1))
    keep = np.zeros(n + 1, bool)
    keep[1:] = sizes >= min_size
    return keep[lab]


def label(image, connectivity=None):
    lab, _ = ndimage.label(image)
    return lab
