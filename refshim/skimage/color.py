"""Color conversions (image_utils.py:16): HSV via matplotlib's published
formulas; H&E/DAB stain separation via the standard Ruifrok–Johnston
optical-density matrices (public constants)."""

import numpy as np
from matplotlib.colors import hsv_to_rgb as _hsv2rgb
from matplotlib.colors import rgb_to_hsv as _rgb2hsv

rgb_from_hed = np.array([
    [0.65, 0.70, 0.29],
    [0.07, 0.99, 0.11],
    [0.27, 0.57, 0.78],
])
hed_from_rgb = np.linalg.inv(rgb_from_hed)


def _float_rgb(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img / 255.0
    return img.astype(np.float64)


def rgb2hsv(img):
    return _rgb2hsv(_float_rgb(img))


def hsv2rgb(img):
    return _hsv2rgb(np.asarray(img, np.float64))


def gray2rgb(img):
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 3:
        return img
    return np.stack([img, img, img], axis=-1)


def rgb2gray(img):
    img = _float_rgb(img)
    return img @ np.array([0.2125, 0.7154, 0.0721])


def separate_stains(rgb, conv_matrix):
    rgb = np.maximum(_float_rgb(rgb), 1e-6)
    log_adjust = np.log(1e-6)
    stains = (np.log(rgb) / log_adjust) @ conv_matrix
    return np.maximum(stains, 0)


def combine_stains(stains, conv_matrix):
    log_adjust = -np.log(1e-6)
    log_rgb = -(np.asarray(stains, np.float64) * log_adjust) @ conv_matrix
    return np.clip(np.exp(log_rgb), 0, 1)


def rgb2hed(rgb):
    return separate_stains(rgb, hed_from_rgb)


def hed2rgb(hed):
    return combine_stains(hed, rgb_from_hed)


def rgba2rgb(rgba, background=(1, 1, 1)):
    rgba = _float_rgb(rgba)
    if rgba.ndim == 3 and rgba.shape[-1] == 4:
        a = rgba[..., 3:4]
        bg = np.asarray(background, np.float64)
        return rgba[..., :3] * a + bg * (1 - a)
    return rgba[..., :3] if rgba.ndim == 3 else rgba
