"""Albumentations stub: the reference imports it lazily inside the
augment-enabled dataset path (datasets.py:583-593).  Evaluation/val never
reaches it; the classes here implement the handful of photometric transforms
with their public behavior so even the train path would run."""

import random

import cv2
import numpy as np

__version__ = "1.0.3+hdyolo.shim"


class _Transform:
    def __init__(self, p=0.5, **kwargs):
        self.p = p
        self.kwargs = kwargs

    def apply(self, image):
        return image

    def __call__(self, image=None, **data):
        if image is not None and random.random() < self.p:
            image = self.apply(image)
        return {"image": image, **data}


class Compose:
    def __init__(self, transforms, bbox_params=None, **kwargs):
        self.transforms = transforms

    def __call__(self, image=None, **data):
        out = {"image": image, **data}
        for t in self.transforms:
            res = t(image=out["image"])
            out["image"] = res["image"]
        return out


class Blur(_Transform):
    def apply(self, image):
        k = random.choice([3, 5, 7])
        return cv2.blur(image, (k, k))


class MedianBlur(_Transform):
    def apply(self, image):
        k = random.choice([3, 5, 7])
        return cv2.medianBlur(image, k)


class ToGray(_Transform):
    def apply(self, image):
        g = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        return cv2.cvtColor(g, cv2.COLOR_GRAY2RGB)


class CLAHE(_Transform):
    def apply(self, image):
        lab = cv2.cvtColor(image, cv2.COLOR_RGB2LAB)
        lab[..., 0] = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8)).apply(lab[..., 0])
        return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


class RandomBrightnessContrast(_Transform):
    def apply(self, image):
        alpha = 1.0 + random.uniform(-0.2, 0.2)
        beta = random.uniform(-0.2, 0.2) * 255
        return np.clip(image.astype(np.float32) * alpha + beta, 0, 255).astype(image.dtype)


class RandomGamma(_Transform):
    def apply(self, image):
        gamma = random.uniform(0.8, 1.2)
        lut = np.clip(np.power(np.arange(256) / 255.0, gamma) * 255.0, 0, 255).astype(np.uint8)
        return lut[image]


class ImageCompression(_Transform):
    def apply(self, image):
        q = random.randint(self.kwargs.get("quality_lower", 75), 100)
        ok, enc = cv2.imencode(".jpg", image, [cv2.IMWRITE_JPEG_QUALITY, q])
        return cv2.imdecode(enc, cv2.IMREAD_COLOR) if ok else image


class BboxParams:
    def __init__(self, format="yolo", label_fields=(), **kwargs):
        self.format = format
        self.label_fields = list(label_fields)
