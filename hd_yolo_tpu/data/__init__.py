"""Data pipeline: host-side dataset/augmentations + device-side batched preproc.

Reference parity: ``/root/reference/metayolo/datasets.py`` (CSV multi-task
dataset, mosaic, keep_res), ``engines/image_utils.py`` (Mask container, color
augs, projective warps), ``engines/augmentations.py`` (letterbox etc.).
"""
