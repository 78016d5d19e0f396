"""Feature-space mosaic: assemble ROI features from multiple images into one
pyramid — train-time augmentation without re-running the backbone.

Behavioral reference: ``mosaic_roi_feature_maps``
(``/root/reference/hnet/utils.py:150-229``): run the backbone once per source
image, ROI-align each image's annotation ROI at every pyramid level, and tile
k×k pooled cells into a single mosaic feature map per level (cell size halves
per level like the strides).  Box targets are projected from each source ROI
into its mosaic cell.

TPU-first: the cell pooling is the ops/ ROI-align kernel (static shapes);
assembly is one reshape/transpose — no scatter.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.roi_align import roi_align

Array = jnp.ndarray


def mosaic_roi_feature_maps(
    features: Sequence[Array],      # per level (N, H_l, W_l, C) for N = k² source images
    rois: Array,                    # (N, 4) xyxy in image pixels (one ROI per source image)
    strides: Sequence[float],
    k: int = 2,
    cell_size: int = 32,            # level-0 cell resolution (feature cells)
) -> List[Array]:
    """Returns per-level mosaic maps (1, k·S_l, k·S_l, C) with
    S_l = cell_size // 2^l (min 1)."""
    N = rois.shape[0]
    assert N == k * k, f"need k²={k*k} source images, got {N}"
    out = []
    for lvl, (fmap, stride) in enumerate(zip(features, strides)):
        S = max(cell_size >> lvl, 1)
        pooled = jax.vmap(
            lambda f, r: roi_align(f, r[None], S, spatial_scale=1.0 / float(stride))[0]
        )(fmap, rois)  # (N, S, S, C)
        C = pooled.shape[-1]
        grid = pooled.reshape(k, k, S, S, C).transpose(0, 2, 1, 3, 4)
        out.append(grid.reshape(1, k * S, k * S, C))
    return out


def extract_roi_feature_maps(
    features: Sequence[Array],      # per level (B, H_l, W_l, C)
    rois: Array,                    # (B, R, 4) xyxy in image pixels
    strides: Sequence[float],
    roi_size: int = 32,             # level-0 output resolution (feature cells)
    amplification: float = 1.0,     # scale factor between task amps
) -> List[Array]:
    """Per-annotation multi-level ROI features (the targets path of
    ``extract_roi_feature_maps``, hnet/utils.py:65-147): each ROI is pooled
    from every pyramid level at a resolution that halves with the level,
    scaled by the task amplification.  Returns per level (B, R, S_l, S_l, C)
    with S_l = max(round(roi_size·amp) >> l, 1)."""
    out = []
    base = int(round(roi_size * amplification))
    for lvl, (fmap, stride) in enumerate(zip(features, strides)):
        S = max(base >> lvl, 1)
        pooled = jax.vmap(
            lambda f, r: roi_align(f, r, S, spatial_scale=1.0 / float(stride))
        )(fmap, rois)
        out.append(pooled)
    return out


def mosaic_targets(
    boxes_list: Sequence[np.ndarray],   # per source image (n_i, 4) xyxy image px
    labels_list: Sequence[np.ndarray],
    rois: np.ndarray,                   # (N, 4) source ROIs
    strides: Sequence[float],
    k: int = 2,
    cell_size: int = 32,
) -> Dict[str, np.ndarray]:
    """Project per-image boxes into the level-0 mosaic pixel frame.

    The mosaic's effective image size is k·cell_size·stride0; boxes in cell i
    scale by (cell_px / roi_extent) and shift to the cell origin.
    """
    stride0 = float(strides[0])
    cell_px = cell_size * stride0
    out_boxes, out_labels = [], []
    for i, (bx, lb) in enumerate(zip(boxes_list, labels_list)):
        r, c = i // k, i % k
        x1, y1, x2, y2 = [float(v) for v in rois[i]]
        sx = cell_px / max(x2 - x1, 1e-6)
        sy = cell_px / max(y2 - y1, 1e-6)
        bx = np.asarray(bx, np.float64).reshape(-1, 4)
        proj = np.stack(
            [
                (bx[:, 0] - x1) * sx + c * cell_px,
                (bx[:, 1] - y1) * sy + r * cell_px,
                (bx[:, 2] - x1) * sx + c * cell_px,
                (bx[:, 3] - y1) * sy + r * cell_px,
            ],
            -1,
        )
        lo = np.array([c, r, c, r]) * cell_px
        hi = lo + cell_px
        proj = np.clip(proj, lo, hi)
        keep = (proj[:, 2] - proj[:, 0] > 1) & (proj[:, 3] - proj[:, 1] > 1)
        out_boxes.append(proj[keep])
        out_labels.append(np.asarray(lb)[keep])
    return {
        "boxes": np.concatenate(out_boxes) if out_boxes else np.zeros((0, 4)),
        "labels": np.concatenate(out_labels) if out_labels else np.zeros((0,), np.int64),
        "size": (int(k * cell_px), int(k * cell_px)),
    }
