"""Detection plumbing shims: BoxCoder / Matcher / BalancedPositiveNegativeSampler.

Pure-torch re-implementations of the published torchvision detection
utilities (the R-CNN parameterization of Girshick et al. and the FPN/Faster
R-CNN matching + sampling rules), written so the reference's
``hnet/detection/mask_rcnn.py`` subclasses run unmodified on CPU.
"""

import math
from typing import List, Tuple

import torch
from torch import Tensor


class BoxCoder:
    """Encode/decode boxes as the (dx, dy, dw, dh) regression targets of
    Fast R-CNN, with per-coordinate weights and a log-space clamp."""

    def __init__(self, weights: Tuple[float, float, float, float],
                 bbox_xform_clip: float = math.log(1000.0 / 16)):
        self.weights = weights
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes: List[Tensor], proposals: List[Tensor]) -> List[Tensor]:
        boxes_per_image = [len(b) for b in reference_boxes]
        targets = self.encode_single(torch.cat(reference_boxes, dim=0),
                                     torch.cat(proposals, dim=0))
        return list(targets.split(boxes_per_image, 0))

    def encode_single(self, reference_boxes: Tensor, proposals: Tensor) -> Tensor:
        wx, wy, ww, wh = self.weights
        ex_w = proposals[:, 2] - proposals[:, 0]
        ex_h = proposals[:, 3] - proposals[:, 1]
        ex_cx = proposals[:, 0] + 0.5 * ex_w
        ex_cy = proposals[:, 1] + 0.5 * ex_h
        gt_w = reference_boxes[:, 2] - reference_boxes[:, 0]
        gt_h = reference_boxes[:, 3] - reference_boxes[:, 1]
        gt_cx = reference_boxes[:, 0] + 0.5 * gt_w
        gt_cy = reference_boxes[:, 1] + 0.5 * gt_h
        return torch.stack([
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * torch.log(gt_w / ex_w),
            wh * torch.log(gt_h / ex_h),
        ], dim=1)

    def decode(self, rel_codes: Tensor, boxes: List[Tensor]) -> Tensor:
        if isinstance(boxes, (list, tuple)):
            boxes_per_image = [b.size(0) for b in boxes]
            concat_boxes = torch.cat(boxes, dim=0)
        else:  # single tensor
            boxes_per_image = [boxes.size(0)]
            concat_boxes = boxes
        box_sum = sum(boxes_per_image)
        pred = self.decode_single(
            rel_codes.reshape(box_sum, -1), concat_boxes.to(rel_codes.dtype))
        return pred.reshape(box_sum, -1, 4)

    def decode_single(self, rel_codes: Tensor, boxes: Tensor) -> Tensor:
        wx, wy, ww, wh = self.weights
        widths = boxes[:, 2] - boxes[:, 0]
        heights = boxes[:, 3] - boxes[:, 1]
        ctr_x = boxes[:, 0] + 0.5 * widths
        ctr_y = boxes[:, 1] + 0.5 * heights

        dx = rel_codes[:, 0::4] / wx
        dy = rel_codes[:, 1::4] / wy
        dw = torch.clamp(rel_codes[:, 2::4] / ww, max=self.bbox_xform_clip)
        dh = torch.clamp(rel_codes[:, 3::4] / wh, max=self.bbox_xform_clip)

        pred_cx = dx * widths[:, None] + ctr_x[:, None]
        pred_cy = dy * heights[:, None] + ctr_y[:, None]
        pred_w = torch.exp(dw) * widths[:, None]
        pred_h = torch.exp(dh) * heights[:, None]

        out = torch.stack([
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ], dim=2)
        return out.flatten(1)


class Matcher:
    """Assign each prediction the best-overlapping GT: >= high → matched,
    < low → background (-1), in between → ignore (-2); optionally keep, for
    every GT, its highest-quality predictions even below threshold."""

    BELOW_LOW_THRESHOLD = -1
    BETWEEN_THRESHOLDS = -2

    def __init__(self, high_threshold: float, low_threshold: float,
                 allow_low_quality_matches: bool = False):
        assert low_threshold <= high_threshold
        self.high_threshold = high_threshold
        self.low_threshold = low_threshold
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(self, match_quality_matrix: Tensor) -> Tensor:
        if match_quality_matrix.numel() == 0:
            if match_quality_matrix.shape[0] == 0:
                raise ValueError("No ground-truth boxes available for one of "
                                 "the images during training")
            raise ValueError("No proposal boxes available for one of the "
                             "images during training")
        matched_vals, matches = match_quality_matrix.max(dim=0)
        all_matches = matches.clone() if self.allow_low_quality_matches else None

        below = matched_vals < self.low_threshold
        between = (matched_vals >= self.low_threshold) & (
            matched_vals < self.high_threshold)
        matches[below] = self.BELOW_LOW_THRESHOLD
        matches[between] = self.BETWEEN_THRESHOLDS

        if self.allow_low_quality_matches:
            assert all_matches is not None
            # for each GT, restore its best prediction(s)
            highest_quality, _ = match_quality_matrix.max(dim=1)
            gt_pred_pairs = torch.where(
                match_quality_matrix == highest_quality[:, None])
            pred_inds_to_update = gt_pred_pairs[1]
            matches[pred_inds_to_update] = all_matches[pred_inds_to_update]
        return matches


class BalancedPositiveNegativeSampler:
    """Sample a fixed quota of positives/negatives per image (random
    permutation, as in Fast R-CNN)."""

    def __init__(self, batch_size_per_image: int, positive_fraction: float):
        self.batch_size_per_image = batch_size_per_image
        self.positive_fraction = positive_fraction

    def __call__(self, matched_idxs: List[Tensor]):
        pos_idx, neg_idx = [], []
        for matched_idxs_per_image in matched_idxs:
            positive = torch.where(matched_idxs_per_image >= 1)[0]
            negative = torch.where(matched_idxs_per_image == 0)[0]

            num_pos = int(self.batch_size_per_image * self.positive_fraction)
            num_pos = min(positive.numel(), num_pos)
            num_neg = self.batch_size_per_image - num_pos
            num_neg = min(negative.numel(), num_neg)

            perm1 = torch.randperm(positive.numel(),
                                   device=positive.device)[:num_pos]
            perm2 = torch.randperm(negative.numel(),
                                   device=negative.device)[:num_neg]
            pos = positive[perm1]
            neg = negative[perm2]

            pos_mask = torch.zeros_like(matched_idxs_per_image,
                                        dtype=torch.uint8)
            neg_mask = torch.zeros_like(matched_idxs_per_image,
                                        dtype=torch.uint8)
            pos_mask[pos] = 1
            neg_mask[neg] = 1
            pos_idx.append(pos_mask)
            neg_idx.append(neg_mask)
        return pos_idx, neg_idx
