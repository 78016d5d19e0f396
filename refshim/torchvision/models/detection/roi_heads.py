"""torchvision.models.detection.roi_heads shim.

``paste_masks_in_image`` with torchvision's public semantics: pad the
MxM mask by ``padding``, scale the box by (M+2p)/M, bilinear-resize the mask
to the integer box extent (+1 px, ``TO_REMOVE`` convention), and paste the
intersection into the image canvas.  Reference call sites:
val_nuclei.py:169-175, evaluation.py:122, datasets.py:797.

Plus the ``RoIHeads`` base class and the fastrcnn/maskrcnn/keypointrcnn
loss + inference helpers, re-implemented from the published Fast/Mask/
Keypoint R-CNN algorithms so the reference's subclass in
``/root/reference/hnet/detection/mask_rcnn.py:79-298`` runs unmodified
(it overrides ``forward`` but calls the base ``select_training_samples``,
``postprocess_detections``, ``has_mask``/``has_keypoint``, ``box_coder``
and these module-level helpers)."""

from typing import Dict, List, Optional, Tuple

import torch
import torch.nn.functional as F
from torch import Tensor, nn

from ...ops import boxes as box_ops
from ...ops import roi_align
from . import _utils as det_utils


def _expand_boxes(boxes: Tensor, scale: float) -> Tensor:
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x_c = (boxes[:, 2] + boxes[:, 0]) * 0.5
    y_c = (boxes[:, 3] + boxes[:, 1]) * 0.5
    out = torch.zeros_like(boxes)
    out[:, 0] = x_c - w_half
    out[:, 2] = x_c + w_half
    out[:, 1] = y_c - h_half
    out[:, 3] = y_c + h_half
    return out


def _expand_masks(mask: Tensor, padding: int) -> Tuple[Tensor, float]:
    M = mask.shape[-1]
    scale = float(M + 2 * padding) / M
    padded_mask = F.pad(mask, (padding, padding, padding, padding))
    return padded_mask, scale


def _paste_mask_in_image(mask: Tensor, box: Tensor, im_h: int, im_w: int) -> Tensor:
    TO_REMOVE = 1
    w = int(box[2] - box[0] + TO_REMOVE)
    h = int(box[3] - box[1] + TO_REMOVE)
    w = max(w, 1)
    h = max(h, 1)
    mask = mask.expand((1, 1, -1, -1))
    mask = F.interpolate(mask, size=(h, w), mode="bilinear", align_corners=False)
    mask = mask[0][0]
    im_mask = torch.zeros((im_h, im_w), dtype=mask.dtype, device=mask.device)
    x_0 = max(int(box[0]), 0)
    x_1 = min(int(box[2]) + 1, im_w)
    y_0 = max(int(box[1]), 0)
    y_1 = min(int(box[3]) + 1, im_h)
    im_mask[y_0:y_1, x_0:x_1] = mask[
        (y_0 - int(box[1])):(y_1 - int(box[1])),
        (x_0 - int(box[0])):(x_1 - int(box[0])),
    ]
    return im_mask


def paste_masks_in_image(masks: Tensor, boxes: Tensor, img_shape: Tuple[int, int],
                         padding: int = 1) -> Tensor:
    masks, scale = _expand_masks(masks, padding=padding)
    boxes = _expand_boxes(boxes, scale).to(dtype=torch.int64)
    im_h, im_w = int(img_shape[0]), int(img_shape[1])
    res: List[Tensor] = [
        _paste_mask_in_image(m[0], b, im_h, im_w) for m, b in zip(masks, boxes)
    ]
    if len(res) > 0:
        return torch.stack(res, dim=0)[:, None]
    return masks.new_empty((0, 1, im_h, im_w))


# --------------------------------------------------------------------------
# Fast R-CNN / Mask R-CNN / Keypoint R-CNN helpers (published algorithms)
# --------------------------------------------------------------------------

def fastrcnn_loss(class_logits: Tensor, box_regression: Tensor,
                  labels: List[Tensor], regression_targets: List[Tensor]):
    """Cross-entropy over classes + smooth-L1 (beta=1/9) over the matched
    class's box deltas, normalized by the total sampled count."""
    labels = torch.cat(labels, dim=0)
    regression_targets = torch.cat(regression_targets, dim=0)

    classification_loss = F.cross_entropy(class_logits, labels)

    sampled_pos_inds_subset = torch.where(labels > 0)[0]
    labels_pos = labels[sampled_pos_inds_subset]
    N = class_logits.shape[0]
    box_regression = box_regression.reshape(N, box_regression.size(-1) // 4, 4)

    box_loss = F.smooth_l1_loss(
        box_regression[sampled_pos_inds_subset, labels_pos],
        regression_targets[sampled_pos_inds_subset],
        beta=1.0 / 9, reduction="sum",
    ) / labels.numel()
    return classification_loss, box_loss


def maskrcnn_inference(x: Tensor, labels: List[Tensor]) -> List[Tensor]:
    """Select each detection's own-class mask probability map."""
    mask_prob = x.sigmoid()
    num_masks = x.shape[0]
    boxes_per_image = [label.shape[0] for label in labels]
    all_labels = torch.cat(labels)
    index = torch.arange(num_masks, device=all_labels.device)
    mask_prob = mask_prob[index, all_labels][:, None]
    return list(mask_prob.split(boxes_per_image, dim=0))


def project_masks_on_boxes(gt_masks: Tensor, boxes: Tensor,
                           matched_idxs: Tensor, M: int) -> Tensor:
    """Crop each matched GT mask to its proposal box at MxM via ROI-align."""
    matched_idxs = matched_idxs.to(boxes)
    rois = torch.cat([matched_idxs[:, None], boxes], dim=1)
    gt_masks = gt_masks[:, None].to(rois)
    return roi_align(gt_masks, rois, (M, M), 1.0)[:, 0]


def maskrcnn_loss(mask_logits: Tensor, proposals: List[Tensor],
                  gt_masks: List[Tensor], gt_labels: List[Tensor],
                  mask_matched_idxs: List[Tensor]) -> Tensor:
    discretization_size = mask_logits.shape[-1]
    labels = [gt_label[idxs]
              for gt_label, idxs in zip(gt_labels, mask_matched_idxs)]
    mask_targets = [
        project_masks_on_boxes(m, p, i, discretization_size)
        for m, p, i in zip(gt_masks, proposals, mask_matched_idxs)
    ]
    labels = torch.cat(labels, dim=0)
    mask_targets = torch.cat(mask_targets, dim=0)
    if mask_targets.numel() == 0:
        return mask_logits.sum() * 0
    return F.binary_cross_entropy_with_logits(
        mask_logits[torch.arange(labels.shape[0],
                                 device=labels.device), labels],
        mask_targets)


def keypoints_to_heatmap(keypoints: Tensor, rois: Tensor,
                         heatmap_size: int):
    """Rasterize (x, y, vis) keypoints into per-ROI integer heatmap bins."""
    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    scale_x = heatmap_size / (rois[:, 2] - rois[:, 0])
    scale_y = heatmap_size / (rois[:, 3] - rois[:, 1])

    offset_x = offset_x[:, None]
    offset_y = offset_y[:, None]
    scale_x = scale_x[:, None]
    scale_y = scale_y[:, None]

    x = keypoints[..., 0]
    y = keypoints[..., 1]

    x_boundary_inds = x == rois[:, 2][:, None]
    y_boundary_inds = y == rois[:, 3][:, None]

    x = ((x - offset_x) * scale_x).floor().long()
    y = ((y - offset_y) * scale_y).floor().long()
    x[x_boundary_inds] = heatmap_size - 1
    y[y_boundary_inds] = heatmap_size - 1

    valid_loc = (x >= 0) & (y >= 0) & (x < heatmap_size) & (y < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).long()

    lin_ind = y * heatmap_size + x
    heatmaps = lin_ind * valid
    return heatmaps, valid


def heatmaps_to_keypoints(maps: Tensor, rois: Tensor):
    """Argmax-decode keypoint heatmaps back to image coordinates (one
    (x, y, vis) triple + score per keypoint), resizing each ROI's maps to
    the box extent first so the argmax is taken at box resolution."""
    offset_x = rois[:, 0]
    offset_y = rois[:, 1]

    widths = (rois[:, 2] - rois[:, 0]).clamp(min=1)
    heights = (rois[:, 3] - rois[:, 1]).clamp(min=1)
    widths_ceil = widths.ceil()
    heights_ceil = heights.ceil()

    num_keypoints = maps.shape[1]
    xy_preds = torch.zeros((len(rois), 3, num_keypoints),
                           dtype=torch.float32, device=maps.device)
    end_scores = torch.zeros((len(rois), num_keypoints),
                             dtype=torch.float32, device=maps.device)
    for i in range(len(rois)):
        roi_map_width = int(widths_ceil[i].item())
        roi_map_height = int(heights_ceil[i].item())
        width_correction = widths[i] / roi_map_width
        height_correction = heights[i] / roi_map_height
        roi_map = F.interpolate(
            maps[i][:, None], size=(roi_map_height, roi_map_width),
            mode="bicubic", align_corners=False)[:, 0]
        w = roi_map.shape[2]
        pos = roi_map.reshape(num_keypoints, -1).argmax(dim=1)
        x_int = pos % w
        y_int = torch.div(pos - x_int, w, rounding_mode="floor")
        x = (x_int.float() + 0.5) * width_correction
        y = (y_int.float() + 0.5) * height_correction
        xy_preds[i, 0, :] = x + offset_x[i]
        xy_preds[i, 1, :] = y + offset_y[i]
        xy_preds[i, 2, :] = 1
        end_scores[i, :] = roi_map[
            torch.arange(num_keypoints, device=roi_map.device), y_int, x_int]

    return xy_preds.permute(0, 2, 1), end_scores


def keypointrcnn_loss(keypoint_logits: Tensor, proposals: List[Tensor],
                      gt_keypoints: List[Tensor],
                      keypoint_matched_idxs: List[Tensor]) -> Tensor:
    N, K, H, W = keypoint_logits.shape
    assert H == W
    discretization_size = H
    heatmaps, valid = [], []
    for proposals_per_image, gt_kp_in_image, midx in zip(
            proposals, gt_keypoints, keypoint_matched_idxs):
        kp = gt_kp_in_image[midx]
        heatmaps_per_image, valid_per_image = keypoints_to_heatmap(
            kp, proposals_per_image, discretization_size)
        heatmaps.append(heatmaps_per_image.view(-1))
        valid.append(valid_per_image.view(-1))

    keypoint_targets = torch.cat(heatmaps, dim=0)
    valid = torch.cat(valid, dim=0).to(dtype=torch.uint8)
    valid = torch.where(valid)[0]

    if keypoint_targets.numel() == 0 or len(valid) == 0:
        return keypoint_logits.sum() * 0

    keypoint_logits = keypoint_logits.view(N * K, H * W)
    return F.cross_entropy(keypoint_logits[valid], keypoint_targets[valid])


def keypointrcnn_inference(x: Tensor, boxes: List[Tensor]):
    kp_probs, kp_scores = [], []
    boxes_per_image = [box.size(0) for box in boxes]
    x2 = x.split(boxes_per_image, dim=0)
    for xx, bb in zip(x2, boxes):
        kp_prob, scores = heatmaps_to_keypoints(xx, bb)
        kp_probs.append(kp_prob)
        kp_scores.append(scores)
    return kp_probs, kp_scores


class RoIHeads(nn.Module):
    """Second-stage heads: proposal matching/sampling, box-head execution,
    and per-class post-processing (Fast R-CNN semantics)."""

    def __init__(self, box_roi_pool, box_head, box_predictor,
                 fg_iou_thresh: float, bg_iou_thresh: float,
                 batch_size_per_image: int, positive_fraction: float,
                 bbox_reg_weights: Optional[Tuple[float, ...]],
                 score_thresh: float, nms_thresh: float,
                 detections_per_img: int,
                 mask_roi_pool=None, mask_head=None, mask_predictor=None,
                 keypoint_roi_pool=None, keypoint_head=None,
                 keypoint_predictor=None):
        super().__init__()
        self.box_similarity = box_ops.box_iou
        self.proposal_matcher = det_utils.Matcher(
            fg_iou_thresh, bg_iou_thresh, allow_low_quality_matches=False)
        self.fg_bg_sampler = det_utils.BalancedPositiveNegativeSampler(
            batch_size_per_image, positive_fraction)
        if bbox_reg_weights is None:
            bbox_reg_weights = (10.0, 10.0, 5.0, 5.0)
        self.box_coder = det_utils.BoxCoder(bbox_reg_weights)

        self.box_roi_pool = box_roi_pool
        self.box_head = box_head
        self.box_predictor = box_predictor

        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.detections_per_img = detections_per_img

        self.mask_roi_pool = mask_roi_pool
        self.mask_head = mask_head
        self.mask_predictor = mask_predictor
        self.keypoint_roi_pool = keypoint_roi_pool
        self.keypoint_head = keypoint_head
        self.keypoint_predictor = keypoint_predictor

    def has_mask(self) -> bool:
        return (self.mask_roi_pool is not None
                and self.mask_head is not None
                and self.mask_predictor is not None)

    def has_keypoint(self) -> bool:
        return (self.keypoint_roi_pool is not None
                and self.keypoint_head is not None
                and self.keypoint_predictor is not None)

    def assign_targets_to_proposals(self, proposals: List[Tensor],
                                    gt_boxes: List[Tensor],
                                    gt_labels: List[Tensor]):
        matched_idxs, labels = [], []
        for proposals_in_image, gt_boxes_in_image, gt_labels_in_image in zip(
                proposals, gt_boxes, gt_labels):
            if gt_boxes_in_image.numel() == 0:
                device = proposals_in_image.device
                clamped = torch.zeros((proposals_in_image.shape[0],),
                                      dtype=torch.int64, device=device)
                labels_in_image = torch.zeros_like(clamped)
            else:
                match_quality = box_ops.box_iou(gt_boxes_in_image,
                                                proposals_in_image)
                matched_idxs_in_image = self.proposal_matcher(match_quality)
                clamped = matched_idxs_in_image.clamp(min=0)
                labels_in_image = gt_labels_in_image[clamped].to(torch.int64)
                labels_in_image[
                    matched_idxs_in_image ==
                    self.proposal_matcher.BELOW_LOW_THRESHOLD] = 0
                labels_in_image[
                    matched_idxs_in_image ==
                    self.proposal_matcher.BETWEEN_THRESHOLDS] = -1
            matched_idxs.append(clamped)
            labels.append(labels_in_image)
        return matched_idxs, labels

    def subsample(self, labels: List[Tensor]) -> List[Tensor]:
        sampled_pos_inds, sampled_neg_inds = self.fg_bg_sampler(labels)
        sampled_inds = []
        for pos_inds_img, neg_inds_img in zip(sampled_pos_inds,
                                              sampled_neg_inds):
            sampled_inds.append(
                torch.where(pos_inds_img | neg_inds_img)[0])
        return sampled_inds

    def add_gt_proposals(self, proposals: List[Tensor],
                         gt_boxes: List[Tensor]) -> List[Tensor]:
        return [torch.cat((proposal, gt_box))
                for proposal, gt_box in zip(proposals, gt_boxes)]

    def check_targets(self, targets) -> None:
        assert targets is not None
        assert all("boxes" in t for t in targets)
        assert all("labels" in t for t in targets)
        if self.has_mask():
            assert all("masks" in t for t in targets)

    def select_training_samples(self, proposals: List[Tensor], targets):
        self.check_targets(targets)
        dtype = proposals[0].dtype
        device = proposals[0].device
        gt_boxes = [t["boxes"].to(dtype) for t in targets]
        gt_labels = [t["labels"] for t in targets]

        proposals = self.add_gt_proposals(proposals, gt_boxes)
        matched_idxs, labels = self.assign_targets_to_proposals(
            proposals, gt_boxes, gt_labels)
        sampled_inds = self.subsample(labels)
        matched_gt_boxes = []
        num_images = len(proposals)
        for img_id in range(num_images):
            img_sampled_inds = sampled_inds[img_id]
            proposals[img_id] = proposals[img_id][img_sampled_inds]
            labels[img_id] = labels[img_id][img_sampled_inds]
            matched_idxs[img_id] = matched_idxs[img_id][img_sampled_inds]
            gt_boxes_in_image = gt_boxes[img_id]
            if gt_boxes_in_image.numel() == 0:
                gt_boxes_in_image = torch.zeros((1, 4), dtype=dtype,
                                                device=device)
            matched_gt_boxes.append(gt_boxes_in_image[matched_idxs[img_id]])

        regression_targets = self.box_coder.encode(matched_gt_boxes,
                                                   proposals)
        return proposals, matched_idxs, labels, regression_targets

    def postprocess_detections(self, class_logits: Tensor,
                               box_regression: Tensor,
                               proposals: List[Tensor],
                               image_shapes: List[Tuple[int, int]]):
        device = class_logits.device
        num_classes = class_logits.shape[-1]

        boxes_per_image = [p.shape[0] for p in proposals]
        pred_boxes = self.box_coder.decode(box_regression, proposals)
        pred_scores = F.softmax(class_logits, -1)

        pred_boxes_list = pred_boxes.split(boxes_per_image, 0)
        pred_scores_list = pred_scores.split(boxes_per_image, 0)

        all_boxes, all_scores, all_labels = [], [], []
        for boxes, scores, image_shape in zip(pred_boxes_list,
                                              pred_scores_list, image_shapes):
            boxes = box_ops.clip_boxes_to_image(boxes, image_shape)

            labels = torch.arange(num_classes, device=device)
            labels = labels.view(1, -1).expand_as(scores)

            # drop the background column
            boxes = boxes[:, 1:]
            scores = scores[:, 1:]
            labels = labels[:, 1:]

            boxes = boxes.reshape(-1, 4)
            scores = scores.reshape(-1)
            labels = labels.reshape(-1)

            inds = torch.where(scores > self.score_thresh)[0]
            boxes, scores, labels = boxes[inds], scores[inds], labels[inds]

            keep = box_ops.remove_small_boxes(boxes, min_size=1e-2)
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

            keep = box_ops.batched_nms(boxes, scores, labels,
                                       self.nms_thresh)
            keep = keep[: self.detections_per_img]
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

            all_boxes.append(boxes)
            all_scores.append(scores)
            all_labels.append(labels)
        return all_boxes, all_scores, all_labels
