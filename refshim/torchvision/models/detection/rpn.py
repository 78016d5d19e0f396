"""RPN shim: AnchorGenerator / RPNHead / RegionProposalNetwork /
concat_box_prediction_layers with torchvision's public semantics.

Pure-torch re-implementation of the published Faster R-CNN RPN (Ren et al.)
as torchvision exposes it, sufficient for the reference's subclasses in
``/root/reference/hnet/detection/mask_rcnn.py:7-77`` and
``utils_det.py:220-240`` to run unmodified: the reference overrides
``forward`` on both AnchorGenerator and RegionProposalNetwork but relies on
the base class for cell-anchor generation, proposal filtering, target
assignment, and the RPN loss.
"""

from typing import Dict, List, Tuple

import torch
import torch.nn.functional as F
from torch import Tensor, nn

from ...ops import boxes as box_ops
from . import _utils as det_utils


class AnchorGenerator(nn.Module):
    """Zero-centered cell anchors per level (sizes x aspect_ratios), shifted
    over the feature grid by the level stride."""

    def __init__(self, sizes=((128, 256, 512),),
                 aspect_ratios=((0.5, 1.0, 2.0),)):
        super().__init__()
        if not isinstance(sizes[0], (list, tuple)):
            sizes = tuple((s,) for s in sizes)
        if not isinstance(aspect_ratios[0], (list, tuple)):
            aspect_ratios = (aspect_ratios,) * len(sizes)
        assert len(sizes) == len(aspect_ratios)
        self.sizes = sizes
        self.aspect_ratios = aspect_ratios
        self.cell_anchors = None

    def generate_anchors(self, scales, aspect_ratios,
                         dtype=torch.float32, device="cpu") -> Tensor:
        scales = torch.as_tensor(scales, dtype=dtype, device=device)
        aspect_ratios = torch.as_tensor(aspect_ratios, dtype=dtype,
                                        device=device)
        h_ratios = torch.sqrt(aspect_ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w_ratios[:, None] * scales[None, :]).view(-1)
        hs = (h_ratios[:, None] * scales[None, :]).view(-1)
        base_anchors = torch.stack([-ws, -hs, ws, hs], dim=1) / 2
        return base_anchors.round()

    def set_cell_anchors(self, dtype, device):
        if self.cell_anchors is not None:
            self.cell_anchors = [a.to(dtype=dtype, device=device)
                                 for a in self.cell_anchors]
            return
        self.cell_anchors = [
            self.generate_anchors(sizes, ratios, dtype, device)
            for sizes, ratios in zip(self.sizes, self.aspect_ratios)
        ]

    def num_anchors_per_location(self) -> List[int]:
        return [len(s) * len(a)
                for s, a in zip(self.sizes, self.aspect_ratios)]

    def grid_anchors(self, grid_sizes, strides) -> List[Tensor]:
        assert self.cell_anchors is not None
        anchors = []
        for size, stride, base_anchors in zip(grid_sizes, strides,
                                              self.cell_anchors):
            gh, gw = size
            sh, sw = stride
            device = base_anchors.device
            shifts_x = torch.arange(0, gw, dtype=torch.float32,
                                    device=device) * sw
            shifts_y = torch.arange(0, gh, dtype=torch.float32,
                                    device=device) * sh
            shift_y, shift_x = torch.meshgrid(shifts_y, shifts_x,
                                              indexing="ij")
            shift_x = shift_x.reshape(-1)
            shift_y = shift_y.reshape(-1)
            shifts = torch.stack((shift_x, shift_y, shift_x, shift_y), dim=1)
            anchors.append(
                (shifts.view(-1, 1, 4) + base_anchors.view(1, -1, 4))
                .reshape(-1, 4))
        return anchors

    def forward(self, image_list, feature_maps: List[Tensor]) -> List[Tensor]:
        grid_sizes = [f.shape[-2:] for f in feature_maps]
        image_size = image_list.tensors.shape[-2:]
        dtype, device = feature_maps[0].dtype, feature_maps[0].device
        strides = [
            [torch.tensor(image_size[0] // g[0], dtype=torch.int64,
                          device=device),
             torch.tensor(image_size[1] // g[1], dtype=torch.int64,
                          device=device)]
            for g in grid_sizes
        ]
        self.set_cell_anchors(dtype, device)
        anchors_over_all = self.grid_anchors(grid_sizes, strides)
        return [torch.cat(anchors_over_all)
                for _ in range(len(image_list.image_sizes))]


class RPNHead(nn.Module):
    """3x3 shared conv trunk + 1x1 objectness / box-delta heads."""

    def __init__(self, in_channels: int, num_anchors: int):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, in_channels, 3, stride=1,
                              padding=1)
        self.cls_logits = nn.Conv2d(in_channels, num_anchors, 1, stride=1)
        self.bbox_pred = nn.Conv2d(in_channels, num_anchors * 4, 1, stride=1)
        for layer in self.children():
            nn.init.normal_(layer.weight, std=0.01)
            nn.init.constant_(layer.bias, 0)

    def forward(self, x: List[Tensor]) -> Tuple[List[Tensor], List[Tensor]]:
        logits, bbox_reg = [], []
        for feature in x:
            t = F.relu(self.conv(feature))
            logits.append(self.cls_logits(t))
            bbox_reg.append(self.bbox_pred(t))
        return logits, bbox_reg


def permute_and_flatten(layer: Tensor, N, A, C, H, W) -> Tensor:
    layer = layer.view(N, -1, C, H, W)
    layer = layer.permute(0, 3, 4, 1, 2)
    return layer.reshape(N, -1, C)


def concat_box_prediction_layers(box_cls: List[Tensor],
                                 box_regression: List[Tensor]):
    box_cls_flattened, box_regression_flattened = [], []
    for box_cls_per_level, box_reg_per_level in zip(box_cls, box_regression):
        N, AxC, H, W = box_cls_per_level.shape
        Ax4 = box_reg_per_level.shape[1]
        A = Ax4 // 4
        C = AxC // A
        box_cls_flattened.append(
            permute_and_flatten(box_cls_per_level, N, A, C, H, W))
        box_regression_flattened.append(
            permute_and_flatten(box_reg_per_level, N, A, 4, H, W))
    box_cls = torch.cat(box_cls_flattened, dim=1).flatten(0, -2)
    box_regression = torch.cat(box_regression_flattened, dim=1).reshape(-1, 4)
    return box_cls, box_regression


class RegionProposalNetwork(nn.Module):
    def __init__(self, anchor_generator, head,
                 fg_iou_thresh: float, bg_iou_thresh: float,
                 batch_size_per_image: int, positive_fraction: float,
                 pre_nms_top_n: Dict[str, int], post_nms_top_n: Dict[str, int],
                 nms_thresh: float, score_thresh: float = 0.0):
        super().__init__()
        self.anchor_generator = anchor_generator
        self.head = head
        self.box_coder = det_utils.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))

        # training
        self.box_similarity = box_ops.box_iou
        self.proposal_matcher = det_utils.Matcher(
            fg_iou_thresh, bg_iou_thresh, allow_low_quality_matches=True)
        self.fg_bg_sampler = det_utils.BalancedPositiveNegativeSampler(
            batch_size_per_image, positive_fraction)
        # inference
        self._pre_nms_top_n = pre_nms_top_n
        self._post_nms_top_n = post_nms_top_n
        self.nms_thresh = nms_thresh
        self.score_thresh = score_thresh
        self.min_size = 1e-3

    def pre_nms_top_n(self) -> int:
        return self._pre_nms_top_n["training" if self.training else "testing"]

    def post_nms_top_n(self) -> int:
        return self._post_nms_top_n["training" if self.training else "testing"]

    def assign_targets_to_anchors(self, anchors: List[Tensor],
                                  targets: List[Dict[str, Tensor]]):
        labels, matched_gt_boxes = [], []
        for anchors_per_image, targets_per_image in zip(anchors, targets):
            gt_boxes = targets_per_image["boxes"]
            if gt_boxes.numel() == 0:
                device = anchors_per_image.device
                matched_gt = torch.zeros(anchors_per_image.shape,
                                         dtype=torch.float32, device=device)
                labels_per_image = torch.zeros((anchors_per_image.shape[0],),
                                               dtype=torch.float32,
                                               device=device)
            else:
                match_quality = self.box_similarity(gt_boxes,
                                                    anchors_per_image)
                matched_idxs = self.proposal_matcher(match_quality)
                matched_gt = gt_boxes[matched_idxs.clamp(min=0)]
                labels_per_image = (matched_idxs >= 0).to(torch.float32)
                labels_per_image[
                    matched_idxs == self.proposal_matcher.BELOW_LOW_THRESHOLD
                ] = 0.0
                labels_per_image[
                    matched_idxs == self.proposal_matcher.BETWEEN_THRESHOLDS
                ] = -1.0
            labels.append(labels_per_image)
            matched_gt_boxes.append(matched_gt)
        return labels, matched_gt_boxes

    def _get_top_n_idx(self, objectness: Tensor,
                       num_anchors_per_level: List[int]) -> Tensor:
        r = []
        offset = 0
        for ob in objectness.split(num_anchors_per_level, 1):
            num_anchors = ob.shape[1]
            top_n = min(self.pre_nms_top_n(), num_anchors)
            _, top_n_idx = ob.topk(top_n, dim=1)
            r.append(top_n_idx + offset)
            offset += num_anchors
        return torch.cat(r, dim=1)

    def filter_proposals(self, proposals: Tensor, objectness: Tensor,
                         image_shapes: List[Tuple[int, int]],
                         num_anchors_per_level: List[int]):
        num_images = proposals.shape[0]
        device = proposals.device
        objectness = objectness.detach().reshape(num_images, -1)

        levels = [torch.full((n,), idx, dtype=torch.int64, device=device)
                  for idx, n in enumerate(num_anchors_per_level)]
        levels = torch.cat(levels, 0).reshape(1, -1).expand_as(objectness)

        top_n_idx = self._get_top_n_idx(objectness, num_anchors_per_level)
        image_range = torch.arange(num_images, device=device)
        batch_idx = image_range[:, None]
        objectness = objectness[batch_idx, top_n_idx]
        levels = levels[batch_idx, top_n_idx]
        proposals = proposals[batch_idx, top_n_idx]
        objectness_prob = torch.sigmoid(objectness)

        final_boxes, final_scores = [], []
        for boxes, scores, lvl, img_shape in zip(proposals, objectness_prob,
                                                 levels, image_shapes):
            boxes = box_ops.clip_boxes_to_image(boxes, img_shape)
            keep = box_ops.remove_small_boxes(boxes, self.min_size)
            boxes, scores, lvl = boxes[keep], scores[keep], lvl[keep]
            keep = torch.where(scores >= self.score_thresh)[0]
            boxes, scores, lvl = boxes[keep], scores[keep], lvl[keep]
            keep = box_ops.batched_nms(boxes, scores, lvl, self.nms_thresh)
            keep = keep[: self.post_nms_top_n()]
            final_boxes.append(boxes[keep])
            final_scores.append(scores[keep])
        return final_boxes, final_scores

    def compute_loss(self, objectness: Tensor, pred_bbox_deltas: Tensor,
                     labels: List[Tensor], regression_targets: List[Tensor]):
        sampled_pos_inds, sampled_neg_inds = self.fg_bg_sampler(labels)
        sampled_pos_inds = torch.where(torch.cat(sampled_pos_inds, 0))[0]
        sampled_neg_inds = torch.where(torch.cat(sampled_neg_inds, 0))[0]
        sampled_inds = torch.cat([sampled_pos_inds, sampled_neg_inds], 0)

        objectness = objectness.flatten()
        labels = torch.cat(labels, 0)
        regression_targets = torch.cat(regression_targets, 0)

        box_loss = F.smooth_l1_loss(
            pred_bbox_deltas[sampled_pos_inds],
            regression_targets[sampled_pos_inds],
            beta=1.0 / 9, reduction="sum",
        ) / sampled_inds.numel()
        objectness_loss = F.binary_cross_entropy_with_logits(
            objectness[sampled_inds], labels[sampled_inds])
        return objectness_loss, box_loss
