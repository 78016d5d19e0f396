"""Faster R-CNN head shims: TwoMLPHead / FastRCNNPredictor.

Pure-torch re-implementations of the two tiny public torchvision modules the
reference's BoxPredictor composes (``/root/reference/hnet/detection/
utils_det.py:247-252``)."""

import torch
import torch.nn.functional as F
from torch import nn


class TwoMLPHead(nn.Module):
    """Flatten pooled ROI features, then two ReLU fully-connected layers."""

    def __init__(self, in_channels: int, representation_size: int):
        super().__init__()
        self.fc6 = nn.Linear(in_channels, representation_size)
        self.fc7 = nn.Linear(representation_size, representation_size)

    def forward(self, x):
        x = x.flatten(start_dim=1)
        x = F.relu(self.fc6(x))
        x = F.relu(self.fc7(x))
        return x


class FastRCNNPredictor(nn.Module):
    """Linear class-score + per-class box-delta heads."""

    def __init__(self, in_channels: int, num_classes: int):
        super().__init__()
        self.cls_score = nn.Linear(in_channels, num_classes)
        self.bbox_pred = nn.Linear(in_channels, num_classes * 4)

    def forward(self, x):
        if x.dim() == 4:
            assert list(x.shape[2:]) == [1, 1]
        x = x.flatten(start_dim=1)
        scores = self.cls_score(x)
        bbox_deltas = self.bbox_pred(x)
        return scores, bbox_deltas
