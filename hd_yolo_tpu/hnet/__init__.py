"""hnet: hierarchical multi-magnification detection/segmentation stack.

Reference parity (SURVEY.md §2.2, ``/root/reference/hnet/``): Swin/DarkNet
backbone + FPN, per-task ROI extraction at different amplifications,
MaskRCNN / PanopticSeg / classification headers, and the hierarchical
confliction loss (ConstrainModule) coupling coarse segmentation with fine
detection.

TPU-first re-design: the reference's manual 3-GPU model sharding
(``hnet/hnet.py:177-179,221``) disappears — everything is one pjit program;
multi-amplification ROIs use the static-shape ROI-align kernels from ops/.
"""

from .swin import SwinTransformer  # noqa: F401
from .fpn import FeaturePyramidNetwork, PanopticFeatureConnector  # noqa: F401
from .heads import PanopticSegHead, ConstrainModule  # noqa: F401
from .hnet import HNet  # noqa: F401
