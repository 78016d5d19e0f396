"""Pure-torch stand-in for the torchvision surface the reference repo uses.

The compiled torchvision package is not in this image; the reference
(impromptuRong/hd_yolo) only touches a small documented subset (SURVEY.md
§2.3).  Each sub-module implements the corresponding PUBLIC torchvision
contract from its documented semantics so `/root/reference` imports and runs
unmodified as a CPU golden oracle / measured baseline.  This shim is test
infrastructure for hd_yolo_tpu — it is not a torchvision distribution.
"""

from . import models, ops, transforms

__version__ = "0.14.0+hdyolo.shim"

__all__ = ["models", "ops", "transforms", "__version__"]
