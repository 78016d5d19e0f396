"""`scatter_max` with torch_scatter's public contract (yolo_head.py:11,257).

Returns (out, argmax): group-wise maxima of ``src`` over ``index`` with
``dim_size = index.max()+1``; empty groups yield 0 with the out-of-range
argmax sentinel ``src.size(dim)``.  Deterministic first-occurrence argmax.
"""

from typing import Optional, Tuple

import torch
from torch import Tensor

__version__ = "2.1.0+hdyolo.shim"


def scatter_max(src: Tensor, index: Tensor, dim: int = -1,
                out: Optional[Tensor] = None,
                dim_size: Optional[int] = None) -> Tuple[Tensor, Tensor]:
    assert out is None, "preallocated out is not supported by the shim"
    assert src.dim() == 1 and index.dim() == 1, (
        "shim covers the 1-D usage in the reference (yolo_head.py:257)"
    )
    n = src.numel()
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if n else 0
    sentinel = n
    maxes = torch.zeros(dim_size, dtype=src.dtype, device=src.device)
    argmax = torch.full((dim_size,), sentinel, dtype=torch.long, device=src.device)
    if n == 0 or dim_size == 0:
        return maxes, argmax
    lowest = torch.finfo(src.dtype).min if src.is_floating_point() else \
        torch.iinfo(src.dtype).min
    grp = torch.full((dim_size,), lowest, dtype=src.dtype, device=src.device)
    grp.scatter_reduce_(0, index, src, reduce="amax", include_self=True)
    touched = torch.zeros(dim_size, dtype=torch.bool, device=src.device)
    touched[index] = True
    # first index achieving the group max (deterministic tie-break)
    is_max = src == grp[index]
    cand = torch.where(is_max, torch.arange(n, device=src.device),
                       torch.full((n,), sentinel, dtype=torch.long,
                                  device=src.device))
    first = torch.full((dim_size,), sentinel, dtype=torch.long, device=src.device)
    first.scatter_reduce_(0, index, cand, reduce="amin", include_self=True)
    maxes = torch.where(touched, grp, maxes)
    argmax = torch.where(touched, first, argmax)
    return maxes, argmax
