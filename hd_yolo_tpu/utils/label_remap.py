"""Re-wire a trained Detect header for a different label order / subset.

Behavioral reference: ``manipulate_header_label_order``
(``/root/reference/metayolo/engines/general.py:571-602``): detection-conv
output channels are laid out (anchor-major) as [x, y, w, h, obj, cls_1..cls_nc]
per anchor — a label remap permutes/selects the class channels of the 1×1
det convs so an existing checkpoint serves a re-ordered label set.  Used by
``evaluation.build_model`` (evaluation.py:48-56) for deployment label maps.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def remap_det_conv(kernel: np.ndarray, bias: np.ndarray, na: int, nc_old: int,
                   label_map: Sequence[int]):
    """kernel (1, 1, C, na·(5+nc_old)), bias (na·(5+nc_old),) → new arrays with
    class channels selected/permuted by ``label_map`` (old 1-based class ids;
    0 duplicates the objectness prior for a fresh slot)."""
    no_old = 5 + nc_old
    nc_new = len(label_map)
    no_new = 5 + nc_new
    k = kernel.reshape(kernel.shape[:-1] + (na, no_old))
    b = bias.reshape(na, no_old)
    sel = [0, 1, 2, 3, 4] + [4 if m == 0 else 4 + m for m in label_map]
    k_new = k[..., sel]
    b_new = b[..., sel]
    return (
        k_new.reshape(kernel.shape[:-1] + (na * no_new,)),
        b_new.reshape(na * no_new),
    )


def manipulate_header_label_order(params: Dict, header_name: str, na: int,
                                  nc_old: int, label_map: Sequence[int]) -> Dict:
    """Return a params tree with every det conv of ``header_name`` remapped.

    label_map: new-class-index → old 1-based class id (0 = new blank class
    seeded from objectness).  The caller must rebuild the Model with the new
    ``nc = len(label_map)``.
    """
    import jax

    params = jax.tree.map(np.asarray, params)
    header = dict(params[header_name])
    for key, sub in list(header.items()):
        if key.startswith("det") and "kernel" in sub:
            k, b = remap_det_conv(sub["kernel"], sub["bias"], na, nc_old, label_map)
            header[key] = {"kernel": k, "bias": b}
    out = dict(params)
    out[header_name] = header
    return out
