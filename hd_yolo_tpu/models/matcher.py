"""YOLOv5-style anchor/cell target assignment — fully vectorized, static shapes.

Behavioral reference: ``Detect.matcher`` (``/root/reference/metayolo/models/
yolo_head.py:357-417``): per level, keep (anchor, gt) pairs whose wh ratio is
within ``anchor_t``, then replicate each kept pair into up to 5 grid cells
(center + the 2 nearest neighbors by fractional offset).

TPU-first re-design: the reference builds variable-length index lists with
boolean filtering; here every (offset o∈5, anchor a∈A, image b∈B, target t∈T)
candidate keeps a fixed slot with a validity bit — downstream losses mask
instead of gather-compacting.  Candidate count per level = 5·A·B·T.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

# (dx, dy) offsets scaled by g=0.5: center, right(j), down(k), left(l), up(m)
_OFFSETS = ((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (-0.5, 0.0), (0.0, -0.5))


@dataclasses.dataclass
class LevelMatches:
    """Per-level matched candidates, flattened to N = 5*A*B*T slots."""

    b: Array          # (N,) image index
    a: Array          # (N,) anchor index
    gj: Array         # (N,) grid row
    gi: Array         # (N,) grid col
    tbox: Array       # (N, 4) regression target: (dx, dy, w, h) in feature cells
    anchor_wh: Array  # (N, 2) matched anchor in feature cells
    obj_idx: Array    # (N,) flat GT id = b * T + t (for mask pairing)
    valid: Array      # (N,) bool


def match_level(
    boxes_n: Array,       # (B, T, 4) normalized xywh
    valid: Array,         # (B, T) bool
    anchors: Array,       # (A, 2) anchor wh in feature cells
    ny: int,
    nx: int,
    anchor_t: float,
) -> LevelMatches:
    B, T, _ = boxes_n.shape
    A = anchors.shape[0]

    gxy = boxes_n[..., :2] * jnp.array([nx, ny], boxes_n.dtype)  # (B, T, 2)
    gwh = boxes_n[..., 2:4] * jnp.array([nx, ny], boxes_n.dtype)

    # anchor-ratio filter (yolo_head.py:382-385)
    r = gwh[None] / jnp.maximum(anchors[:, None, None, :], 1e-9)  # (A, B, T, 2)
    ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)
    keep_anchor = ratio < anchor_t  # (A, B, T)

    # neighbor-cell flags (yolo_head.py:388-394)
    gx, gy = gxy[..., 0], gxy[..., 1]
    gxi, gyi = nx - gx, ny - gy
    g = 0.5
    flags = jnp.stack(
        [
            jnp.ones_like(gx, bool),
            (gx % 1.0 < g) & (gx > 1.0),   # j → offset (+0.5, 0)
            (gy % 1.0 < g) & (gy > 1.0),   # k → offset (0, +0.5)
            (gxi % 1.0 < g) & (gxi > 1.0),  # l → offset (−0.5, 0)
            (gyi % 1.0 < g) & (gyi > 1.0),  # m → offset (0, −0.5)
        ],
        axis=0,
    )  # (5, B, T)

    off = jnp.asarray(_OFFSETS, boxes_n.dtype)  # (5, 2)
    gij = jnp.floor(gxy[None] - off[:, None, None, :]).astype(jnp.int32)  # (5, B, T, 2)
    gi = jnp.clip(gij[..., 0], 0, nx - 1)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)
    tx = gxy[None, ..., 0] - gij[..., 0].astype(boxes_n.dtype)  # residual vs chosen cell
    ty = gxy[None, ..., 1] - gij[..., 1].astype(boxes_n.dtype)

    cand_valid = flags[:, None] & keep_anchor[None] & valid[None, None]  # (5, A, B, T)

    shape5 = (5, A, B, T)
    b_idx = lax.broadcasted_iota(jnp.int32, shape5, 2)
    a_idx = lax.broadcasted_iota(jnp.int32, shape5, 1)
    t_idx = lax.broadcasted_iota(jnp.int32, shape5, 3)

    def bcast(x):  # (5, B, T) → (5, A, B, T)
        return jnp.broadcast_to(x[:, None], shape5)

    tbox = jnp.stack(
        [bcast(tx), bcast(ty), jnp.broadcast_to(gwh[None, None, ..., 0], shape5),
         jnp.broadcast_to(gwh[None, None, ..., 1], shape5)],
        axis=-1,
    )
    anchor_wh = jnp.broadcast_to(anchors[None, :, None, None, :], shape5 + (2,))

    N = 5 * A * B * T
    return LevelMatches(
        b=b_idx.reshape(N),
        a=a_idx.reshape(N),
        gj=bcast(gj).reshape(N),
        gi=bcast(gi).reshape(N),
        tbox=tbox.reshape(N, 4),
        anchor_wh=anchor_wh.reshape(N, 2),
        obj_idx=(b_idx * T + t_idx).reshape(N),
        valid=cand_valid.reshape(N),
    )


def match_targets(
    boxes_n: Array,
    valid: Array,
    anchors_per_level: Sequence[Array],
    level_shapes: Sequence[Tuple[int, int]],
    anchor_t: float,
) -> List[LevelMatches]:
    """Assignment for every pyramid level (see match_level)."""
    return [
        match_level(boxes_n, valid, anchors, ny, nx, anchor_t)
        for anchors, (ny, nx) in zip(anchors_per_level, level_shapes)
    ]
