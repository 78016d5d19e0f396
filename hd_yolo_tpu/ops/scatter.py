"""Segment reductions — XLA-native replacement for ``torch_scatter.scatter_max``.

The reference uses ``scatter_max`` once, to pick the best-IoU proposal per GT
object for the mask loss (``/root/reference/metayolo/models/yolo_head.py:257``).
On TPU this is ``jax.ops.segment_max`` plus an argmax-recovery pass — no custom
CUDA needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def segment_max_with_argmax(
    values: Array, segment_ids: Array, num_segments: int
) -> Tuple[Array, Array]:
    """Per-segment max and the index (into ``values``) attaining it.

    Matches ``torch_scatter.scatter_max`` semantics: empty segments get
    ``-inf``-like max (here: the dtype min) and index ``len(values)``
    (an out-of-range sentinel, same convention as torch_scatter).
    Ties resolve to the smallest index.

    ``segment_ids`` outside ``[0, num_segments)`` are dropped.
    """
    n = values.shape[0]
    seg_max = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    # Recover argmax: smallest index whose value equals its segment max.
    is_max = values >= seg_max[jnp.clip(segment_ids, 0, num_segments - 1)]
    idx = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(is_max, idx, n)
    seg_arg = jax.ops.segment_min(cand, segment_ids, num_segments=num_segments)
    # Empty segments: segment_min yields the int dtype max — clamp to the sentinel n.
    return seg_max, jnp.minimum(seg_arg, n)
