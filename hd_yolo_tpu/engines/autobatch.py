"""AutoBatch: estimate the largest safe batch size from device memory.

Behavioral reference: ``/root/reference/metayolo/engines/autobatch.py:23-59``
(linear fit of CUDA memory vs batch size → solve for the target fraction).

TPU version: measure HBM ``bytes_in_use`` after running one train/eval step
at a few probe batch sizes, fit a line, solve for ``fraction`` of
``bytes_limit``.  Works on any backend exposing ``memory_stats``; returns the
fallback batch size when stats are unavailable (e.g. CPU).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from .. import LOGGER


def autobatch(
    step_fn: Callable[[int], None],
    fraction: float = 0.8,
    probes: Sequence[int] = (1, 2, 4),
    fallback: int = 16,
    device: Optional[jax.Device] = None,
) -> int:
    """step_fn(batch_size) must run one representative step at that size."""
    d = device or jax.devices()[0]

    def hbm_used() -> Optional[int]:
        try:
            stats = d.memory_stats() or {}
            return stats.get("bytes_in_use")
        except Exception:
            return None

    def hbm_limit() -> Optional[int]:
        try:
            stats = d.memory_stats() or {}
            return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        except Exception:
            return None

    limit = hbm_limit()
    if limit is None:
        LOGGER.info(f"autobatch: no memory stats on {d}; using fallback {fallback}")
        return fallback

    used = []
    for b in probes:
        try:
            step_fn(b)
            u = hbm_used()
            if u is None:
                return fallback
            used.append(u)
        except Exception as e:  # OOM at probe size
            LOGGER.warning(f"autobatch: probe {b} failed ({e})")
            return max(probes[0], 1)

    # linear fit mem = k·b + base (autobatch.py:46-52)
    k, base = np.polyfit(list(probes), used, deg=1)
    if k <= 0:
        return fallback
    b_opt = int((limit * fraction - base) / k)
    b_opt = max(b_opt, 1)
    LOGGER.info(
        f"autobatch: limit={limit/2**30:.1f}GiB fit k={k/2**20:.0f}MiB/img "
        f"base={base/2**30:.1f}GiB → batch {b_opt} at {fraction:.0%}"
    )
    return b_opt
