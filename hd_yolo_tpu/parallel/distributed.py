"""Multi-host (multi-process) runtime plumbing.

The reference's DDP world: torchrun spawns WORLD_SIZE processes, rank-0 owns
EMA/val/checkpoint/logging (``/root/reference/train.py:249,296,368,500``),
``DistributedSampler`` shards the dataset per rank (``datasets.py:859``) and
NCCL carries the gradient allreduce (``train.py:683``).

TPU-native equivalents:
  * one ``jax.distributed.initialize()`` per host — after that, ``jit`` over
    a global mesh spans every chip of every host and XLA routes collectives
    over ICI/DCN;
  * rank gating becomes ``jax.process_index() == 0`` (only for host-side
    WRITES — every process must still execute the same jitted computations);
  * the sampler becomes a per-process slice of the index space
    (``DataLoader(..., shard=(process_index, process_count))``);
  * per-host local batches are assembled into global arrays with
    ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

_INITIALIZED = False


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Initialize multi-process JAX when the environment requests it.

    Trigger: ``JAX_COORDINATOR_ADDRESS`` (with ``JAX_NUM_PROCESSES`` and
    ``JAX_PROCESS_ID``) — the explicit torchrun-style contract — or an
    auto-detectable cluster environment (TPU pods / GKE), where
    ``jax.distributed.initialize()`` needs no arguments.

    Returns (process_index, process_count); (0, 1) single-process.
    """
    global _INITIALIZED
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr and not _INITIALIZED:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_global_batch(batch: Any, mesh, sharding) -> Any:
    """Assemble per-process local batch leaves into global arrays.

    Single-process: plain ``device_put`` with the sharding.  Multi-process:
    every process holds 1/process_count of the global batch along the
    leading axis; ``jax.make_array_from_process_local_data`` stitches the
    logical global array without gathering data to any host.
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )
