"""Device mesh + sharding helpers.

The reference scales with DDP (one process per GPU, NCCL allreduce inside
backward — ``/root/reference/train.py:330-331,683``).  Here a single program
spans all chips: build a ``Mesh`` over ``(data, model)``, shard the batch
leaves over ``data``, replicate params over both axes, and jit — XLA inserts
the gradient ``psum`` over ICI automatically.  The ``×WORLD_SIZE`` loss hack
(train.py:466-467) has no equivalent: the loss is computed over the global
logical batch.

Multi-host: call ``jax.distributed.initialize()`` once per host before using
these helpers (SURVEY.md §5.8); everything else is unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D (data, model) mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def auto_mesh(batch_size: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Data-axis mesh over the largest device count that divides batch_size."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return create_mesh(shape=(n, 1), devices=devices[:n])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array leaf's leading axis over ``data``.

    Single-process: plain ``device_put``.  Multi-process: each process
    contributes its local slice of the global batch (see
    distributed.make_global_batch).
    """
    from .distributed import make_global_batch

    return make_global_batch(batch, mesh, batch_sharding(mesh))


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_params_tp(params: Any, mesh: Mesh, min_size: int = 1 << 16) -> Any:
    """Tensor-parallel param placement: shard the OUT-CHANNEL (last) axis of
    every large kernel over the ``model`` mesh axis; everything else
    replicates.

    This is the GSPMD formulation of tensor parallelism: computation stays an
    ordinary jitted program, the placement constraint alone makes XLA
    partition the matmuls/convs and insert the activation collectives over
    ICI.  Kernels whose last dim doesn't divide the axis (or that are smaller
    than ``min_size`` elements, where collective latency would dominate) stay
    replicated.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rep = replicated(mesh)

    def place(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % n_model == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, rep)

    return jax.tree.map(place, params)
