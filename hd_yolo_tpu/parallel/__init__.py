"""SPMD parallelism: device meshes + sharding specs.

Replaces the reference's torch.distributed/DDP/NCCL machinery (SURVEY.md §2.4,
§5.8) with jax.sharding: batch over the ``data`` axis rides ICI; a ``model``
axis is provisioned for tensor-parallel growth; WSI tile grids shard over
``data`` too (spatial parallelism, SURVEY.md §5.7).
"""

from .mesh import (  # noqa: F401
    auto_mesh,
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_params_tp,
)
from .distributed import (  # noqa: F401
    is_main_process,
    make_global_batch,
    maybe_initialize_distributed,
)
