from .mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, replicate,
    DATA_AXIS, MODEL_AXIS,
)
from .input_pipeline import (
    shard_sequence_folders, per_host_batch_size, make_global_batch,
    sharded_prefetch,
)
from .spatial import shard_package_spatial, shard_state_spatial

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "shard_batch", "replicate",
    "DATA_AXIS", "MODEL_AXIS",
    "shard_sequence_folders", "per_host_batch_size", "make_global_batch",
    "sharded_prefetch",
]
