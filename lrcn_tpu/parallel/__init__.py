from lrcn_tpu.parallel.mesh import make_mesh, mesh_from_config
from lrcn_tpu.parallel.train import (
    ShardedTrainStep,
    batch_sharding,
    param_sharding,
    shard_params,
)

__all__ = [
    "make_mesh",
    "mesh_from_config",
    "ShardedTrainStep",
    "batch_sharding",
    "param_sharding",
    "shard_params",
]
