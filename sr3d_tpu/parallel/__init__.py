from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, batch_spec,
                   local_mesh_or_single, make_mesh, replicated,
                   shard_batch_pytree)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "batch_spec",
    "local_mesh_or_single", "make_mesh", "replicated", "shard_batch_pytree",
]
