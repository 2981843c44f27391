from .mesh import get_mesh, batch_sharding, replicated, shard_batch, DATA_AXIS
