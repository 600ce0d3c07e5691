from .mesh import build_mesh, shard_batch, replicate, batch_sharding
