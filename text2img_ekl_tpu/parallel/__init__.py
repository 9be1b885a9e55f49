from .mesh import make_mesh, data_sharding, replicate_sharding, shard_batch  # noqa: F401
