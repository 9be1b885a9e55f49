from .mesh import (  # noqa: F401
    make_mesh, data_sharding, init_distributed, replicate_sharding,
    shard_batch)
