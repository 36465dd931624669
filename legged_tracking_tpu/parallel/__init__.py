from .sharding import batch_sharding_tree, make_mesh, replicate, shard_batch  # noqa: F401
