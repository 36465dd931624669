from .distributed import global_mesh, init_distributed, replicate_global  # noqa: F401
from .sharding import batch_sharding_tree, make_mesh, replicate, shard_batch  # noqa: F401
