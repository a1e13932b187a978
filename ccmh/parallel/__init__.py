from ccmh.parallel.mesh import (
    make_mesh, shard_batch, replicate, data_parallel_train_step, sharded_map_eval,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "data_parallel_train_step",
    "sharded_map_eval",
]
