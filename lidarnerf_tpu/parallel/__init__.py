from lidarnerf_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_rays,
)

__all__ = ["make_mesh", "make_sharded_train_step", "replicate", "shard_rays"]
