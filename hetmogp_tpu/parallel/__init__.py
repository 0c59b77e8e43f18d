from hetmogp_tpu.parallel.sharding import (
    data_mesh,
    make_sharded_svi_step,
    shard_batch,
)

__all__ = ["data_mesh", "shard_batch", "make_sharded_svi_step"]
