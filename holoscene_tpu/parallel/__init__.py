from holoscene_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    shard_params,
)
