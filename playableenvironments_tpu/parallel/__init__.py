"""Device-mesh parallelism helpers."""

from playableenvironments_tpu.parallel.mesh import (
    batch_sharding,
    compile_barrier,
    constrain_ray_axis,
    create_2d_mesh,
    create_mesh,
    maybe_initialize_distributed,
    replicate,
    shard_batch,
)
