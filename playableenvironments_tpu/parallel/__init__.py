"""Device-mesh parallelism helpers."""

from playableenvironments_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
