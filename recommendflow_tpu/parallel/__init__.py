from recommendflow_tpu.parallel.mesh import (
    apply_shardings, batch_sharding, make_mesh, replicated, shard_batch,
    table_sharding_rules,
)
