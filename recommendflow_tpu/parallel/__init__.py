from recommendflow_tpu.parallel.distributed import (
    host_id, init_distributed, num_hosts,
)
from recommendflow_tpu.parallel.mesh import (
    apply_shardings, batch_sharding, make_mesh, replicated, shard_batch,
    table_sharding_rules,
)
