from recommendflow_tpu.ops.embedding import (
    concat_tower, embed_batch, init_tables, lookup_feature, pool_sequence,
)
