"""Explicit model-parallel embedding lookup under shard_map.

pjit with row-sharded tables already works (XLA inserts the collectives —
parallel/mesh.py:table_sharding_rules); this module is the EXPLICIT
collective formulation for when you want control over the communication
pattern (the DLRM-style sharded-table engine of SURVEY §2 component 2):

  * tables row-shard over the mesh axis: device k holds rows
    [k*S, (k+1)*S) of the packed stack,
  * every device receives the full (replicated) id batch, gathers the ids
    that fall in its local range (others hit a zero row), and a psum over
    the axis assembles complete embeddings — each id belongs to exactly one
    shard, so the sum IS the lookup (gather + psum, no all-to-all needed at
    recsys batch sizes: the psum moves B*H*L*dim floats over ICI),
  * the backward is automatically the transpose: psum's grad is identity,
    the masked local gather's grad is a local scatter-add — gradient rows
    land only on the owning shard, with no cross-device gradient traffic.

`sharded_gather_group` mirrors ops/embedding.py:gather_group per-shard.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommendflow_tpu.data.schema import TableGroup
from recommendflow_tpu.ops.embedding import take_rows


def local_gather_psum(table_shard: jnp.ndarray, flat_wide_ids: jnp.ndarray,
                      seg_onehot, axis_name: str) -> jnp.ndarray:
    """Per-device body: gather locally-owned wide rows, psum across shards.

    table_shard [S, W] — this device's contiguous row block;
    flat_wide_ids [N] — GLOBAL wide row ids (replicated);
    seg_onehot [N, P] — sub-row selector for packed tables (None at P=1).
    The sub-row selection runs BEFORE the psum: the collective then moves
    N*dim floats, not N*P*dim (the packed row width) — the docstring's
    stated traffic, P=4-8x less than psumming the wide rows.
    """
    shard = jax.lax.axis_index(axis_name)
    s = table_shard.shape[0]
    local = flat_wide_ids - shard * s
    mine = (local >= 0) & (local < s)
    safe = jnp.where(mine, local, 0)
    rows = take_rows(table_shard, safe)  # sorted-scatter backward
    rows = rows * mine[:, None].astype(rows.dtype)
    if seg_onehot is not None:
        p = seg_onehot.shape[1]
        rows = jnp.einsum("npd,np->nd",
                          rows.reshape(rows.shape[0], p, -1), seg_onehot)
    return jax.lax.psum(rows, axis_name)


def sharded_gather_group(mesh: Mesh, axis: str, table: jnp.ndarray,
                         group: TableGroup, global_ids: jnp.ndarray
                         ) -> jnp.ndarray:
    """gather_group over a row-sharded packed table: ids [..., ] -> [..., dim].

    `table` must be sharded NamedSharding(mesh, P(axis, None)) (or will be
    resharded); ids replicated.
    """
    dim = group.dim
    p = table.shape[1] // dim  # infer stored packing (bf16 packs 4x at dim 64)
    flat = global_ids.reshape(-1)
    wide = flat // p if p > 1 else flat
    seg = jax.nn.one_hot(flat % p, p, dtype=table.dtype) if p > 1 else None

    if seg is None:
        gathered = shard_map(
            partial(local_gather_psum, seg_onehot=None, axis_name=axis),
            mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(),
        )(table, wide.astype(jnp.int32))
    else:
        gathered = shard_map(
            partial(local_gather_psum, axis_name=axis),
            mesh=mesh, in_specs=(P(axis, None), P(), P()), out_specs=P(),
        )(table, wide.astype(jnp.int32), seg)

    # compute dtype is f32 regardless of table storage dtype, matching
    # gather_group (bf16 tables are a STORAGE win; bf16 tower math is a
    # measured regression — see CLAUDE.md)
    return gathered.reshape(global_ids.shape + (dim,)).astype(jnp.float32)


def shard_tables(params: Dict[str, jnp.ndarray], mesh: Mesh,
                 axis: str = "dp") -> Dict[str, jnp.ndarray]:
    """Place each packed stacked table row-sharded on the mesh.

    Only the stacked embedding tables (keyed 'dim{d}' by init_tables) are
    sharded; other 2-D params that happen to have divisible rows — e.g. the
    tiny 'img_{name}' patch-projection matrices — stay replicated (sharding
    a small dense matmul operand just buys an all-gather per use)."""
    from recommendflow_tpu.parallel.mesh import is_table_param
    out = {}
    for name, t in params.items():
        if t.ndim == 2 and is_table_param(name) \
                and t.shape[0] % mesh.shape[axis] == 0:
            out[name] = jax.device_put(t, NamedSharding(mesh, P(axis, None)))
        else:
            out[name] = jax.device_put(t, NamedSharding(mesh, P()))
    return out
