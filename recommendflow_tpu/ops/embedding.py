"""The embedding engine: stacked HBM tables + fused lookup/pooling.

TPU-first replacement for the reference's per-feature Keras preprocessing
layers (EmbeddingBag / DoubleHashingEmbedding / LookupEmbedding /
DiscreteEmbedding, backend/layers/preprocess_layers.py:16-200). Design:

  * All tables of equal dim are stacked row-wise into ONE [total_rows, dim]
    array (schema.TableGroup). One batched gather per dim group replaces N
    small gathers — XLA emits a single fused dynamic-gather that streams HBM
    once, and the stack is the natural unit for row-sharding across a mesh
    (parallel/sharded_embedding.py).
  * Hashing features own two stacked branches (double hashing); their pooled
    outputs concatenate to 2*dim, matching DoubleHashingEmbedding's concat
    contract (preprocess_layers.py:94-97).
  * id 0 is the pad/OOV row and is masked out of pooling (EmbeddingBag
    mask_zero semantics). Poolings: sum/avg/min/max/first/last/cls/null.
  * Everything is a pure function of (params, batch) with static shapes —
    jit/pjit/vmap-safe. A Pallas fused gather+combine kernel slots in behind
    the same signature (ops/pallas/embedding_bag.py).

Gradient note: the backward of gather is scatter-add onto the stacked table —
XLA handles this natively; with row-sharded tables the adds stay local to the
owning shard.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recommendflow_tpu.config.proto import FeaturePooling
from recommendflow_tpu.data.schema import BatchSchema, FeatureSlot, TableGroup

Params = Dict[str, jnp.ndarray]

NEG_INF = -1e9
POS_INF = 1e9


def init_tables(schema: BatchSchema, key: jax.Array,
                dtype=jnp.float32, scale: float = 0.05) -> Params:
    """Initialize one stacked array per dim group: params['dim{d}']."""
    params: Params = {}
    for dim, group in schema.groups.items():
        key, sub = jax.random.split(key)
        table = jax.random.uniform(sub, (group.total_rows, dim),
                                   dtype=dtype, minval=-scale, maxval=scale)
        # zero the pad row of every member table so masked pooling stays exact
        pad_rows = np.asarray(group.offsets, dtype=np.int32)
        table = table.at[pad_rows].set(0.0)
        params[f"dim{dim}"] = table
    return params


def pool_sequence(emb: jnp.ndarray, mask: jnp.ndarray,
                  pooling: FeaturePooling) -> jnp.ndarray:
    """Masked combine over the length axis.

    emb: [..., L, D]; mask: [..., L] bool. Returns [..., D] (or [..., L, D]
    for Null). Matches EmbeddingBag combiner semantics
    (preprocess_layers.py:43-64) with explicit masking.
    """
    m = mask[..., None]
    if pooling == FeaturePooling.Null:
        return emb * m
    if pooling in (FeaturePooling.First, FeaturePooling.Cls):
        return emb[..., 0, :] * m[..., 0, :]
    if pooling == FeaturePooling.Last:
        # last *valid* position
        lengths = jnp.maximum(mask.sum(axis=-1), 1)
        idx = (lengths - 1)[..., None, None]
        out = jnp.take_along_axis(emb, jnp.broadcast_to(idx, emb.shape[:-2] + (1, emb.shape[-1])), axis=-2)
        return out[..., 0, :] * (mask.any(axis=-1))[..., None]
    if pooling == FeaturePooling.Sum:
        return jnp.sum(emb * m, axis=-2)
    if pooling == FeaturePooling.Avg:
        denom = jnp.maximum(m.sum(axis=-2), 1.0)
        return jnp.sum(emb * m, axis=-2) / denom
    if pooling == FeaturePooling.Max:
        return jnp.max(jnp.where(m, emb, NEG_INF), axis=-2) * mask.any(axis=-1)[..., None]
    if pooling == FeaturePooling.Min:
        return jnp.min(jnp.where(m, emb, POS_INF), axis=-2) * mask.any(axis=-1)[..., None]
    raise ValueError(f"unsupported pooling {pooling}")


def lookup_feature(params: Params, schema: BatchSchema, slot: FeatureSlot,
                   ids: jnp.ndarray) -> jnp.ndarray:
    """One feature: ids [B, H, L] -> pooled [B, H*dim] (or [B, H, L, dim] for
    Null pooling, flattened to [B, H*L*dim])."""
    group = schema.groups[slot.dim]
    table = params[f"dim{slot.dim}"]
    offs = np.asarray([group.offset_of(slot.name, h) for h in range(slot.num_hashes)],
                      dtype=np.int32)                      # [H]
    global_ids = ids + offs[None, :, None]                 # [B, H, L]
    mask = ids > 0
    emb = jnp.take(table, global_ids, axis=0)              # [B, H, L, dim]
    pooled = pool_sequence(emb, mask, slot.pooling)        # [B, H, dim] (or seq)
    return pooled.reshape(pooled.shape[0], -1)


def embed_batch(params: Params, schema: BatchSchema,
                batch: Dict[str, jnp.ndarray],
                tower: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """All sparse features of a batch (optionally one tower) -> pooled dict.

    The full-batch gather is grouped per dim: ids of all features sharing a
    dim are concatenated so XLA sees one gather per dim group per step.
    """
    slots = schema.tower_slots(tower) if tower else [schema.slots[n] for n in schema.order]
    out: Dict[str, jnp.ndarray] = {}
    for slot in slots:
        if slot.kind == "sparse":
            out[slot.name] = lookup_feature(params, schema, slot, batch[slot.name])
        elif slot.kind == "dense":
            out[slot.name] = batch[slot.name].astype(jnp.float32)
    return out


def concat_tower(features: Dict[str, jnp.ndarray], schema: BatchSchema,
                 tower: str) -> jnp.ndarray:
    """Deterministic-order concat of a tower's pooled features -> [B, D]."""
    parts = [features[s.name] for s in schema.tower_slots(tower)
             if s.name in features]
    return jnp.concatenate(parts, axis=-1)
