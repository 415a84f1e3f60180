"""The embedding engine: packed stacked HBM tables + fused lookup/pooling.

TPU-first replacement for the reference's per-feature Keras preprocessing
layers (EmbeddingBag / DoubleHashingEmbedding / LookupEmbedding /
DiscreteEmbedding, backend/layers/preprocess_layers.py:16-200). Design:

  * All tables of equal dim are stacked row-wise into ONE logical
    [total_rows, dim] array per dim group (schema.TableGroup) — one gather
    per group per step, and the natural unit of row-sharding across a mesh.
  * **Packed physical layout**: TPU gathers cost fixed overhead PER ROW
    (~107 ns at 256-byte rows on v5e) and get ~4x cheaper at 512-byte rows,
    so a narrow [R, d] stack is stored as [R/P, P*d] with P = 128//d lanes
    packed per physical row. A lookup fetches the wide row (ids // P) and
    selects its segment (ids % P) with a fused one-hot einsum — measured
    2.3 ms vs 9.7 ms for 87k x dim-64 rows from a 6M-row table. The packing
    must live in the STORED layout: reshaping [R, d] -> [R/P, P*d] inside
    jit materializes a full table copy (~14 ms).
  * Hashing features own two stacked branches (double hashing); pooled
    branch outputs concatenate to 2*dim (DoubleHashingEmbedding's concat
    contract, preprocess_layers.py:94-97).
  * id 0 of every member table is the pad/OOV row, zero-initialized and
    masked out of pooling (EmbeddingBag mask_zero semantics).
  * Everything is a pure function of (params, batch) with static shapes.

Gradients flow through gather + einsum automatically; the backward is XLA's
scatter-add onto 512-byte packed rows (also ~2x faster than narrow rows).
Pallas DMA gather/scatter kernels exist for the dim>=128 regime
(ops/pallas/embedding_bag.py) where single-row DMAs are tile-aligned.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommendflow_tpu.config.proto import FeaturePooling
from recommendflow_tpu.data.schema import BatchSchema, FeatureSlot, TableGroup

Params = Dict[str, jnp.ndarray]

NEG_INF = -1e9
POS_INF = 1e9
ROW_BYTES = 512  # physical-row packing target (one 512-byte HBM burst)


def pack_factor(dim: int, dtype=jnp.float32) -> int:
    """Logical rows per physical row, packing the minor dim up to a 512-byte
    burst (128 f32 / 256 bf16 elements); P = lanes//dim when dim divides the
    lane count evenly, else 1 (unpacked)."""
    lanes = ROW_BYTES // jnp.dtype(dtype).itemsize
    if dim < lanes and lanes % dim == 0:
        return lanes // dim
    return 1


SHARD_MULTIPLE = 256  # physical rows divisible by POWER-OF-TWO mesh sizes
# up to 256 (TPU slices); a 3/5/6-way mesh may leave a table undivisible
# and shard_tables will then REPLICATE it (guard in sharded_embedding.py)


def _make_take_rows(shape: Tuple[int, ...], dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def fn(table, flat_ids):
        # the backward's argsort/scatter assumes 1-D ids — a [B, N] id
        # array would silently produce wrong gradients
        assert flat_ids.ndim == 1, "take_rows needs FLAT ids (reshape(-1))"
        return jnp.take(table, flat_ids, axis=0)

    def fwd(table, flat_ids):
        return jnp.take(table, flat_ids, axis=0), flat_ids

    def bwd(flat_ids, g):
        # one sort gives both sorted keys and the permutation (argsort +
        # flat_ids[order] would re-derive the keys with an extra gather)
        s, order = jax.lax.sort_key_val(
            flat_ids, jnp.arange(flat_ids.shape[0], dtype=jnp.int32))
        dtable = jnp.zeros(shape, dtype).at[s].add(
            g[order].astype(dtype), indices_are_sorted=True)
        return dtable, None

    fn.defvjp(fwd, bwd)
    return fn


_TAKE_ROWS_CACHE: Dict[Tuple[Tuple[int, ...], str], object] = {}


def take_rows(table: jnp.ndarray, flat_ids: jnp.ndarray) -> jnp.ndarray:
    """`jnp.take(table, flat_ids, axis=0)` whose backward scatters with
    SORTED indices.

    XLA's scatter-add runs a per-row serialization-safe path for arbitrary
    index order; presorting lets it take the indices_are_sorted fast path.
    Measured on v5e (1.5M x 512-byte packed rows, 87k gathered rows,
    uniform ids): plain backward 8.97 ms -> sorted 6.59 ms (-27%); the
    argsort + row permute cost is included. Dedup (unique_indices) does NOT
    pay at uniform-id duplicate ratios — the segment-sum machinery costs
    exactly what the duplicate serialization did.
    """
    key = (tuple(table.shape), jnp.dtype(table.dtype).name)
    fn = _TAKE_ROWS_CACHE.get(key)
    if fn is None:
        fn = _TAKE_ROWS_CACHE[key] = _make_take_rows(*key)
    return fn(table, flat_ids)


def padded_rows(group: TableGroup, dtype=jnp.float32) -> int:
    """Logical rows padded so the packed physical row count is a multiple of
    SHARD_MULTIPLE (keeps row-sharding valid on any mesh <= 256 devices)."""
    p = pack_factor(group.dim, dtype)
    phys = -(-group.total_rows // p)
    phys = -(-phys // SHARD_MULTIPLE) * SHARD_MULTIPLE
    return phys * p


def table_shape(group: TableGroup, dtype=jnp.float32) -> Tuple[int, int]:
    """Physical (packed) stored shape of a dim group's stacked table."""
    p = pack_factor(group.dim, dtype)
    return (padded_rows(group, dtype) // p, p * group.dim)


IMAGE_PATCH = 8  # patchify side: [S,S,3] -> [(S/8)^2, 192] patch rows


def init_group_table(key: jax.Array, group: TableGroup, dtype=jnp.float32,
                     scale: float = 0.05) -> jnp.ndarray:
    """One dim group's packed stacked table: symmetric U[-scale, scale)
    (all-positive init saturates cosine losses) with each member table's
    pad row zeroed, reshaped to the packed [rows/P, P*dim] stored layout.

    The SINGLE init contract — both the functional engine (init_tables) and
    the linen FeatureEmbedder (models/base.py) call this, so the packing /
    pad-zeroing / scale can never diverge between the two paths."""
    rows = padded_rows(group, dtype)
    flat = jax.random.uniform(key, (rows, group.dim), dtype=dtype,
                              minval=-scale, maxval=scale)
    pad_rows_idx = np.asarray(group.offsets, dtype=np.int32)
    flat = flat.at[pad_rows_idx].set(0.0)  # zero each member's pad row
    p = pack_factor(group.dim, dtype)
    return flat.reshape(rows // p, p * group.dim)


def init_tables(schema: BatchSchema, key: jax.Array,
                dtype=None, scale: float = 0.05) -> Params:
    """Initialize one packed stacked array per dim group: params['dim{d}'],
    plus a patch-projection matrix params['img_{name}'] per image slot.

    dtype defaults to schema.table_dtype — an explicit f32 here while the
    linen model packed bf16 would build a PHYSICALLY different stored
    shape (pack factor differs) for the same schema."""
    if dtype is None:
        dtype = jnp.dtype(getattr(schema, "table_dtype", "float32"))
    params: Params = {}
    for dim, group in schema.groups.items():
        key, sub = jax.random.split(key)
        params[f"dim{dim}"] = init_group_table(sub, group, dtype, scale)
    for name in schema.order:
        slot = schema.slots[name]
        if slot.kind == "image":
            key, sub = jax.random.split(key)
            patch_dim = IMAGE_PATCH * IMAGE_PATCH * 3
            params[f"img_{name}"] = jax.nn.initializers.lecun_normal()(
                sub, (patch_dim, slot.dim), jnp.float32)
    return params


def patch_embed(proj: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] pixels -> [B, dim] via 8x8 patchify + linear + mean pool.

    One [B*(S/8)^2, 192] x [192, dim] matmul — the MXU-native way to fold an
    image channel into a tower (vs the reference's undefined model-side image
    handling; its dataloader only decodes, dataloader.py:71-89).
    """
    b, s, _, c = images.shape
    p = IMAGE_PATCH
    n = s // p
    x = images.reshape(b, n, p, n, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, n * n, p * p * c)
    return jnp.mean(x @ proj, axis=1)


def gather_group(table: jnp.ndarray, group: TableGroup,
                 global_ids: jnp.ndarray,
                 wide_rows: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather logical rows from a packed stacked table.

    table: [rows/P, P*dim] packed (P inferred from the stored shape, so
    bf16 tables with 256-element rows work transparently); global_ids: any
    int shape -> [..., dim], cast to f32 after the gather+select so compute
    downstream stays full-precision.

    wide_rows: pre-gathered physical rows [N, P*dim] (N = global_ids.size)
    — the split-update path (train/trainer.py) gathers OUTSIDE the
    differentiated step so autodiff produces per-row cotangents instead of
    a dense scattered table cotangent; values must equal
    take_rows(table, physical_ids(...)) for a bit-identical forward.
    """
    dim = group.dim
    p = table.shape[1] // dim
    flat_ids = global_ids.reshape(-1)
    if wide_rows is not None and wide_rows.shape != (flat_ids.shape[0],
                                                     table.shape[1]):
        raise ValueError(
            f"wide_rows shape {wide_rows.shape} does not match the fused id "
            f"layout ({flat_ids.shape[0]}, {table.shape[1]}) — the model's "
            f"embed pass differs from the trainer's fused_group_ids plan")
    if p == 1:
        rows = wide_rows if wide_rows is not None \
            else take_rows(table, flat_ids)
        return rows.reshape(global_ids.shape + (dim,)).astype(jnp.float32)
    wide = wide_rows if wide_rows is not None \
        else take_rows(table, flat_ids // p)                 # [N, P*dim]
    seg = jax.nn.one_hot(flat_ids % p, p, dtype=table.dtype)  # [N, P]
    out = jnp.einsum("npd,np->nd", wide.reshape(-1, p, dim), seg)
    return out.reshape(global_ids.shape + (dim,)).astype(jnp.float32)


def rows_key(dim: int) -> str:
    """Reserved batch key carrying pre-gathered physical rows for a dim
    group (split-update path)."""
    return f"__rows_dim{dim}__"


def _fused_ids(schema: BatchSchema, group_slots, batch):
    """The exact fused id layout embed_batch gathers with: per-slot global
    ids flattened to [B, H*L] and concatenated. One definition shared with
    fused_group_ids so the trainer's outside-gather cannot drift from the
    model's in-graph plan."""
    gids = [_global_ids(schema, s, batch[s.name]).reshape(
        batch[s.name].shape[0], -1) for s in group_slots]    # [B, H*L]
    return [g.shape[1] for g in gids], jnp.concatenate(gids, axis=1)


def fused_group_ids(schema: BatchSchema, batch: Dict[str, jnp.ndarray],
                    tower: Optional[str] = None,
                    exclude: Sequence[str] = ()) -> Dict[int, jnp.ndarray]:
    """{dim: fused global ids [B, sum(H*L)]} for every sparse dim group —
    the id plan embed_batch executes. The split-update trainer gathers rows
    for these ids outside the differentiated function."""
    slots = schema.tower_slots(tower) if tower else \
        [schema.slots[n] for n in schema.order]
    by_dim: Dict[int, List[FeatureSlot]] = {}
    for slot in slots:
        if slot.name not in exclude and slot.kind == "sparse":
            by_dim.setdefault(slot.dim, []).append(slot)
    return {dim: _fused_ids(schema, group_slots, batch)[1]
            for dim, group_slots in by_dim.items()}


def physical_ids(table: jnp.ndarray, dim: int,
                 fused: jnp.ndarray) -> jnp.ndarray:
    """Flat physical (packed) row indices for a fused global-id array."""
    p = table.shape[1] // dim
    flat = fused.reshape(-1)
    return flat // p if p > 1 else flat


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
    if pooling == FeaturePooling.Cls:
        # CLS is strictly position 0 (the token's position defines it)
        return emb[..., 0, :] * m[..., 0, :]
    L = emb.shape[-2]
    pos = jnp.arange(L)
    if pooling == FeaturePooling.First:
        # first VALID position: lookup/hashing misses leave PAD holes IN
        # PLACE (data/pipeline.py), so an OOV at position 0 must not zero
        # a feature whose later positions are valid
        idx = jnp.argmax(mask, axis=-1)[..., None, None]
        out = jnp.take_along_axis(
            emb, jnp.broadcast_to(idx, emb.shape[:-2] + (1, emb.shape[-1])), axis=-2)
        return out[..., 0, :] * (mask.any(axis=-1))[..., None]
    if pooling == FeaturePooling.Last:
        # last VALID position (mask.sum()-1 indexed the wrong element when
        # holes occur mid-sequence)
        idx = jnp.max(jnp.where(mask, pos, 0), axis=-1)[..., None, None]
        out = jnp.take_along_axis(
            emb, jnp.broadcast_to(idx, emb.shape[:-2] + (1, emb.shape[-1])), axis=-2)
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


def _global_ids(schema: BatchSchema, slot: FeatureSlot,
                ids: jnp.ndarray) -> jnp.ndarray:
    group = schema.groups[slot.dim]
    offs = np.asarray([group.offset_of(slot.name, h)
                       for h in range(slot.num_hashes)], dtype=np.int32)
    return ids + offs[None, :, None]


def lookup_feature(params: Params, schema: BatchSchema, slot: FeatureSlot,
                   ids: jnp.ndarray) -> jnp.ndarray:
    """One feature: ids [B, H, L] -> pooled [B, H*dim]."""
    group = schema.groups[slot.dim]
    emb = gather_group(params[f"dim{slot.dim}"], group,
                       _global_ids(schema, slot, ids))      # [B, H, L, dim]
    pooled = pool_sequence(emb, ids > 0, slot.pooling)
    return pooled.reshape(pooled.shape[0], -1)


def embed_batch(params: Params, schema: BatchSchema,
                batch: Dict[str, jnp.ndarray],
                tower: Optional[str] = None,
                exclude: Sequence[str] = ()) -> Dict[str, jnp.ndarray]:
    """All sparse features of a batch (optionally one tower) -> pooled dict.

    Features sharing a dim group are gathered in ONE fused take per group
    (ids concatenated along a flat axis, results split back), so the gather
    count per step is the number of dim groups, not features.
    `exclude` skips slots a model embeds itself (e.g. Pdm's attention-pooled
    sequences) so their rows aren't gathered twice per step.
    """
    slots = schema.tower_slots(tower) if tower else \
        [schema.slots[n] for n in schema.order]
    out: Dict[str, jnp.ndarray] = {}

    by_dim: Dict[int, List[FeatureSlot]] = {}
    for slot in slots:
        if slot.name in exclude:
            continue
        if slot.kind == "sparse":
            by_dim.setdefault(slot.dim, []).append(slot)
        elif slot.kind in ("dense", "embedding"):
            out[slot.name] = batch[slot.name].astype(jnp.float32)
        elif slot.kind == "image":
            if f"img_{slot.name}" in params:
                out[slot.name] = patch_embed(
                    params[f"img_{slot.name}"],
                    batch[slot.name].astype(jnp.float32))
            # else: a ViT image encoder owns this slot (models/base.py
            # FeatureEmbedder with Networks image_encoder: vit)

    for dim, group_slots in by_dim.items():
        group = schema.groups[dim]
        table = params[f"dim{dim}"]
        sizes, fused = _fused_ids(schema, group_slots, batch)    # [B, sum(HL)]
        emb = gather_group(table, group, fused,                  # [B, sum, dim]
                           wide_rows=batch.get(rows_key(dim)))
        offset = 0
        for s, size in zip(group_slots, sizes):
            ids = batch[s.name]
            e = emb[:, offset:offset + size, :].reshape(
                ids.shape[0], s.num_hashes, s.max_len, dim)
            offset += size
            pooled = pool_sequence(e, ids > 0, s.pooling)
            out[s.name] = pooled.reshape(ids.shape[0], -1)
    return out


def concat_tower(features: Dict[str, jnp.ndarray], schema: BatchSchema,
                 tower: str) -> jnp.ndarray:
    """Deterministic-order concat of a tower's pooled features -> [B, D]."""
    parts = [features[s.name] for s in schema.tower_slots(tower)
             if s.name in features]
    return jnp.concatenate(parts, axis=-1)


def touched_stored_rows(schema: BatchSchema, params: Params,
                        batch: Dict[str, jnp.ndarray]
                        ) -> Dict[str, jnp.ndarray]:
    """Per stacked-table param name -> SORTED stored-row ids this batch
    touches (same id math as embed_batch's fused gather, divided by the
    packing factor inferred from the stored shape).

    Duplicates are retained: for a row-wise optimizer consuming the DENSE
    combined gradient, every duplicate computes the identical updated row,
    so a sorted scatter-SET with duplicates is well-defined. Used by the
    trainer's sparse table-update path (train/optimizers.py:
    sparse_rowwise_adagrad_update) — at low touched-row fractions it skips
    the 3 full-table HBM passes of the dense update."""
    out: Dict[str, jnp.ndarray] = {}
    by_dim: Dict[int, List[FeatureSlot]] = {}
    for name in schema.order:
        slot = schema.slots[name]
        if slot.kind == "sparse":
            by_dim.setdefault(slot.dim, []).append(slot)
    for dim, group_slots in by_dim.items():
        key = f"dim{dim}"
        if key not in params:
            continue
        p = params[key].shape[1] // dim
        gids = [_global_ids(schema, s, batch[s.name]).reshape(-1)
                for s in group_slots]
        flat = jnp.concatenate(gids) if len(gids) > 1 else gids[0]
        out[key] = jnp.sort(flat // p if p > 1 else flat)
    return out
