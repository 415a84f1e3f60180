"""Embedding engine tests: stacked-table lookup vs naive per-feature gather,
pooling semantics, masking, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.config.proto import FeaturePooling
from recommendflow_tpu.data.schema import compile_schema
from recommendflow_tpu.ops.embedding import (
    concat_tower, embed_batch, gather_group, init_tables, lookup_feature,
    pack_factor, pool_sequence, table_shape,
)


@pytest.fixture(scope="module")
def setup(demo_conf_path):
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    params = init_tables(schema, jax.random.PRNGKey(0))
    return conf, schema, params


def test_init_tables_shapes_and_pad_rows(setup):
    _, schema, params = setup
    for dim, group in schema.groups.items():
        table = params[f"dim{dim}"]
        assert table.shape == table_shape(group)
        p = pack_factor(dim)
        assert table.shape[1] == p * dim
        flat = np.asarray(table).reshape(-1, dim)
        for off in group.offsets:  # pad row of every member table is zero
            assert np.allclose(flat[off], 0.0)


def test_pack_factor_and_gather_group(setup):
    assert pack_factor(64) == 2 and pack_factor(16) == 8
    assert pack_factor(128) == 1 and pack_factor(48) == 1 and pack_factor(200) == 1
    _, schema, params = setup
    dim, group = next(iter(schema.groups.items()))
    table = params[f"dim{dim}"]
    rng = np.random.RandomState(0)
    gids = jnp.asarray(rng.randint(0, group.total_rows, size=(4, 7)).astype(np.int32))
    got = np.asarray(gather_group(table, group, gids))
    flat = np.asarray(table).reshape(-1, dim)  # unpacked logical view
    np.testing.assert_allclose(got, flat[np.asarray(gids)], rtol=1e-6)


def test_pool_sequence_semantics():
    emb = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    mask = jnp.asarray([[True, True, False, False]])
    e = np.arange(24, dtype=np.float32).reshape(4, 6)
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Sum)[0], e[0] + e[1])
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Avg)[0], (e[0] + e[1]) / 2)
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Max)[0], np.maximum(e[0], e[1]))
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Min)[0], np.minimum(e[0], e[1]))
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.First)[0], e[0])
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Cls)[0], e[0])
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Last)[0], e[1])  # last VALID


def test_pool_all_masked_gives_zero():
    emb = jnp.ones((2, 3, 4))
    mask = jnp.zeros((2, 3), dtype=bool)
    for p in (FeaturePooling.Sum, FeaturePooling.Avg, FeaturePooling.Max,
              FeaturePooling.Min, FeaturePooling.First, FeaturePooling.Last):
        out = pool_sequence(emb, mask, p)
        np.testing.assert_allclose(np.asarray(out), 0.0, err_msg=str(p))


def test_lookup_matches_naive(setup):
    """Stacked-table lookup == per-feature naive table slice + masked sum."""
    _, schema, params = setup
    slot = schema.slots["clk_item_ids"]
    rng = np.random.RandomState(0)
    ids = rng.randint(0, slot.num_rows, size=(5, slot.num_hashes, slot.max_len)).astype(np.int32)
    ids[:, :, -3:] = 0  # some padding
    got = np.asarray(lookup_feature(params, schema, slot, jnp.asarray(ids)))
    # naive: slice each branch's table out of the (unpacked) stack
    group = schema.groups[slot.dim]
    table = np.asarray(params[f"dim{slot.dim}"]).reshape(-1, slot.dim)
    parts = []
    for h in range(slot.num_hashes):
        off = group.offset_of(slot.name, h)
        sub = table[off:off + slot.num_rows]
        emb = sub[ids[:, h, :]]                      # [5, L, dim]
        m = (ids[:, h, :] > 0)[..., None]
        parts.append((emb * m).sum(axis=1))
    naive = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(got, naive, rtol=1e-5)
    assert got.shape == (5, slot.num_hashes * slot.dim)


def test_embed_batch_and_tower_concat(setup):
    conf, schema, params = setup
    rng = np.random.RandomState(1)
    B = 4
    batch = {}
    for name in schema.order:
        s = schema.slots[name]
        if s.kind == "sparse":
            batch[name] = jnp.asarray(
                rng.randint(0, s.num_rows, size=(B,) + s.batch_shape).astype(np.int32))
        else:
            batch[name] = jnp.asarray(rng.rand(B, *s.batch_shape).astype(np.float32))
    feats = embed_batch(params, schema, batch)
    assert set(feats) == set(schema.order)
    user = concat_tower(feats, schema, "user")
    ad = concat_tower(feats, schema, "ad")
    assert user.shape == (B, schema.tower_dim("user"))
    assert ad.shape == (B, schema.tower_dim("ad"))


def test_gradients_flow_and_pad_row_stays_zero(setup):
    """Scatter-add grads hit only touched rows; pad rows get zero grad when
    all their ids are masked."""
    _, schema, params = setup
    slot = schema.slots["item_cat_id"]
    ids = jnp.asarray([[[3]], [[0]]], dtype=jnp.int32)  # row1 real, row2 pad

    def loss(p):
        out = lookup_feature(p, schema, slot, ids)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    g = np.asarray(grads[f"dim{slot.dim}"]).reshape(-1, slot.dim)  # unpacked view
    group = schema.groups[slot.dim]
    off = group.offset_of(slot.name, 0)
    assert np.abs(g[off + 3]).sum() > 0      # touched row has gradient
    assert np.abs(g[off + 0]).sum() == 0     # pad row masked out of pooling
    # untouched dim group gets zero grads
    other_dims = [d for d in schema.groups if d != slot.dim]
    for d in other_dims:
        assert np.abs(np.asarray(grads[f"dim{d}"])).sum() == 0


def test_lookup_jit_compiles_once(setup):
    _, schema, params = setup
    slot = schema.slots["user_id"]
    fn = jax.jit(lambda p, i: lookup_feature(p, schema, slot, i))
    ids1 = jnp.ones((8,) + slot.batch_shape, jnp.int32)
    ids2 = 2 * jnp.ones((8,) + slot.batch_shape, jnp.int32)
    out1 = fn(params, ids1)
    out2 = fn(params, ids2)
    assert out1.shape == out2.shape == (8, slot.num_hashes * slot.dim)


def test_pooling_with_mid_sequence_holes():
    """Lookup/hashing misses leave PAD holes IN PLACE: first/last must
    mean first/last VALID, not position 0 / length-1 (review-fix pin)."""
    e = np.arange(24, dtype=np.float32).reshape(4, 6)
    emb = jnp.asarray(e[None])
    mask = jnp.asarray([[False, True, False, True]])  # holes at 0 and 2
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.First)[0], e[1])
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Last)[0], e[3])
    # CLS stays strictly position 0 (masked)
    np.testing.assert_allclose(
        pool_sequence(emb, mask, FeaturePooling.Cls)[0], np.zeros(6))


def test_null_pooling_out_dim_matches_flattened_width():
    import yaml
    from recommendflow_tpu.data.schema import compile_schema
    text = """
Features:
  feature_group: {}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features: |
    seq,str,user,hashing,100,8,null,true
    label,float,label,numeric,null,-1,null,true
Variables:
  seeds: 1
  max_len_map: {seq: 5}
"""
    from recommendflow_tpu.config import Configuration
    schema = compile_schema(Configuration(conf=yaml.safe_load(text)).features)
    s = schema.slots["seq"]
    assert s.out_dim == s.num_hashes * 5 * 8  # H * L * D, not H * D
    assert schema.tower_dim("user") == s.out_dim


def _demo_batch(schema, B=4, seed=1):
    rng = np.random.RandomState(seed)
    batch = {}
    for name in schema.order:
        s = schema.slots[name]
        if s.kind == "sparse":
            batch[name] = jnp.asarray(rng.randint(
                0, s.num_rows, size=(B,) + s.batch_shape).astype(np.int32))
        else:
            batch[name] = jnp.asarray(
                rng.rand(B, *s.batch_shape).astype(np.float32))
    return batch


def test_tower_vectors_matches_per_tower_passes(setup):
    """The fused two-tower embed pass (models/base.py tower_vectors — one
    gather/backward-scatter per dim group, -3.2 ms/step at bench scale,
    PERF.md §2) must be bit-identical to per-tower tower_vector calls in
    BOTH the forward values and the table gradients."""
    from recommendflow_tpu.models.base import FeatureEmbedder
    conf, schema, params = setup
    emb = FeatureEmbedder(schema)
    batch = _demo_batch(schema)
    variables = emb.init(jax.random.PRNGKey(2), batch)

    fused_u, fused_a = emb.apply(variables, batch, ("user", "ad"),
                                 method=FeatureEmbedder.tower_vectors)
    sep_u = emb.apply(variables, batch, "user",
                      method=FeatureEmbedder.tower_vector)
    sep_a = emb.apply(variables, batch, "ad",
                      method=FeatureEmbedder.tower_vector)
    np.testing.assert_array_equal(np.asarray(fused_u), np.asarray(sep_u))
    np.testing.assert_array_equal(np.asarray(fused_a), np.asarray(sep_a))

    def loss_fused(v):
        u, a = emb.apply(v, batch, ("user", "ad"),
                         method=FeatureEmbedder.tower_vectors)
        return jnp.sum(u * u) + 2.0 * jnp.sum(a)

    def loss_sep(v):
        u = emb.apply(v, batch, "user", method=FeatureEmbedder.tower_vector)
        a = emb.apply(v, batch, "ad", method=FeatureEmbedder.tower_vector)
        return jnp.sum(u * u) + 2.0 * jnp.sum(a)

    g1 = jax.grad(loss_fused)(variables)
    g2 = jax.grad(loss_sep)(variables)
    for (k1, l1), (k2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        np.testing.assert_allclose(np.asarray(l1, np.float32),
                                   np.asarray(l2, np.float32),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k1))
