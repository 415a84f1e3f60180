"""Sharded embedding (shard_map), JSON legacy config, generators, backup,
embedding-deal pipeline, profiling utilities."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data.schema import compile_schema
from recommendflow_tpu.ops.embedding import gather_group, init_tables
from recommendflow_tpu.parallel.mesh import make_mesh
from recommendflow_tpu.parallel.sharded_embedding import (
    shard_tables, sharded_gather_group,
)


@pytest.mark.slow
def test_sharded_gather_matches_replicated(demo_conf_path):
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    params = init_tables(schema, jax.random.PRNGKey(0))
    mesh = make_mesh()
    sharded = shard_tables(params, mesh)
    rng = np.random.RandomState(0)
    for dim, group in schema.groups.items():
        gids = jnp.asarray(rng.randint(0, group.total_rows, (4, 9)).astype(np.int32))
        ref = gather_group(params[f"dim{dim}"], group, gids)
        got = sharded_gather_group(mesh, "dp", sharded[f"dim{dim}"], group, gids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
        g1 = jax.grad(lambda t: jnp.sum(gather_group(t, group, gids) ** 2))(
            params[f"dim{dim}"])
        g2 = jax.grad(lambda t: jnp.sum(
            sharded_gather_group(mesh, "dp", t, group, gids) ** 2))(
            sharded[f"dim{dim}"])
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5)


def test_json_config_deletion_markers(tmp_path):
    from recommendflow_tpu.config.json_config import load_config
    path = tmp_path / "c.json"
    path.write_text(json.dumps({
        "lr": 0.1, "#lr_old": 0.5,
        "nested": {"a": 1, "#b": 2, "deep": {"#x": 3, "y": 4}},
        "list": [{"#gone": 1, "kept": 2}],
    }))
    conf = load_config(str(path))
    assert conf == {"lr": 0.1, "nested": {"a": 1, "deep": {"y": 4}},
                    "list": [{"kept": 2}]}


def test_generators_and_sbert_merge():
    from recommendflow_tpu.encoder import Tokenizer, build_demo_vocab
    from recommendflow_tpu.encoder.generators import (
        interact_batches, pair_batches, sbert_merge, zipped_batches,
    )
    tok = Tokenizer(build_demo_vocab(["hello", "world", "rank"]))
    q = ["hello world"] * 10
    d = ["rank hello"] * 10
    y = [1.0] * 10
    batches = list(pair_batches(q, d, y, tok, batch_size=4, max_len=8))
    assert len(batches) == 2  # drop remainder
    assert batches[0]["query_tok"].shape == (4, 8)
    zb = next(zipped_batches(q, d, y, tok, batch_size=4, max_len=8))
    assert zb["tok"].shape == (8, 8)
    np.testing.assert_array_equal(zb["tok"][0], zb["tok"][2])  # q rows at even
    ib = next(interact_batches(q, d, y, tok, batch_size=4, max_len=12))
    assert ib["seg"].max() == 1  # second segment present
    m = sbert_merge(np.ones((2, 3)), np.zeros((2, 3)))
    assert m.shape == (2, 9) and (m[:, 6:] == 1).all()


def test_backup_model(tmp_path):
    from recommendflow_tpu.train.checkpoint import backup_model
    src = tmp_path / "model"
    src.mkdir()
    (src / "weights.bin").write_text("data")
    dst = backup_model(str(src), str(tmp_path / "backups"), keep_days=7)
    assert os.path.exists(os.path.join(dst, "weights.bin"))


def test_embedding_deal_pipeline(tmp_path):
    """'embedding' deal: pre-serialized float vectors flow through as dense."""
    import yaml
    from recommendflow_tpu.data.pipeline import Dataset
    from recommendflow_tpu.data.recordio import ColumnSpec, RecordWriter
    text = """
Features:
  feature_group: {}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    item_vec,float,ad,embedding,null,-1,null,true
    item_id,str,ad,hashing,100,8,sum,true
    label,float,label,numeric,null,-1,null,true
Variables:
  seeds: 1
  max_len_map: {item_vec: 4}
"""
    conf = Configuration(conf=yaml.safe_load(text))
    schema = compile_schema(conf.features)
    assert schema.slots["item_vec"].kind == "embedding"
    path = str(tmp_path / "e.rfb")
    cols = [ColumnSpec("item_vec", "float"), ColumnSpec("item_id", "str"),
            ColumnSpec("label", "float")]
    with RecordWriter(path, cols) as w:
        w.write_row({"item_vec": [0.1, 0.2, 0.3, 0.4], "item_id": ["a"], "label": [1.0]})
        w.write_row({"item_vec": [], "item_id": ["b"], "label": [0.0]})
    ds = Dataset(schema, [path], batch_size=2, drop_remainder=False)
    b = next(iter(ds))
    np.testing.assert_allclose(b["item_vec"][0], [0.1, 0.2, 0.3, 0.4], rtol=1e-6)
    np.testing.assert_allclose(b["item_vec"][1], 0.0)  # missing -> zeros


def test_profiling_utils(tmp_path):
    from recommendflow_tpu.utils.profiling import StepTimer, scope_report, timed
    t = StepTimer()
    t.tick()
    t.tick()
    assert t.avg_ms is not None and t.examples_per_sec(128) > 0
    with timed("scope_a"):
        pass
    report = scope_report()
    assert "scope_a" in report


def test_alerts_command_transport(tmp_path):
    from recommendflow_tpu.utils.alerts import send_alert
    out = tmp_path / "alert.json"
    ok = send_alert("boom", command=f"cat > {out}")
    assert ok
    payload = json.loads(out.read_text())
    assert payload["text"] == "boom"


def test_matching_layers():
    from recommendflow_tpu.ops.matching import MultiPerspective, matching_matrix
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 7, 8).astype(np.float32))
    assert matching_matrix(a, b, "dot").shape == (2, 5, 7)
    np.testing.assert_allclose(
        np.asarray(matching_matrix(a, b, "dot"))[0, 1, 2],
        np.dot(np.asarray(a)[0, 1], np.asarray(b)[0, 2]), rtol=1e-5)
    assert matching_matrix(a, b, "mul").shape == (2, 5, 7, 8)
    assert matching_matrix(a, b, "concat").shape == (2, 5, 7, 16)
    with pytest.raises(ValueError, match="unknown matching mode"):
        matching_matrix(a, b, "xor")

    mp = MultiPerspective(num_perspectives=4)
    mask_a = jnp.asarray(rng.rand(2, 5) > 0.2)
    mask_b = jnp.asarray(rng.rand(2, 7) > 0.2)
    v = mp.init(jax.random.PRNGKey(0), a, b, mask_a, mask_b)
    out = mp.apply(v, a, b, mask_a, mask_b)
    assert out.shape == (2, 5, 16)  # 4 strategies x 4 perspectives
    assert np.isfinite(np.asarray(out)).all()
    # masked query rows are zeroed
    dead = ~np.asarray(mask_a)
    assert np.abs(np.asarray(out)[dead]).max() == 0.0


def test_multi_datasets_and_csv(demo_conf_path, tmp_path):
    from recommendflow_tpu.data.pipeline import (
        load_csv_dataset, multi_datasets, multi_datasets_dict,
    )
    from recommendflow_tpu.data.synthetic import generate_records
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    paths = generate_records(conf, str(tmp_path / "r"), num_rows=400, num_files=4)
    chunks = list(multi_datasets(schema, paths, batch_size=50, files_per_dataset=2))
    assert len(chunks) == 2
    assert sum(len(list(c)) for c in chunks) == 8  # 400 rows / 50

    dsd = multi_datasets_dict(schema, str(tmp_path / "r" / "*.rfb"), batch_size=50)
    assert len(dsd) == 4  # one per file keyed by varying suffix

    # CSV direct path
    csv = tmp_path / "x.csv"
    csv.write_text(
        "user_id,clk_item_ids,clk_cat_ids,item_id,item_cat_id,item_ctr,item_cvr,label\n"
        + "\n".join(f'u{i},"i1,i2",1,i{i},2,0.01,0.001,{i%2}' for i in range(60)))
    ds = load_csv_dataset(conf, str(csv), batch_size=30)
    batches = list(ds)
    assert len(batches) == 2 and batches[0]["user_id"].shape == (30, 2, 1)


def test_timeout_decorator():
    import time as _time
    from recommendflow_tpu.encoder.generators import timeout

    @timeout(0.2, fallback=lambda: "fallback")
    def slow():
        _time.sleep(2)
        return "never"

    assert slow() == "fallback"

    @timeout(0.2)
    def slow2():
        _time.sleep(2)

    with pytest.raises(TimeoutError):
        slow2()

    @timeout(5.0)
    def fast():
        return 42
    assert fast() == 42


def test_sharded_gather_bf16_packed(demo_conf_path):
    """bf16 tables pack 4x at dim 64 / 16x at dim 16; the sharded gather must
    infer the stored packing (was hardcoded f32)."""
    import jax.numpy as jnp
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    params = init_tables(schema, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mesh = make_mesh()
    sharded = shard_tables(params, mesh)
    rng = np.random.RandomState(2)
    for dim, group in schema.groups.items():
        gids = jnp.asarray(rng.randint(0, group.total_rows, (3, 5)).astype(np.int32))
        ref = gather_group(params[f"dim{dim}"], group, gids)
        got = sharded_gather_group(mesh, "dp", sharded[f"dim{dim}"], group, gids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-2)


@pytest.mark.slow
def test_shard_tables_opt_state_row_sharded(demo_conf_path, tmp_path):
    from jax.sharding import PartitionSpec as P
    from recommendflow_tpu.data.synthetic import generate_records
    from recommendflow_tpu.data.pipeline import Dataset
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    paths = generate_records(conf, str(tmp_path / "r"), num_rows=256, num_files=1)
    model, _ = build_network("dssm", {"conf": conf, "tower_units": [16]})
    mesh = make_mesh()
    tr = Trainer(model, mesh=mesh, shard_tables=True)
    batch = next(iter(Dataset(schema, paths, batch_size=64)))
    state = tr.init_state(tr._put(batch))
    # find the sharded table's row count, assert an opt accumulator shares it
    # and is actually row-sharded
    sharded_leaves = [l for l in jax.tree.leaves(state.opt_state)
                     if hasattr(l, "sharding") and
                     getattr(l.sharding, "spec", P())[:1] == ("dp",)]
    assert sharded_leaves, "no row-sharded optimizer accumulators found"
    # step runs
    s2, m = tr.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_sharded_gather_bf16_table_returns_f32(demo_conf_path):
    """sharded_gather_group must match gather_group's compute-dtype contract:
    bf16 is table STORAGE only — lookups come back f32 so the towers never
    silently compute in bf16 (a measured regression; regression test for a
    review finding)."""
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    params = init_tables(schema, jax.random.PRNGKey(0))
    params = {k: v.astype(jnp.bfloat16) if k.startswith("dim") else v
              for k, v in params.items()}
    mesh = make_mesh()
    sharded = shard_tables(params, mesh)
    rng = np.random.RandomState(1)
    for dim, group in schema.groups.items():
        gids = jnp.asarray(rng.randint(0, group.total_rows, (2, 5)).astype(np.int32))
        ref = gather_group(params[f"dim{dim}"], group, gids)
        got = sharded_gather_group(mesh, "dp", sharded[f"dim{dim}"], group, gids)
        assert got.dtype == jnp.float32 and ref.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6)


def test_shard_tables_leaves_non_table_params_replicated():
    """Only the stacked 'dim{d}' tables row-shard; an 'img_*' patch
    projection with divisible rows must stay replicated (sharding a tiny
    dense matmul operand costs an all-gather per use)."""
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh()
    n_dev = mesh.devices.size
    params = {
        "dim8": jnp.zeros((16 * n_dev, 128), jnp.float32),
        "img_pic": jnp.zeros((24 * n_dev, 64), jnp.float32),
    }
    sharded = shard_tables(params, mesh)
    assert sharded["dim8"].sharding.spec == P("dp", None)
    assert sharded["img_pic"].sharding.spec in (P(), P(None, None))


@pytest.mark.slow
def test_expert_parallel_mmoe_matches_replicated():
    """Expert parallelism: Mmoe under a 2-D (dp, ep) mesh with
    Trainer(shard_experts=True) places the ExpertsMLP [E, ...] parameters
    P('ep', ...) and trains IDENTICALLY to the unsharded model from the
    same init — sharding is placement, not math. Also asserts the expert
    kernels and their Adam accumulators actually landed ep-sharded."""
    from jax.sharding import PartitionSpec as P

    from recommendflow_tpu.data.synthetic import synthetic_batch
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer

    path = os.path.join(os.path.dirname(__file__), "..", "conf",
                        "demo_ranking.yaml")
    conf = Configuration(path)
    model, _ = build_network("recommendflow_tpu.models.ranking.mmoe.Mmoe",
                             {"conf": conf, "num_experts": 4, "num_tasks": 2,
                              "expert_units": (16,), "tower_units": (8,),
                              "dropout": 0.0})
    schema = compile_schema(conf.features)
    batch = {k: np.asarray(v)
             for k, v in synthetic_batch(schema, 16, seed=3).items()}

    ref_trainer = Trainer(model, learning_rate=1e-2, seed=0)
    ref_state = ref_trainer.init_state(batch)

    mesh = make_mesh(jax.devices()[:8], axis_names=("dp", "ep"),
                     shape=(4, 2))
    ep_trainer = Trainer(model, learning_rate=1e-2, mesh=mesh,
                         shard_experts=True, seed=0)
    ep_state = ep_trainer.init_state(ep_trainer._put(batch))

    kern = ep_state.params["ExpertsMLP_0"]["experts"]["Dense_0"]["kernel"]
    assert kern.shape[0] == 4
    assert kern.sharding.spec == P("ep", None, None), kern.sharding
    # Adam mu mirrors the sharding (full-shape match in init_state)
    mus = [l for l in jax.tree.leaves(ep_state.opt_state)
           if hasattr(l, "shape") and l.shape == kern.shape]
    assert mus and all(m.sharding.spec == P("ep", None, None) for m in mus)

    for _ in range(3):
        ref_state, ref_m = ref_trainer.train_step(ref_state, batch)
        ep_state, ep_m = ep_trainer.train_step(ep_state, batch)
    assert float(ep_m["loss"]) == pytest.approx(float(ref_m["loss"]),
                                                rel=1e-4)
    got = np.asarray(ep_state.params["ExpertsMLP_0"]["experts"]["Dense_0"]["kernel"])
    want = np.asarray(ref_state.params["ExpertsMLP_0"]["experts"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_opt_state_placement_matches_by_path_not_shape():
    """A replicated tower kernel with the SAME shape as an ep-sharded
    expert bias must keep replicated optimizer state — placement matches
    opt leaves to params by key-path suffix, not by bare shape (regression
    for a review finding)."""
    from jax.sharding import PartitionSpec as P

    from recommendflow_tpu.data.synthetic import synthetic_batch
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer

    path = os.path.join(os.path.dirname(__file__), "..", "conf",
                        "demo_ranking.yaml")
    conf = Configuration(path)
    # expert Dense_0 bias stacks to [16, 16]; tower0 Dense_0 kernel is
    # also [16, 16] (expert output 16 -> tower width 16) but replicated
    model, _ = build_network("recommendflow_tpu.models.ranking.mmoe.Mmoe",
                             {"conf": conf, "num_experts": 16, "num_tasks": 1,
                              "expert_units": (16,), "tower_units": (16,),
                              "dropout": 0.0})
    schema = compile_schema(conf.features)
    batch = {k: np.asarray(v)
             for k, v in synthetic_batch(schema, 16, seed=5).items()}
    mesh = make_mesh(jax.devices()[:8], axis_names=("dp", "ep"), shape=(4, 2))
    tr = Trainer(model, mesh=mesh, shard_experts=True, seed=0)
    state = tr.init_state(tr._put(batch))

    bias = state.params["ExpertsMLP_0"]["experts"]["Dense_0"]["bias"]
    kern = state.params["tower0"]["Dense_0"]["kernel"]
    assert bias.shape == kern.shape == (16, 16)
    assert bias.sharding.spec == P("ep", None)
    assert kern.sharding.spec in (P(), P(None, None))

    flat, _ = jax.tree_util.tree_flatten_with_path(state.opt_state)
    tower_mus = [l for p, l in flat if "tower0" in jax.tree_util.keystr(p)
                 and "kernel" in jax.tree_util.keystr(p)
                 and hasattr(l, "sharding")]
    expert_mus = [l for p, l in flat
                  if "experts" in jax.tree_util.keystr(p)
                  and "bias" in jax.tree_util.keystr(p)
                  and hasattr(l, "shape") and l.shape == (16, 16)]
    assert tower_mus and expert_mus
    assert all(l.sharding.spec in (P(), P(None, None)) for l in tower_mus)
    assert all(l.sharding.spec == P("ep", None) for l in expert_mus)
    s2, m = tr.train_step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_expert_rules_require_ep_axis():
    from recommendflow_tpu.parallel.mesh import expert_sharding_rules
    mesh = make_mesh()  # dp only
    with pytest.raises(ValueError, match="'ep' mesh axis"):
        expert_sharding_rules({"x": jnp.zeros((4, 2))}, mesh)


def test_mmoe_legacy_checkpoint_migration():
    """Pre-ExpertsMLP Mmoe checkpoints (per-expert 'expert{i}' subtrees)
    migrate into the stacked layout and restore exactly."""
    from recommendflow_tpu.data.synthetic import synthetic_batch
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.models.ranking.mmoe import migrate_legacy_params

    path = os.path.join(os.path.dirname(__file__), "..", "conf",
                        "demo_ranking.yaml")
    conf = Configuration(path)
    model, _ = build_network("recommendflow_tpu.models.ranking.mmoe.Mmoe",
                             {"conf": conf, "num_experts": 3, "num_tasks": 1,
                              "expert_units": (8,), "tower_units": (8,)})
    schema = compile_schema(conf.features)
    batch = {k: np.asarray(v)
             for k, v in synthetic_batch(schema, 8, seed=1).items()}
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)
    params = jax.tree.map(lambda x: x, dict(variables["params"]))

    # synthesize the legacy layout: unstack ExpertsMLP_0/experts
    legacy = dict(params)
    stacked = legacy.pop("ExpertsMLP_0")["experts"]
    for i in range(3):
        legacy[f"expert{i}"] = jax.tree.map(lambda x: x[i], stacked)

    migrated = migrate_legacy_params(legacy)
    ref_flat, ref_tree = jax.tree_util.tree_flatten(params)
    got_flat, got_tree = jax.tree_util.tree_flatten(migrated)
    assert ref_tree == got_tree
    for a, b in zip(ref_flat, got_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # already-stacked trees pass through untouched
    assert migrate_legacy_params(migrated) is migrated


def test_preempt_sync_single_process_semantics():
    """_PreemptSync unit behavior (the cross-process agreement used by
    fit() when process_count > 1): flags propagate through the device
    reduce, agreements are consumed DETERMINISTICALLY exactly `window`
    pushes after dispatch (never early on is_ready — that is per-host
    timing and would desync the fleet), drain settles everything."""
    from recommendflow_tpu.train.trainer import _PreemptSync
    ps = _PreemptSync(window=3)
    for _ in range(3):
        ps.push(False)
    # nothing beyond the window yet and all-false anyway
    assert ps.should_stop() is False
    ps.push(True)                            # agreement at index 3
    ps.push(False)
    # the True agreement is only 2 pushes old: still inside the window —
    # every process sees False here at the same loop index
    assert ps.should_stop() is False
    ps.push(False)
    assert ps.should_stop() is False
    ps.push(False)
    # ...and surfaces exactly when it ages past the window
    assert ps.should_stop() is True
    assert ps.drain(False) is False          # remaining pendings all-false
    ps2 = _PreemptSync(window=8)
    ps2.push(False)
    assert ps2.drain(True) is True           # fresh agreement sees the flag
    assert ps2.agree(False) is False         # immediate agreement helper
    assert ps2.agree(True) is True
