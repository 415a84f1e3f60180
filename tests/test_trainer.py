"""Trainer tests: end-to-end fit on synthetic demo data, callbacks,
checkpoint resume, promotion gate, streaming AUC."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import compile_schema
from recommendflow_tpu.data.pipeline import Dataset
from recommendflow_tpu.data.synthetic import generate_records
from recommendflow_tpu.models.base import build_network
from recommendflow_tpu.parallel.mesh import make_mesh
from recommendflow_tpu.train import (
    EarlyStopping, EvalCallback, ModelCheckpoint, PromotionBlocked,
    ReduceLROnPlateau, Trainer, current_learning_rate, model_online_monitor,
    set_learning_rate,
)
from recommendflow_tpu.train.metrics import auc_init, auc_result, auc_update, roc_auc


@pytest.fixture(scope="module")
def world(demo_conf_path, tmp_path_factory):
    conf = Configuration(demo_conf_path)
    out = str(tmp_path_factory.mktemp("records"))
    paths = generate_records(conf, out, num_rows=2000, num_files=2, seed=7)
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [64]})
    return conf, schema, paths, model


@pytest.mark.slow
def test_fit_reduces_loss_and_auc_above_chance(world):
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=256, shuffle=True, seed=0)
    valid = Dataset(schema, paths[:1], batch_size=256, shuffle=False, take_batches=3)
    trainer = Trainer(model, learning_rate=3e-3, mesh=make_mesh())
    result = trainer.fit(train, epochs=3, valid_ds=valid)
    hist = result["history"]
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert hist[-1]["val_auc"] > 0.6  # planted structure learned
    assert hist[-1]["examples_per_sec"] > 0


def test_early_stopping_and_plateau(world):
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=256, shuffle=True, take_batches=2)
    trainer = Trainer(model, learning_rate=1e-3, mesh=make_mesh())

    # feed a fake metric that never improves -> stop after patience epochs
    calls = {"n": 0}

    def fake_eval(tr, state):
        calls["n"] += 1
        return {"val_auc": 0.5}

    result = trainer.fit(
        train, epochs=10,
        callbacks=[EvalCallback(fake_eval),
                   EarlyStopping(monitor="val_auc", patience=2),
                   ReduceLROnPlateau(monitor="val_auc", patience=1, factor=0.5)])
    n_epochs = len(result["history"])
    assert n_epochs <= 4  # stopped early (patience 2 after first best)
    assert trainer.control["lr_scale"] < 1.0  # plateau fired


@pytest.mark.slow
def test_checkpoint_save_restore(world, tmp_path):
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=256, take_batches=2)
    trainer = Trainer(model, learning_rate=1e-3)
    root = str(tmp_path / "ckpt")
    result = trainer.fit(train, epochs=2,
                         callbacks=[ModelCheckpoint(root, monitor="loss", mode="min")])
    state = result["state"]
    from recommendflow_tpu.train.checkpoint import latest_step, restore_checkpoint
    assert latest_step(root) == 1
    restored = restore_checkpoint(root, state)
    # params identical after restore of the same step
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # resuming a FINISHED run (2 epochs done, epochs<=2 requested) is a no-op
    done = trainer.fit(train, epochs=2, state=restored)
    assert done["history"] == []
    # extending to 3 epochs runs exactly the one remaining epoch
    result2 = trainer.fit(train, epochs=3, state=restored)
    assert len(result2["history"]) == 1


def test_set_learning_rate(world):
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=128, take_batches=1)
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(trainer._put(next(iter(train))))
    assert current_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert current_learning_rate(state) == pytest.approx(5e-4)
    # step still works after LR rewrite
    state2, metrics = trainer.train_step(state, next(iter(train)))
    assert np.isfinite(float(metrics["loss"]))


def test_predict_shapes(world):
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, take_batches=3)
    trainer = Trainer(model)
    state = trainer.init_state(trainer._put(next(iter(ds))))
    out = trainer.predict(state, ds)
    assert out["user"].shape == (3 * 128, 128)
    assert np.allclose(np.linalg.norm(out["user"], axis=1), 1.0, atol=1e-4)


def test_promotion_gate():
    old = {"hit@50": 0.5, "auc": 0.8}
    good = {"hit@50": 0.49, "auc": 0.81}
    bad = {"hit@50": 0.3, "auc": 0.8}
    constraints = {"hit@50": "[-0.1, inf)", "auc": "[-0.05, inf)"}
    changes = model_online_monitor(old, good, constraints)
    assert changes["hit@50"] == pytest.approx(-0.02)
    alerts = []
    with pytest.raises(PromotionBlocked, match="hit@50"):
        model_online_monitor(old, bad, constraints, alert=alerts.append)
    assert alerts and "hit@50" in alerts[0]


def test_streaming_auc_close_to_exact():
    rng = np.random.RandomState(0)
    y = (rng.rand(4000) > 0.5).astype(np.float32)
    score = np.clip(0.5 * y + 0.3 * rng.rand(4000), 0, 1).astype(np.float32)
    state = auc_init(200)
    for i in range(0, 4000, 500):
        state = auc_update(state, jnp.asarray(y[i:i + 500]),
                           jnp.asarray(score[i:i + 500]))
    approx = float(auc_result(state))
    exact = roc_auc(y, score)
    assert abs(approx - exact) < 0.01


def test_train_steps_scan_matches_singles(world):
    """K scanned steps == K sequential single steps (same rng fold path)."""
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=64, shuffle=False, take_batches=4)
    batches = list(train)
    t1 = Trainer(model, learning_rate=1e-3)
    s1 = t1.init_state(t1._put(batches[0]))
    for b in batches[:3]:
        s1, m1 = t1.train_step(s1, b)
    t2 = Trainer(model, learning_rate=1e-3)
    s2 = t2.init_state(t2._put(batches[0]))
    s2, m2 = t2.train_steps(s2, batches[:3])
    assert int(s1.step) == int(s2.step) == 3
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)


def test_split_table_update_matches_dense(world):
    """table_update='split' (rows gathered outside the differentiated step,
    sparse row cotangents, per-table dense/sparse strategies) must train
    identically to the dense-cotangent pipeline."""
    conf, schema, paths, model = world
    assert model.row_injection  # Dssm embeds all slots in one pass
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=4)
    batches = list(ds)

    def run(mode, **kw):
        t = Trainer(model, learning_rate=1e-3, table_update=mode, seed=5)
        s = t.init_state(batches[0])
        losses = []
        for b in batches:
            s, m = t.train_step(s, b)
            losses.append(float(m["loss"]))
        return t, losses, jax.device_get(s.params)

    t_dense, dense_losses, dense_params = run("dense")
    t_split, split_losses, split_params = run("split")
    assert t_split._split_dims, "split plan did not engage"
    np.testing.assert_allclose(split_losses, dense_losses, rtol=1e-5)
    keystr = jax.tree_util.keystr
    da = {keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(dense_params)}
    sa = {keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(split_params)}
    assert da.keys() == sa.keys()
    for k in da:
        np.testing.assert_allclose(np.asarray(da[k], np.float32),
                                   np.asarray(sa[k], np.float32),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_misflagged_row_injection_fails_fast(world):
    """VERDICT r4 #3 guard: a model flagged row_injection=True whose graph
    reads a table OUTSIDE the injected embed pass (the Que2Search/
    Pdm-unpooled shape) must raise at init_state — under the split path
    those reads' gradients would be silently dropped (frozen optax
    labels) and the model would just converge worse."""
    import flax.linen as nn

    from recommendflow_tpu.models.base import FeatureEmbedder, RecModel

    conf, schema, paths, _ = world
    ds = Dataset(schema, paths, batch_size=64, shuffle=False, take_batches=1)
    batch = next(iter(ds))

    class Misflagged(RecModel):
        row_injection = True  # WRONG: unpooled() below reads dim16 directly

        @nn.compact
        def __call__(self, b, training=False):
            emb = FeatureEmbedder(self.schema, name="embedder")
            u, a = emb.tower_vectors(b, ("user", "ad"))
            # the footgun: a SECOND table read bypassing the injected rows
            extra = emb.unpooled(b, "clk_item_ids")        # [B, H, L, d]
            u = u + jnp.sum(extra, axis=(1, 2, 3))[:, None]
            if training:
                return jnp.mean(jnp.sum(u, 1) * jnp.sum(a, 1)), {}
            return {"user": u, "ad": a, "label": b["label"]}

    t = Trainer(Misflagged(conf=conf), learning_rate=1e-3,
                table_update="split")
    with pytest.raises(ValueError, match="row_injection"):
        t.init_state(batch)
    # the same guard must PASS a correctly-flagged model (every table read
    # through the one embed_batch pass)
    good, _ = build_network(conf.networks["class"],
                            {"conf": conf, "tower_units": [32]})
    tg = Trainer(good, learning_rate=1e-3, table_update="split")
    sg = tg.init_state(batch)
    assert tg._split_dims
    sg, m = tg.train_step(sg, batch)
    assert np.isfinite(float(m["loss"]))
    # ... including a model with EXTRA variable collections (the logQ
    # 'freq' stream) — the validator must thread them through apply
    import copy
    conf2 = copy.deepcopy(conf)
    conf2.networks["logq_feature"] = "item_id"
    conf2.networks["logq_buckets"] = 128
    lq, _ = build_network(conf2.networks["class"],
                          {"conf": conf2, "tower_units": [32]})
    tl = Trainer(lq, learning_rate=1e-3, table_update="split")
    sl = tl.init_state(batch)
    assert tl._split_dims
    sl, m = tl.train_step(sl, batch)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.parametrize("strategy", ["sparse", "sparse_set"])
def test_split_sparse_strategy_matches_dense_strategy(strategy):
    """split_table_update strategy='sparse'/'sparse_set' == strategy='dense'
    on f32 tables with heavy duplicate ids (duplicate grads must be SUMMED
    before squaring, exactly like the dense scatter-add). sparse_set routes
    padding segments out of bounds (mode='drop') so its scatter indices are
    sorted AND unique — the fast SET path; verified bit-equal on device
    too (benchmarks/micro_split_update.py session)."""
    from recommendflow_tpu.train.optimizers import split_table_update
    rng = np.random.RandomState(0)
    R, W, N = 64, 8, 40
    p = jnp.asarray(rng.randn(R, W), jnp.float32)
    acc = jnp.full((R, 1), 0.1, jnp.float32)
    ids = jnp.asarray(rng.randint(0, 16, N), jnp.int32)  # many duplicates
    g = jnp.asarray(rng.randn(N, W), jnp.float32)
    pd, ad = split_table_update(p, acc, ids, g, lr=0.05, strategy="dense")
    ps, as_ = split_table_update(p, acc, ids, g, lr=0.05, strategy=strategy)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(as_),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(ps),
                               rtol=1e-5, atol=1e-6)
    # untouched rows unchanged
    untouched = np.setdiff1d(np.arange(R), np.asarray(ids))
    np.testing.assert_array_equal(np.asarray(ps)[untouched],
                                  np.asarray(p)[untouched])
    # single-unique-row edge (k == 1: every non-first segment is padding)
    ids1 = jnp.full((N,), R - 1, jnp.int32)
    pd1, ad1 = split_table_update(p, acc, ids1, g, lr=0.05, strategy="dense")
    ps1, as1 = split_table_update(p, acc, ids1, g, lr=0.05, strategy=strategy)
    np.testing.assert_allclose(np.asarray(pd1), np.asarray(ps1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ad1), np.asarray(as1),
                               rtol=1e-5, atol=1e-6)


def test_segment_row_grads_fused_uid_matches_legacy():
    """The fused path (uid rides the segment-sum as a masked-id f32 column,
    num_rows < 2^24) must agree exactly with the legacy two-pass
    segment_max form (num_rows >= 2^24 triggers it) on the overlapping id
    range — same sums, same compacted ids, same valid mask."""
    from recommendflow_tpu.train.optimizers import segment_row_grads
    rng = np.random.RandomState(3)
    N, W = 64, 8
    s = jnp.asarray(np.sort(rng.randint(0, 40, N)), jnp.int32)
    gs = jnp.asarray(rng.randn(N, W), jnp.float32)
    fused = segment_row_grads(s, gs, num_rows=1000)          # < 2^24 path
    legacy = segment_row_grads(s, gs, num_rows=(1 << 24))    # >= 2^24 path
    np.testing.assert_array_equal(np.asarray(fused[0]), np.asarray(legacy[0]))
    np.testing.assert_array_equal(np.asarray(fused[2]), np.asarray(legacy[2]))
    valid = np.asarray(fused[2])
    # real segments: identical compacted ids; padding differs only by the
    # num_rows offset each path adds
    np.testing.assert_array_equal(np.asarray(fused[1])[valid],
                                  np.asarray(legacy[1])[valid])
    pad = ~valid
    np.testing.assert_array_equal(np.asarray(fused[1])[pad] - 1000,
                                  np.asarray(legacy[1])[pad] - (1 << 24))


def test_fit_scan_steps_matches_single_dispatch(world):
    """fit(scan_steps=4) == fit(scan_steps=1): same steps, same params, same
    epoch metrics (chunk means re-weighted), tail (<k) handled by single
    steps. CPU defaults to scan_steps=1, so the chunked hot loop needs this
    explicit pin."""
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=64, shuffle=False,
                    take_batches=6)  # 6 = one chunk of 4 + 2 tail singles

    def run(k):
        t = Trainer(model, learning_rate=1e-3, seed=17)
        out = t.fit(train, epochs=2, log_every=10 ** 9, verbose=False,
                    scan_steps=k)
        return out["state"], out["history"]

    s1, h1 = run(1)
    s4, h4 = run(4)
    assert int(s1.step) == int(s4.step) == 12
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-5)
    for e1, e4 in zip(h1, h4):
        np.testing.assert_allclose(e1["loss"], e4["loss"], rtol=1e-4)


def test_mid_epoch_resume(world, tmp_path):
    """Kill mid-epoch, restore, resume: the resumed run consumes exactly the
    remaining batches of the deterministic stream."""
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=128, shuffle=True, seed=5)
    steps_per_epoch = len(train)
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(trainer._put(next(iter(train))))
    # simulate 5 steps done then a crash
    for i, b in enumerate(train):
        state, _ = trainer.train_step(state, b)
        if i == 4:
            break
    from recommendflow_tpu.train.checkpoint import restore_pytree, save_pytree
    save_pytree(str(tmp_path / "mid"), state)
    restored = restore_pytree(str(tmp_path / "mid"), state)
    assert int(restored.step) == 5
    result = trainer.fit(train, epochs=1, state=restored)
    # resumed epoch ran only the remaining batches
    final_step = int(result["state"].step)
    assert final_step == steps_per_epoch


def test_early_stop_restored_state_survives_donation(world, tmp_path):
    """The restored best state must remain usable (saveable/predictable)
    after subsequent donated train steps deleted the live buffers."""
    conf, schema, paths, model = world
    train = Dataset(schema, paths, batch_size=128, take_batches=2)
    trainer = Trainer(model, learning_rate=1e-3)

    vals = iter([0.9, 0.5, 0.4, 0.3, 0.2])  # best at epoch 0, then decay

    def fake_eval(tr, state):
        return {"val_auc": next(vals)}

    result = trainer.fit(train, epochs=5,
                         callbacks=[EvalCallback(fake_eval),
                                    EarlyStopping(monitor="val_auc", patience=2)])
    state = result["state"]  # the restored epoch-0 best
    # both of these would raise 'Array has been deleted' without host copy
    from recommendflow_tpu.train.checkpoint import save_pytree
    save_pytree(str(tmp_path / "best"), state)
    out = trainer.predict(state, train)
    assert np.isfinite(out["user"]).all()


def test_resume_with_repeat_and_remainder(world, tmp_path):
    """drop_remainder discards tail rows per rep; resume/len must account in
    batches per rep, not raw rows."""
    conf, schema, paths, model = world
    # 2000 rows, batch 300 -> 6 batches/rep with 200 rows dropped per rep
    ds = Dataset(schema, paths, batch_size=300, shuffle=True, seed=2, repeat=2)
    full = list(ds)
    assert len(full) == len(ds) == 12  # 6 per rep x 2
    resumed = list(ds.iter_from(skip_batches=7))  # into the second rep
    assert len(resumed) == 5
    for a, b in zip(full[7:], resumed):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_epochs_reshuffle_differently(world):
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=True, seed=0)
    e0 = next(iter(ds.iter_from(0, epoch=0)))
    e1 = next(iter(ds.iter_from(0, epoch=1)))
    e0b = next(iter(ds.iter_from(0, epoch=0)))
    assert not np.array_equal(e0["user_id"], e1["user_id"])  # different order
    np.testing.assert_array_equal(e0["user_id"], e0b["user_id"])  # deterministic


def test_sparse_table_update_matches_dense(world):
    """Trainer(table_update='sparse') must produce the same training
    trajectory as the dense row-wise Adagrad path (identical math on touched
    rows, untouched rows untouched by definition)."""
    import jax
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=4)
    batches = list(ds)

    def run(mode):
        t = Trainer(model, learning_rate=1e-3, table_update=mode, seed=3)
        state = t.init_state(batches[0])
        losses = []
        for b in batches:
            state, m = t.train_step(state, b)
            losses.append(float(m["loss"]))
        return losses, jax.device_get(state.params)

    dense_losses, dense_params = run("dense")
    sparse_losses, sparse_params = run("sparse")
    np.testing.assert_allclose(sparse_losses, dense_losses, rtol=1e-4)
    flat_d = jax.tree_util.tree_leaves_with_path(dense_params)
    flat_s = dict((tuple(str(p) for p in k), v)
                  for k, v in jax.tree_util.tree_leaves_with_path(sparse_params))
    for k, v in flat_d:
        key = tuple(str(p) for p in k)
        np.testing.assert_allclose(flat_s[key], v, rtol=2e-4, atol=2e-5,
                                   err_msg=str(key))


def test_auto_table_update_gates_by_cost(world):
    """'auto' must stay dense when the table is small relative to the batch's
    touched rows (the demo config), engaging sparse only when forced."""
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=1)
    batch = next(iter(ds))
    t_auto = Trainer(model, learning_rate=1e-3, table_update="auto")
    t_auto.init_state(batch)
    assert not t_auto._sparse_dims          # tiny demo tables: dense wins
    t_sparse = Trainer(model, learning_rate=1e-3, table_update="sparse")
    state = t_sparse.init_state(batch)
    assert t_sparse._sparse_dims
    assert state.table_acc                  # accumulators live on the state


@pytest.mark.slow
def test_sparse_table_update_under_mesh(world):
    """sparse table updates must be exact under a dp mesh too (batch is
    dp-sharded; ids all-gather implicitly, tables stay replicated)."""
    import jax
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=3)
    batches = list(ds)

    def run(mode, mesh):
        t = Trainer(model, learning_rate=1e-3, table_update=mode,
                    mesh=mesh, seed=3)
        state = t.init_state(batches[0])
        losses = []
        for b in batches:
            state, m = t.train_step(state, b)
            losses.append(float(m["loss"]))
        return losses

    dense = run("dense", None)
    sparse_mesh = run("sparse", make_mesh())
    np.testing.assert_allclose(sparse_mesh, dense, rtol=1e-4)


@pytest.mark.parametrize("scan", [1, 2])
def test_fit_profiler_window_writes_trace(world, tmp_path, scan):
    """fit(profile_dir=...) must open the trace at the start step, close it
    at the stop step, and write an xplane capture — including under
    chunked dispatch where n_batches jumps past the exact indices (the >=
    windowing; the trace must also not restart after it stopped)."""
    import glob as _glob
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=64, shuffle=False, take_batches=6)
    t = Trainer(model, learning_rate=1e-3, seed=7)
    out = t.fit(ds, epochs=1, verbose=False, scan_steps=scan,
                profile_dir=str(tmp_path), profile_steps=(2, 4))
    assert out["history"], "fit did not complete"
    assert _glob.glob(os.path.join(str(tmp_path), "**", "*.xplane.pb"),
                      recursive=True), "no xplane capture written"


@pytest.mark.slow
def test_split_update_under_mesh(world):
    """table_update='split' must be exact under a dp mesh (the multi-chip
    production path): rows gather OUTSIDE the differentiated step from the
    dp-sharded batch, tables stay replicated, and the sparse_set strategy's
    sorted-unique scatter-SET with out-of-bounds-dropped padding must
    survive GSPMD partitioning — forced here because the demo tables'
    cost model picks dense."""
    conf, schema, paths, model = world
    assert model.row_injection
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=3)
    batches = list(ds)

    def run(mode, mesh, force=None):
        t = Trainer(model, learning_rate=1e-3, table_update=mode,
                    mesh=mesh, seed=3)
        state = t.init_state(batches[0])
        if force:
            assert t._split_dims, "split plan did not engage"
            t._split_dims = {d: force for d in t._split_dims}
        losses = []
        for b in batches:
            state, m = t.train_step(state, b)
            losses.append(float(m["loss"]))
        return losses

    dense = run("dense", None)
    np.testing.assert_allclose(run("split", make_mesh()), dense, rtol=1e-4)
    np.testing.assert_allclose(run("split", make_mesh(), force="sparse_set"),
                               dense, rtol=1e-4)


BIG_TABLE_CONF = """
Features:
  feature_group: {}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    u_hist,str,user,hashing,131072,32,sum,true
    a_id,str,ad,hashing,131072,32,sum,true
    label,float,label,numeric,null,-1,null,true

Variables:
  seeds: [2022, 2023]
  max_len_map:
    u_hist: 8

Networks:
  class: recommendflow_tpu.models.matching.dssm.Dssm
  loss: recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss
  embedding_dim: 32
  tower_units: [32]

Task:
  task: big_table_test
  dayno: 20260818
"""


@pytest.mark.slow
def test_sparse_update_composes_with_sharded_tables(tmp_path):
    """table_update='sparse' + shard_tables=True (VERDICT r1 item 2): the
    touched-row Adagrad must run on row-sharded tables under the mesh,
    matching the dense unsharded trajectory exactly."""
    from jax.sharding import PartitionSpec as P
    conf_path = tmp_path / "big.yaml"
    conf_path.write_text(BIG_TABLE_CONF)
    conf = Configuration(str(conf_path))
    paths = generate_records(conf, str(tmp_path / "rec"), num_rows=512,
                             num_files=1, seed=3)
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    batches = list(Dataset(schema, paths, batch_size=128, shuffle=False,
                           take_batches=3))

    def run(mode, mesh, shard):
        t = Trainer(model, learning_rate=1e-3, table_update=mode,
                    mesh=mesh, shard_tables=shard, seed=3)
        state = t.init_state(batches[0])
        if mode == "sparse":
            assert t._sparse_dims, "sparse path must engage under sharding"
        if shard:
            table = state.params["embedder"]["table_dim32"]
            assert table.sharding.spec == P("dp", None), (
                "big table must be row-sharded")
            for acc in state.table_acc.values():
                assert acc.sharding.spec == P("dp", None), (
                    "sparse accumulator must shard with its table")
        losses = []
        for b in batches:
            state, m = t.train_step(state, b)
            losses.append(float(m["loss"]))
        return losses, jax.device_get(state.params)

    dense_losses, dense_params = run("dense", None, False)
    sharded_losses, sharded_params = run("sparse", make_mesh(), True)
    np.testing.assert_allclose(sharded_losses, dense_losses, rtol=1e-4)
    table_d = dense_params["embedder"]["table_dim32"]
    table_s = sharded_params["embedder"]["table_dim32"]
    np.testing.assert_allclose(table_s, table_d, rtol=2e-4, atol=2e-5)


def test_sparse_mode_checkpoint_roundtrip(world, tmp_path):
    """table_acc (the sparse-path Adagrad accumulators on TrainState) must
    survive a checkpoint save/restore and keep training identically."""
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=2)
    batches = list(ds)
    trainer = Trainer(model, learning_rate=1e-3, table_update="sparse", seed=5)
    state = trainer.init_state(batches[0])
    for b in batches:
        state, _ = trainer.train_step(state, b)
    from recommendflow_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint)
    root = str(tmp_path / "sparse_ckpt")
    save_checkpoint(root, state, step=0)
    restored = restore_checkpoint(root, trainer.init_state(batches[0]))
    for k in state.table_acc:
        np.testing.assert_allclose(np.asarray(restored.table_acc[k]),
                                   np.asarray(state.table_acc[k]))
    # one more step from each must agree
    s1, m1 = trainer.train_step(state, batches[0])
    s2, m2 = trainer.train_step(restored, batches[0])
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)


def test_graceful_preemption_checkpoints_and_resumes(world, tmp_path):
    """A preempt signal mid-epoch must finish the in-flight step, save a
    step-stamped checkpoint, exit fit() cleanly — and a fresh fit() from
    that checkpoint resumes mid-epoch at the right batch."""
    import os
    import signal

    from recommendflow_tpu.train.checkpoint import (
        latest_step, restore_checkpoint)
    from recommendflow_tpu.train.trainer import install_preemption_handler

    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=6)
    trainer = Trainer(model, learning_rate=1e-3, seed=9)
    install_preemption_handler(trainer)
    pdir = str(tmp_path / "preempt")

    class KillAfter(Dataset.__mro__[-1]):  # simple iterable wrapper
        def __init__(self, inner, n, trainer):
            self.inner, self.n, self.trainer = inner, n, trainer

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for i, b in enumerate(self.inner):
                if i == self.n:
                    os.kill(os.getpid(), signal.SIGTERM)  # handler sets flags
                yield b

    result = trainer.fit(KillAfter(ds, 3, trainer), epochs=2,
                         preempt_dir=pdir)
    saved = latest_step(pdir)
    # the prefetch thread runs ahead of the consumer, so the signal lands
    # somewhere in [1, 4) consumed steps — what matters is a step-stamped
    # checkpoint exists and matches the returned state
    assert saved is not None and 1 <= saved <= 4, saved
    assert int(result["state"].step) == saved

    # resume: a fresh trainer picks up mid-epoch and finishes both epochs
    trainer2 = Trainer(model, learning_rate=1e-3, seed=9)
    restored = restore_checkpoint(pdir, trainer2.init_state(next(iter(ds))))
    done = trainer2.fit(ds, epochs=2, state=restored)
    assert int(done["state"].step) == 12           # 2 epochs x 6 batches


def test_preemption_skips_validation_and_epoch_callbacks(world, tmp_path):
    """A spot-VM grace window is seconds: once preempt is flagged, fit()
    must checkpoint immediately — no validation pass, no epoch-end
    callbacks — before exiting (regression: review finding, trainer.py)."""
    import os
    import signal

    from recommendflow_tpu.train.checkpoint import latest_step
    from recommendflow_tpu.train.trainer import install_preemption_handler

    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=6)
    trainer = Trainer(model, learning_rate=1e-3, seed=9)
    install_preemption_handler(trainer)
    pdir = str(tmp_path / "preempt")

    class PoisonedValid:
        """Any iteration after preempt == the bug we are guarding against."""
        def __iter__(self):
            raise AssertionError("validation ran during preemption")

        def __len__(self):
            return 1

    class KillAfter:
        def __init__(self, inner, n):
            self.inner, self.n = inner, n

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for i, b in enumerate(self.inner):
                if i == self.n:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    epoch_ends = []

    class SpyCallback:
        def on_train_begin(self, trainer):
            pass

        def on_epoch_end(self, trainer, state, epoch, logs):
            epoch_ends.append(epoch)

        def on_train_end(self, trainer, state, logs):
            pass

    result = trainer.fit(KillAfter(ds, 2), epochs=2,
                         valid_ds=PoisonedValid(),
                         callbacks=[SpyCallback()], preempt_dir=pdir)
    assert latest_step(pdir) == int(result["state"].step)
    assert epoch_ends == []          # no epoch-end work before the save


def test_fit_reusable_after_early_stop(world):
    """A second fit() on the same Trainer after an early stop (or handled
    preemption) must actually train — the control flags reset at fit start
    (regression test for a review finding)."""
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=3)
    trainer = Trainer(model, learning_rate=1e-3, seed=3)
    r1 = trainer.fit(ds, epochs=1)
    step1 = int(r1["state"].step)       # read BEFORE fit donates the buffers
    trainer.control["stop"] = True      # what EarlyStopping leaves behind
    trainer.control["preempt"] = True   # what a handled signal leaves behind
    r2 = trainer.fit(ds, epochs=2, state=r1["state"])  # continue: epoch 2/2
    assert int(r2["state"].step) == step1 + 3


def test_auto_mode_maximizes_all_quality_metrics(tmp_path):
    """ModelCheckpoint/ReduceLROnPlateau auto-mode must maximize mrr/ndcg/
    recall monitors like EarlyStopping does — a narrower copy of the rule
    once inverted best-model selection (regression test for a review
    finding)."""
    from recommendflow_tpu.train.callbacks import (
        EarlyStopping, ModelCheckpoint, ReduceLROnPlateau)

    for monitor in ("val_mrr@10", "val_ndcg@50", "val_recall@100",
                    "val_auc", "val_hit@5"):
        assert ModelCheckpoint(str(tmp_path), monitor=monitor).mode == "max"
        assert ReduceLROnPlateau(monitor=monitor).mode == "max"
        assert EarlyStopping(monitor=monitor).mode == "max"
    assert ModelCheckpoint(str(tmp_path), monitor="val_loss").mode == "min"


def test_logq_correction_end_to_end(world, demo_conf_path):
    """Networks.logq_feature turns on the sampled-softmax bias correction:
    the 'freq' collection threads through train steps (step counter
    advances, intervals fill in) and the corrected loss differs from the
    uncorrected run while still training (BEYOND the reference, Yi et al.
    2019)."""
    conf = Configuration(demo_conf_path)
    conf.networks["logq_feature"] = "item_id"
    conf.networks["logq_buckets"] = 4096
    _, schema, paths, _ = world
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [32]})
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=4)
    trainer = Trainer(model, learning_rate=1e-3, seed=1)
    state = trainer.init_state(trainer._put(next(iter(ds))))
    assert "freq" in state.extra_vars
    losses = []
    for b in ds:
        state, metrics = trainer.train_step(state, b)
        losses.append(float(metrics["loss"]))
    assert int(state.extra_vars["freq"]["step"]) == 4
    assert float(jnp.sum(state.extra_vars["freq"]["state"]["interval"])) > 0
    assert all(np.isfinite(l) for l in losses)

    # the stream state checkpoints with everything else
    import tempfile

    from recommendflow_tpu.train.checkpoint import restore_pytree, save_pytree
    with tempfile.TemporaryDirectory() as td:
        save_pytree(td + "/s", state)
        restored = restore_pytree(td + "/s", state)
    assert int(restored.extra_vars["freq"]["step"]) == 4

    # uncorrected baseline on the same data differs (the correction is live)
    base_model, _ = build_network(Configuration(demo_conf_path).networks["class"],
                                  {"conf": Configuration(demo_conf_path),
                                   "tower_units": [32]})
    bt = Trainer(base_model, learning_rate=1e-3, seed=1)
    bs = bt.init_state(bt._put(next(iter(ds))))
    base_losses = []
    for b in ds:
        bs, m = bt.train_step(bs, b)
        base_losses.append(float(m["loss"]))
    assert not np.allclose(losses[1:], base_losses[1:], rtol=1e-3)


def test_lr_schedule_warmup_cosine(world):
    """Trainer(lr_schedule=...) drives the dense LR per step: warmup ramps
    up from 0, cosine decays after (BEYOND the reference's fixed LR)."""
    conf, schema, paths, model = world
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=6)
    trainer = Trainer(model, learning_rate=1e-2,
                      lr_schedule={"type": "cosine", "warmup_steps": 3,
                                   "decay_steps": 10, "min_ratio": 0.1},
                      seed=4)
    state = trainer.init_state(trainer._put(next(iter(ds))))
    lrs = []
    for b in ds:
        state, m = trainer.train_step(state, b)
        lrs.append(current_learning_rate(state))
        assert np.isfinite(float(m["loss"]))
    # warmup: strictly increasing over the first steps
    assert lrs[0] < lrs[1] < lrs[2]
    assert max(lrs) <= 1e-2 + 1e-9
    # decay engaged after warmup
    assert lrs[-1] < max(lrs)

def test_promotion_gate_zero_baseline():
    """old==0 must not map changes to an inf sentinel: a strict
    improvement from 0 passes open 'inf)' upper bounds and a regression
    from 0 is blocked (the sign used to be lost)."""
    constraints = {"auc": "[-0.05, inf)"}
    changes = model_online_monitor({"auc": 0.0}, {"auc": 0.5}, constraints)
    assert changes["auc"] > 0
    with pytest.raises(PromotionBlocked, match="auc"):
        model_online_monitor({"auc": 0.0}, {"auc": -0.5}, constraints)


def test_early_stopping_resets_between_fits():
    """A reused EarlyStopping/Plateau callback must not carry exhausted
    patience or a stale best_state into the next fit() (on_train_begin
    resets, like the trainer resets control['stop'])."""
    es = EarlyStopping(monitor="val_auc", patience=1)
    es.wait, es.best, es.best_state = 5, 0.99, {"stale": True}
    es.on_train_begin(trainer=None)
    assert es.wait == 0 and es.best_state is None and es.best == -np.inf
    pl = ReduceLROnPlateau(monitor="val_auc", patience=1)
    pl.wait, pl.best = 5, 0.99
    pl.on_train_begin(trainer=None)
    assert pl.wait == 0 and pl.best == -np.inf
