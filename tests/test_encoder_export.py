"""Tokenizer, text-encoder service, export roundtrip, flash attention."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recommendflow_tpu.encoder import TextEncoderService, Tokenizer, build_demo_vocab


@pytest.fixture(scope="module")
def tokenizer():
    vocab = build_demo_vocab(["hello", "world", "deep", "learning", "rank"])
    return Tokenizer(vocab)


def test_tokenizer_basic(tokenizer):
    ids, segs = tokenizer.encode("hello world", maxlen=16)
    assert ids[0] == tokenizer.cls_id and ids[-1] == tokenizer.sep_id
    assert all(s == 0 for s in segs)
    # pair encoding with second segment
    ids2, segs2 = tokenizer.encode("hello", "world", maxlen=16)
    assert segs2[-1] == 1 and ids2.count(tokenizer.sep_id) == 2
    # unknown word falls back to wordpieces/UNK, never crashes
    ids3, _ = tokenizer.encode("xyzzyq", maxlen=8)
    assert len(ids3) <= 8


def test_tokenizer_batch_shapes(tokenizer):
    tok, seg = tokenizer.encode_batch(["hello", "deep learning", ""], maxlen=10)
    assert tok.shape == (3, 10) and seg.shape == (3, 10)
    assert tok.dtype == np.int32
    assert (tok[2] == tokenizer.pad_id).sum() == 8  # only CLS/SEP for empty


def test_tokenizer_truncation(tokenizer):
    long = "hello " * 50
    ids, _ = tokenizer.encode(long, maxlen=12)
    assert len(ids) == 12


@pytest.mark.slow
def test_encoder_service_cache_and_whitening(tokenizer, tmp_path):
    service = TextEncoderService(tokenizer, max_len=12, batch_size=4,
                                 model_dim=32, num_layers=1, num_heads=2,
                                 ffn_hidden=64, use_whitening=False)
    texts = ["hello world", "deep learning", "hello world", "rank"]
    emb = service.encode(texts)
    assert emb.shape == (4, 32)
    np.testing.assert_allclose(emb[0], emb[2], rtol=1e-6)  # cache-identical
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # second call hits cache entirely
    emb2 = service.encode(texts[:2])
    np.testing.assert_allclose(emb2, emb[:2], rtol=1e-6)
    # persistence
    d = str(tmp_path / "enc")
    service.save(d)
    service2 = TextEncoderService(tokenizer, max_len=12, batch_size=4,
                                  model_dim=32, num_layers=1, num_heads=2,
                                  ffn_hidden=64).load_weights(d)
    emb3 = service2.encode(texts[:2])
    np.testing.assert_allclose(emb3, emb[:2], rtol=1e-5, atol=1e-6)


def test_export_roundtrip(demo_conf_path, tmp_path):
    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.export import ServingModel, export_model
    from recommendflow_tpu.models.base import build_network
    from __graft_entry__ import _synthetic_batch

    conf = Configuration(demo_conf_path)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [16]})
    schema = compile_schema(conf.features)
    batch = _synthetic_batch(schema, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()},
                           training=False)
    path = export_model(model, variables, batch, str(tmp_path / "model"))
    assert path.endswith(".rfx") and os.path.exists(path)

    serving = ServingModel.load(path)
    got = serving.predict(batch)
    want = model.apply(variables, {k: jnp.asarray(v) for k, v in batch.items()},
                       training=False)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6)
    # wrong shape -> clear error
    bad = dict(batch)
    bad["user_id"] = batch["user_id"][:4]
    with pytest.raises(ValueError, match="shape"):
        serving.predict(bad)
    # missing input -> clear error
    bad2 = {k: v for k, v in batch.items() if k != "label"}
    with pytest.raises(KeyError, match="missing"):
        serving.predict(bad2)


@pytest.mark.slow
def test_savedmodel_export_serves_under_pure_tf(demo_conf_path, tmp_path):
    """jax2tf SavedModel export (VERDICT r1 item 5): the artifact must
    predict in a subprocess that imports ONLY TensorFlow — no JAX — and its
    outputs must equal the .rfx (StableHLO) export's."""
    import json
    import subprocess
    import sys

    pytest.importorskip("tensorflow")
    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.export import (
        ServingModel, export_model, export_savedmodel, load_frozen_pb)
    from recommendflow_tpu.models.base import build_network
    from __graft_entry__ import _synthetic_batch

    conf = Configuration(demo_conf_path)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [16]})
    schema = compile_schema(conf.features)
    batch = _synthetic_batch(schema, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()},
                           training=False)
    sm_dir = str(tmp_path / "savedmodel")
    pb_path = str(tmp_path / "frozen.pb")
    export_savedmodel(model, variables, batch, sm_dir, frozen_pb=pb_path)
    rfx = export_model(model, variables, batch, str(tmp_path / "model"))
    rfx_out = {k: np.asarray(v)
               for k, v in ServingModel.load(rfx).predict(batch).items()}

    # pure-TF serving: subprocess with jax forbidden
    np.savez(tmp_path / "batch.npz", **{k: np.asarray(v)
                                        for k, v in batch.items()})
    script = f"""
import sys
sys.modules["jax"] = None  # any jax import -> immediate crash
import json
import numpy as np
import tensorflow as tf
loaded = tf.saved_model.load({sm_dir!r})
keys = open({sm_dir!r} + "/rfx_inputs.txt").read().splitlines()
data = np.load({str(tmp_path / 'batch.npz')!r})
out = loaded.predict(*[tf.convert_to_tensor(data[k]) for k in keys])
np.savez({str(tmp_path / 'tf_out.npz')!r}, **{{k: np.asarray(v) for k, v in out.items()}})
print("PURE_TF_OK")
"""
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0 and "PURE_TF_OK" in res.stdout, (
        res.stdout + res.stderr)[-3000:]
    tf_out = np.load(tmp_path / "tf_out.npz")
    assert set(tf_out.files) == set(rfx_out)
    for k in rfx_out:
        np.testing.assert_allclose(tf_out[k], rfx_out[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)

    # frozen GraphDef re-import (freeze_keras_model2pb parity): the
    # .outputs.txt sidecar names the outputs, so predict returns a dict
    keys = sorted(batch.keys())
    predict = load_frozen_pb(pb_path, [k + ":0" for k in keys])
    pb_out = predict([batch[k] for k in keys])
    assert set(pb_out) == set(rfx_out), (sorted(pb_out), sorted(rfx_out))
    for k in rfx_out:
        np.testing.assert_allclose(pb_out[k], rfx_out[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_export_bakes_label_constants(demo_conf_path, tmp_path):
    """Serving artifacts must not require label tensors (review finding:
    synthetic_batch includes label columns, so a naive export baked 'label'
    into the serving signature and every real request 400'd). The CLI
    passes label columns as zeroed constants; echoes are dropped."""
    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.export import ServingModel, export_model
    from recommendflow_tpu.models.base import build_network
    from __graft_entry__ import _synthetic_batch

    conf = Configuration(demo_conf_path)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [16]})
    schema = compile_schema(conf.features)
    batch = _synthetic_batch(schema, 8)
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()},
                           training=False)
    label_keys = [k for k in schema.label_names if k in batch]
    assert label_keys, "demo schema must have a label column for this test"
    serve = {k: v for k, v in batch.items() if k not in label_keys}
    consts = {k: np.zeros_like(batch[k]) for k in label_keys}
    path = export_model(model, variables, serve, str(tmp_path / "m"),
                        constants=consts)
    serving = ServingModel.load(path)
    assert not (set(serving.batch_keys) & set(label_keys))
    out = serving.predict(serve)                 # no label tensor supplied
    assert "user" in out and not (set(out) & set(label_keys))


def test_flash_attention_matches_reference():
    from recommendflow_tpu.ops.attention import scaled_dot_product_attention
    from recommendflow_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, 50, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 50, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, 50, 32).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, 50) > 0.3)
    ref = scaled_dot_product_attention(q, k, v, mask[:, None, :])
    got = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_embedding_kernels_interpret():
    from recommendflow_tpu.ops.pallas.embedding_bag import (
        _combine_duplicates, gather_rows, scatter_add_rows,
    )
    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.randn(500, 128).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 500, 300).astype(np.int32))
    got = gather_rows(table, ids, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6)
    uids = jnp.asarray(rng.permutation(500)[:200].astype(np.int32))
    grads = jnp.asarray(rng.randn(200, 128).astype(np.float32))
    out = scatter_add_rows(uids, grads, jnp.zeros_like(table), interpret=True)
    ref = np.zeros((500, 128), np.float32)
    np.add.at(ref, np.asarray(uids), np.asarray(grads))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)
    # duplicate combining preserves total mass; n_uniq bounds the valid head
    u, s, n_uniq = _combine_duplicates(ids, jnp.ones((300, 128)))
    assert float(s.sum()) == pytest.approx(300 * 128)
    assert int(n_uniq) == len(set(np.asarray(ids).tolist()))
    assert np.abs(np.asarray(s[int(n_uniq):])).sum() == 0.0
    # n_valid-limited scatter skips padded tail entries entirely
    out2 = scatter_add_rows(u, s, jnp.zeros((500, 128)), n_valid=n_uniq,
                            interpret=True)
    ref3 = np.zeros((500, 128), np.float32)
    np.add.at(ref3, np.asarray(ids), 1.0)
    np.testing.assert_allclose(np.asarray(out2), ref3, rtol=1e-5)


def test_sdpa_pallas_seam_rank3_and_rank4():
    from recommendflow_tpu.ops.attention import scaled_dot_product_attention
    rng = np.random.RandomState(7)
    # rank-3 (SelfAttention/ESIM shapes)
    q3 = jnp.asarray(rng.randn(2, 40, 32).astype(np.float32))
    m3 = jnp.asarray(rng.rand(2, 40) > 0.3)
    ref = scaled_dot_product_attention(q3, q3, q3, m3)
    # interpret-mode flash under the seam: monkey-free, the seam itself pads
    import recommendflow_tpu.ops.pallas.flash_attention as fa
    orig = fa.flash_attention
    fa.flash_attention = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        got = scaled_dot_product_attention(q3, q3, q3, m3, use_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        # full attention mask -> clear error
        with pytest.raises(ValueError, match="key masks"):
            scaled_dot_product_attention(
                jnp.zeros((2, 2, 8, 16)), jnp.zeros((2, 2, 8, 16)),
                jnp.zeros((2, 2, 8, 16)), jnp.zeros((2, 2, 8, 8), bool),
                use_pallas=True)
    finally:
        fa.flash_attention = orig


def test_pallas_table_update_matches_rowwise_adagrad():
    """The Pallas streaming update must reproduce the jnp rowwise-Adagrad
    numerics exactly (same op order, f32 compute), including the padded
    final block when rows % block_rows != 0."""
    from recommendflow_tpu.ops.pallas.table_update import rowwise_adagrad_update
    from recommendflow_tpu.train.optimizers import rowwise_adagrad

    rng = np.random.RandomState(7)
    for dtype, rtol, atol in ((np.float32, 1e-5, 1e-6),
                              # the jnp path double-rounds (update to bf16,
                              # then p+update in bf16); the kernel rounds the
                              # f32 result once — allow ~1 bf16 ulp
                              (jnp.bfloat16, 2e-2, 2e-3)):
        p = jnp.asarray(rng.randn(300, 128), dtype)       # 300 % 128 != 0
        g = jnp.asarray(rng.randn(300, 128) * 1e-2, dtype)
        acc = jnp.asarray(rng.rand(300, 1).astype(np.float32) + 0.1)

        tx = rowwise_adagrad(learning_rate=0.05)
        state = tx.init({"t": p})._replace(accumulator={"t": acc})
        updates, state = tx.update({"t": g}, state, {"t": p})
        ref_p = p + updates["t"]
        ref_acc = state.accumulator["t"]

        got_p, got_acc = rowwise_adagrad_update(p, acc, g, lr=0.05,
                                                block_rows=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got_acc), np.asarray(ref_acc),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got_p, np.float32), np.asarray(ref_p, np.float32),
            rtol=rtol, atol=atol)


def test_native_wordpiece_matches_python():
    """The C++ WordPiece fast path must be bit-identical to the Python
    tokenizer over ASCII edge cases (punctuation runs, case folding,
    over-long words -> [UNK], truncation) with non-ASCII texts routed to
    Python inside the same batch."""
    from recommendflow_tpu import native
    from recommendflow_tpu.encoder.tokenizer import Tokenizer
    if not native.available():
        pytest.skip("native library unavailable")
    import os
    vocab_path = os.path.join(os.path.dirname(__file__), "..", "conf",
                              "demo_vocab.txt")
    tok = Tokenizer(vocab_path)
    assert tok._native_handle is not None
    rng = np.random.default_rng(3)
    words = [w for w in tok.vocab if w.isalpha()][:300]
    texts = []
    for i in range(400):
        t = " ".join(rng.choice(words, int(rng.integers(1, 14))))
        if i % 5 == 0:
            t = t.upper() + "!?,();"
        if i % 7 == 0:
            t += " " + "x" * int(rng.integers(90, 130))   # > max_wordpiece_len
        if i % 9 == 0:
            t += " 北京 café"                              # non-ascii row
        texts.append(t)
    got_t, got_s = tok.encode_batch(texts, 24)

    tok_py = Tokenizer(vocab_path)
    tok_py._native_handle_cached = None                    # force python path
    ref_t, ref_s = tok_py.encode_batch(texts, 24)
    np.testing.assert_array_equal(got_t, ref_t)
    np.testing.assert_array_equal(got_s, ref_s)


def test_tokenizer_batch_rejects_tiny_maxlen(tokenizer):
    """maxlen < 2 can't hold [CLS]+[SEP]; the native C path would write past
    the row (heap corruption) — must fail loudly host-side instead
    (regression: review finding, native.py/tokenizer.py)."""
    import pytest as _pytest
    with _pytest.raises(ValueError, match="maxlen"):
        tokenizer.encode_batch(["hello"], maxlen=1)


def test_encoder_cache_eviction_mid_call(tokenizer):
    """Requests larger than the cache (or evicting entries the same call
    still needs) must not crash or corrupt results (regression test for a
    review finding)."""
    service = TextEncoderService(tokenizer, max_len=12, batch_size=4,
                                 model_dim=32, num_layers=1, num_heads=2,
                                 ffn_hidden=64, cache_size=2)
    texts = [f"word{i}" for i in range(6)]
    emb = service.encode(texts + texts[:1])        # 7 requests, cache of 2
    assert emb.shape == (7, 32)
    np.testing.assert_allclose(emb[6], emb[0], rtol=1e-6)
    # warm entry + cold batch that evicts it, same call
    warm = service.encode(["warm"])
    mixed = service.encode(["cold_a", "cold_b", "warm", "cold_c"])
    np.testing.assert_allclose(mixed[2], warm[0], rtol=1e-5)
    # empty input returns an empty [0, D] matrix, not a crash
    assert service.encode([]).shape == (0, 32)


def test_encoder_load_weights_invalidates_cache(tokenizer, tmp_path):
    """Embeddings cached under old weights must not leak into results after
    load_weights (regression test for a review finding)."""
    svc = TextEncoderService(tokenizer, max_len=12, batch_size=4,
                             model_dim=32, num_layers=1, num_heads=2,
                             ffn_hidden=64, seed=0)
    trained = TextEncoderService(tokenizer, max_len=12, batch_size=4,
                                 model_dim=32, num_layers=1, num_heads=2,
                                 ffn_hidden=64, seed=99)
    d = str(tmp_path / "w")
    trained.save(d)
    before = svc.encode(["hello"])
    svc.load_weights(d)
    after = svc.encode(["hello"])
    np.testing.assert_allclose(after, trained.encode(["hello"]), rtol=1e-5)
    assert not np.allclose(after, before, rtol=1e-3)
