"""Pretrained BERT checkpoint import — oracle-verified against the image's
torch/transformers BERT (capability parity: bert4keras
build_transformer_model + BertEncoder weight-loading modes,
/root/reference/backend/encoder/bert_encoder.py:254-281, blocks/bert.py:11-33).

The oracle: a tiny randomly-initialized HuggingFace BertModel. Its state
dict is (a) loaded directly through the torch reader and (b) written into a
Google-TF-format checkpoint (`bert_model.ckpt` variable naming — the format
bert4keras consumes) and loaded through the TF reader; both must produce
embeddings equal to the torch forward pass.
"""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from recommendflow_tpu.encoder.pretrained import (  # noqa: E402
    bert_encoder_kwargs, bert_params_to_flax, graft_params,
    load_bert_checkpoint, load_pretrained_text_encoder)

TINY = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=48, type_vocab_size=2,
            hidden_act="gelu", layer_norm_eps=1e-12,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """(config.json path, torch .bin path, eval-mode BertModel)."""
    root = tmp_path_factory.mktemp("bert")
    cfg_path = os.path.join(root, "bert_config.json")
    with open(cfg_path, "w") as f:
        json.dump(TINY, f)
    torch.manual_seed(0)
    model = transformers.BertModel(transformers.BertConfig(**TINY))
    model.eval()
    bin_path = os.path.join(root, "pytorch_model.bin")
    torch.save(model.state_dict(), bin_path)
    return str(cfg_path), str(bin_path), model


def _inputs(batch=3, length=10, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, TINY["vocab_size"], size=(batch, length))
    ids[:, 0] = 2                   # CLS-ish
    ids[0, 7:] = 0                  # padding (id 0 masks in both frameworks)
    ids[1, 9:] = 0
    seg = np.zeros_like(ids)
    seg[:, length // 2:] = 1
    seg[ids == 0] = 0
    return ids.astype(np.int32), seg.astype(np.int32)


def _torch_hidden(model, ids, seg):
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids.astype(np.int64)),
                    token_type_ids=torch.tensor(seg.astype(np.int64)),
                    attention_mask=torch.tensor((ids > 0).astype(np.int64)),
                    output_hidden_states=True)
    # hidden_states[0] is the embedding output; [k+1] is block k's output
    return [h.numpy() for h in out.hidden_states]


def _encode(cfg_path, ckpt_path, ids, seg, **overrides):
    model, variables = load_pretrained_text_encoder(
        cfg_path, ckpt_path, **overrides)
    return np.asarray(model.apply(variables, ids, seg))


class TestTorchOracle:
    def test_cls_position_matches(self, oracle):
        cfg, ckpt, model = oracle
        ids, seg = _inputs()
        ours = _encode(cfg, ckpt, ids, seg, pooling="pos", pool_pos=0)
        ref = _torch_hidden(model, ids, seg)[-1][:, 0]
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_out_layer_selection(self, oracle):
        cfg, ckpt, model = oracle
        ids, seg = _inputs()
        ours = _encode(cfg, ckpt, ids, seg, pooling="pos", pool_pos=0,
                       out_layer=0)
        ref = _torch_hidden(model, ids, seg)[1][:, 0]   # block 0's output
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_masked_avg_pooling_matches(self, oracle):
        cfg, ckpt, model = oracle
        ids, seg = _inputs()
        ours = _encode(cfg, ckpt, ids, seg, pooling="avg")
        h = _torch_hidden(model, ids, seg)[-1]
        m = (ids > 0)[..., None]
        ref = (h * m).sum(1) / m.sum(1)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_positional_table_clipping(self, oracle):
        cfg, ckpt, _ = oracle
        model, variables = load_pretrained_text_encoder(cfg, ckpt, max_len=16)
        assert model.max_len == 16
        assert variables["params"]["pos_emb"].shape == (16, TINY["hidden_size"])
        kwargs = bert_encoder_kwargs(cfg)
        assert kwargs["max_len"] == TINY["max_position_embeddings"]
        assert kwargs["ffn_activation"] == "gelu_exact"
        assert kwargs["ln_epsilon"] == 1e-12


def test_safetensors_checkpoint_loads(oracle, tmp_path):
    """The HF safetensors format loads identically to the .bin state dict."""
    st = pytest.importorskip("safetensors.torch")
    cfg, bin_path, model = oracle
    path = str(tmp_path / "model.safetensors")
    st.save_file(model.state_dict(), path)
    import jax
    kw = dict(num_layers=TINY["num_hidden_layers"], max_len=48,
              num_heads=TINY["num_attention_heads"])
    p_bin = bert_params_to_flax(load_bert_checkpoint(bin_path), **kw)
    p_st = bert_params_to_flax(load_bert_checkpoint(path), **kw)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
                 p_bin, p_st)


def _google_name(canonical: str) -> str:
    g = "bert/" + canonical
    if "LayerNorm" in canonical:
        g = g.replace("/scale", "/gamma").replace("/bias", "/beta")
    return g


class TestTFCheckpointFormat:
    @pytest.fixture(scope="class")
    def tf_ckpt(self, oracle, tmp_path_factory):
        """Write the oracle's weights as a Google-TF `bert_model.ckpt`."""
        tf = pytest.importorskip("tensorflow")
        cfg, bin_path, _ = oracle
        weights = load_bert_checkpoint(bin_path)   # canonical (flax layout)
        prefix = str(tmp_path_factory.mktemp("tfckpt") / "bert_model.ckpt")
        g = tf.Graph()
        with g.as_default():
            for key, val in sorted(weights.items()):
                if key.startswith("pooler/"):
                    continue
                tf.compat.v1.get_variable(
                    _google_name(key), initializer=tf.constant(val))
            saver = tf.compat.v1.train.Saver()
            with tf.compat.v1.Session(graph=g) as sess:
                sess.run(tf.compat.v1.global_variables_initializer())
                saver.save(sess, prefix)
        return prefix

    def test_tf_and_torch_readers_agree(self, oracle, tf_ckpt):
        cfg, bin_path, _ = oracle
        kw = dict(num_layers=TINY["num_hidden_layers"], max_len=48,
                  num_heads=TINY["num_attention_heads"])
        p_torch = bert_params_to_flax(load_bert_checkpoint(bin_path), **kw)
        p_tf = bert_params_to_flax(load_bert_checkpoint(tf_ckpt), **kw)
        import jax
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                     p_torch, p_tf)

    def test_tf_checkpoint_matches_torch_forward(self, oracle, tf_ckpt):
        cfg, _, model = oracle
        ids, seg = _inputs(seed=2)
        ours = _encode(cfg, tf_ckpt, ids, seg, pooling="pos", pool_pos=0)
        ref = _torch_hidden(model, ids, seg)[-1][:, 0]
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def _write_vocab(path, n=TINY["vocab_size"]):
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    toks += [f"tok{i}" for i in range(n - len(toks))]
    with open(path, "w") as f:
        f.write("\n".join(toks))
    return str(path)


class TestServiceModes:
    def test_from_pretrained_base(self, oracle, tmp_path):
        from recommendflow_tpu.encoder.text_encoder import TextEncoderService
        cfg, ckpt, model = oracle
        vocab = _write_vocab(tmp_path / "vocab.txt")
        svc = TextEncoderService.from_pretrained(
            cfg, ckpt, vocab, max_len=16, pool_pos=0, batch_size=4)
        embs = svc.encode(["tok5 tok6", "tok7"], normalize=False)
        assert embs.shape == (2, TINY["hidden_size"])
        # oracle the same tokenized batch through torch
        tok, seg = svc.tokenizer.encode_batch(["tok5 tok6", "tok7"], 16)
        ref = _torch_hidden(model, np.asarray(tok), np.asarray(seg))[-1][:, 0]
        np.testing.assert_allclose(embs, ref, atol=1e-4)

    def test_pool_pos_and_out_layer_validation(self, oracle, tmp_path):
        from recommendflow_tpu.encoder.text_encoder import TextEncoderService
        cfg, ckpt, _ = oracle
        vocab = _write_vocab(tmp_path / "vocab.txt")
        with pytest.raises(ValueError, match="pool_pos not support"):
            TextEncoderService.from_pretrained(cfg, ckpt, vocab,
                                               pool_pos="first")
        with pytest.raises(ValueError, match="pool_pos scalar"):
            TextEncoderService.from_pretrained(cfg, ckpt, vocab, pool_pos=999)
        with pytest.raises(ValueError, match="out_layer"):
            TextEncoderService.from_pretrained(cfg, ckpt, vocab, out_layer=7)
        with pytest.raises(ValueError, match="model_weights_path"):
            TextEncoderService.from_pretrained(cfg, ckpt, vocab,
                                               model_name="cosent")
        with pytest.raises(ValueError, match="unsupported model_name"):
            TextEncoderService.from_pretrained(cfg, ckpt, vocab,
                                               model_name="interact",
                                               model_weights_path="x")

    def test_cosent_mode_loads_finetuned_weights(self, oracle, tmp_path):
        """'cosent'/'sbert' modes: pretrained init + finetuned-weights
        overlay (bert_encoder.py:267-281 parity)."""
        import jax
        from recommendflow_tpu.encoder.text_encoder import TextEncoderService
        cfg, ckpt, _ = oracle
        vocab = _write_vocab(tmp_path / "vocab.txt")
        base = TextEncoderService.from_pretrained(cfg, ckpt, vocab, max_len=16)
        # simulate finetuning: perturb every param, save
        base.variables = jax.tree.map(lambda x: x + 0.01, base.variables)
        save_dir = str(tmp_path / "finetuned")
        base.save(save_dir)
        tuned = TextEncoderService.from_pretrained(
            cfg, ckpt, vocab, model_name="cosent",
            model_weights_path=save_dir, max_len=16)
        a = tuned.encode(["tok9 tok10"], normalize=False)
        b = base.encode(["tok9 tok10"], normalize=False)
        np.testing.assert_allclose(a, b, atol=1e-5)
        fresh = TextEncoderService.from_pretrained(cfg, ckpt, vocab, max_len=16)
        assert np.abs(a - fresh.encode(["tok9 tok10"],
                                       normalize=False)).max() > 1e-4


class TestModelGraft:
    def test_trainer_grafts_pretrained_encoder(self, oracle, tmp_path):
        """Networks.pretrained wiring: SiameseEncoder init under the Trainer
        picks up converted checkpoint weights (dssm_bert.py bert_conf
        parity)."""
        import jax.numpy as jnp

        from recommendflow_tpu.config.configuration import Configuration
        from recommendflow_tpu.models.matching.siamese_encoder import (
            SiameseEncoder)
        from recommendflow_tpu.train.trainer import Trainer
        cfg, ckpt, _ = oracle
        vocab = _write_vocab(tmp_path / "vocab.txt")
        conf_text = f"""
Features:
  feature_group: {{}}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    q_text,str,user,bert_encode,$bert_vocab,-1,cls,true
    d_text,str,ad,bert_encode,$bert_vocab,-1,cls,true
    label,float,label,numeric,null,-1,null,true

Variables:
  vocabs:
    bert_vocab: {vocab}
  max_len_map:
    q_text: 12
    d_text: 12

Networks:
  class: recommendflow_tpu.models.matching.siamese_encoder.SiameseEncoder
  loss: recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss
  embedding_dim: 16
  pretrained:
    encoder:
      config_path: {cfg}
      checkpoint_path: {ckpt}

Task:
  task: graft_test
  dayno: 20260818
"""
        path = tmp_path / "conf.yaml"
        path.write_text(conf_text)
        conf = Configuration(str(path))
        model = SiameseEncoder(conf)
        batch = {
            "q_text": jnp.ones((4, 12), jnp.int32),
            "d_text": jnp.ones((4, 12), jnp.int32),
            "label": jnp.ones((4,), jnp.float32),
        }
        trainer = Trainer(model, learning_rate=1e-3)
        state = trainer.init_state(batch)
        expected = load_bert_checkpoint(ckpt)
        got = np.asarray(
            state.params["encoder"]["tok_emb"]["embedding"])
        np.testing.assert_allclose(
            got, expected["embeddings/word_embeddings"], atol=1e-6)
        # shape-mismatch graft must fail loudly
        with pytest.raises((ValueError, KeyError)):
            graft_params(dict(state.params), "nonexistent_module", {})


def test_finetune_from_pretrained_end_to_end(oracle, tmp_path):
    """Full loop: Networks.pretrained -> Trainer.fit on planted text data ->
    the grafted encoder actually trains (params move off the checkpoint) and
    the loss falls (reference workflow: finetune a bert_conf model)."""
    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.config.configuration import Configuration
    from recommendflow_tpu.data.pipeline import Dataset
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.data.synthetic import generate_records
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer

    cfg, ckpt, _ = oracle
    vocab = _write_vocab(tmp_path / "vocab.txt")
    conf_text = f"""
Features:
  feature_group: {{}}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    q_text,str,user,bert_encode,$bert_vocab,-1,cls,true
    d_text,str,ad,bert_encode,$bert_vocab,-1,cls,true
    label,float,label,numeric,null,-1,null,true

Variables:
  vocabs:
    bert_vocab: {vocab}
  max_len_map:
    q_text: 16
    d_text: 16

Networks:
  class: recommendflow_tpu.models.matching.siamese_encoder.SiameseEncoder
  loss: recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss
  embedding_dim: 16
  text_pooling: avg
  pretrained:
    encoder:
      config_path: {cfg}
      checkpoint_path: {ckpt}

Task:
  task: finetune_e2e
  dayno: 20260819
"""
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(conf_text)
    conf = Configuration(str(conf_path))
    paths = generate_records(conf, str(tmp_path / "rec"), num_rows=512,
                             num_files=1, seed=9)
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    train = Dataset(schema, paths, batch_size=64, shuffle=True, seed=0)
    trainer = Trainer(model, learning_rate=1e-3)
    state0 = trainer.init_state(next(iter(train)))
    tok0 = np.asarray(state0.params["encoder"]["tok_emb"]["embedding"]).copy()
    pretrained_tok = load_bert_checkpoint(ckpt)["embeddings/word_embeddings"]
    np.testing.assert_allclose(tok0, pretrained_tok, atol=1e-6)

    result = trainer.fit(train, epochs=2, state=state0, resume_data=False)
    hist = result["history"]
    assert hist[-1]["loss"] < hist[0]["loss"]      # it trains
    tok1 = np.asarray(result["state"].params["encoder"]["tok_emb"]["embedding"])
    assert np.abs(tok1 - pretrained_tok).max() > 1e-5  # params moved

    # predict contract intact after finetune
    out = trainer.predict(result["state"],
                          Dataset(schema, paths, batch_size=64,
                                  shuffle=False, take_batches=2))
    assert {"user", "ad", "label"} <= set(out)
