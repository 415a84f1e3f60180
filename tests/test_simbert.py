"""SimBERT capability: UniLM seq2seq masking on TextEncoder + the
similar-pair batch generator + the combined training objective
(parity surface: backend/utils/generator.py:136-178 SimbertDataGenerator
feeding a bert4keras UniLM model)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from recommendflow_tpu.encoder import Tokenizer, build_demo_vocab
from recommendflow_tpu.encoder.generators import simbert_batches
from recommendflow_tpu.encoder.simbert import (simbert_loss,
                                               simbert_similarity_loss,
                                               unilm_lm_loss)
from recommendflow_tpu.ops.transformer import TextEncoder

WORDS = ["red", "blue", "green", "cat", "dog", "bird", "fast", "slow"]


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(build_demo_vocab(WORDS))


def _model(max_len=16):
    return TextEncoder(vocab_size=64, num_layers=2, model_dim=32,
                       num_heads=2, ffn_hidden=64, max_len=max_len,
                       dropout=0.0, pos_type="learned")


def test_unilm_mask_causality():
    """With seq2seq=True, position i's hidden state must depend only on
    segment-0 tokens and segment-1 tokens at positions <= i."""
    m = _model()
    ids = jnp.array([[2, 5, 6, 3, 7, 8, 9, 3]], jnp.int32)  # [CLS] a b [SEP] x y z [SEP]
    seg = jnp.array([[0, 0, 0, 0, 1, 1, 1, 1]], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids, seg)
    h1 = m.apply(v, ids, seg, seq2seq=True, return_sequence=True)
    ids2 = ids.at[0, 6].set(12)  # change a late segment-1 token
    h2 = m.apply(v, ids2, seg, seq2seq=True, return_sequence=True)
    # positions before 6 (incl. ALL of segment 0) are unaffected
    np.testing.assert_allclose(np.asarray(h1[0, :6]), np.asarray(h2[0, :6]),
                               rtol=1e-5, atol=1e-5)
    # position 6 itself sees the change
    assert np.abs(np.asarray(h1[0, 6]) - np.asarray(h2[0, 6])).max() > 1e-4


def test_unilm_mask_vs_bidirectional():
    """Without seq2seq, a late-token change DOES propagate backward (sanity
    that the previous test's invariance comes from the mask)."""
    m = _model()
    ids = jnp.array([[2, 5, 6, 3, 7, 8, 9, 3]], jnp.int32)
    seg = jnp.array([[0, 0, 0, 0, 1, 1, 1, 1]], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), ids, seg)
    h1 = m.apply(v, ids, seg, return_sequence=True)
    h2 = m.apply(v, ids.at[0, 6].set(12), seg, return_sequence=True)
    assert np.abs(np.asarray(h1[0, :6]) - np.asarray(h2[0, :6])).max() > 1e-4


def test_simbert_batches_layout(tok):
    pairs = [("red cat", "blue cat"), ("fast dog", "slow dog"),
             ("green bird", "red bird"), ("bad",)]  # malformed entry skipped
    batches = list(simbert_batches(pairs, tok, batch_size=4, max_len=8,
                                   shuffle=False))
    assert len(batches) == 1  # 3 good pairs -> 1 full batch of 2 pairs
    b = batches[0]
    assert b["tok"].shape == (4, 16) and b["seg"].shape == (4, 16)
    # rows 2i / 2i+1 are the two orders of one pair: row0 = t1->t2 means
    # row1's segment-0 text equals row0's segment-1 text
    for r in range(0, 4, 2):
        t_a, s_a = b["tok"][r], b["seg"][r]
        t_b, s_b = b["tok"][r + 1], b["seg"][r + 1]
        # strip [CLS]/[SEP]/pad: compare the content ids of a's segment-1
        # with b's segment-0 (minus specials 2=[CLS],3=[SEP],0=pad)
        def content(t, s, segment):
            return [x for x, g in zip(t.tolist(), s.tolist())
                    if g == segment and x not in (0, tok.cls_id, tok.sep_id)]
        assert content(t_a, s_a, 1) == content(t_b, s_b, 0)
        assert content(t_a, s_a, 0) == content(t_b, s_b, 1)
    # real segment ids: some 0s then some 1s
    assert (b["seg"] == 1).any() and (b["seg"] == 0).any()


def test_simbert_loss_trains(tok):
    """A few Adam steps on one batch must reduce the combined objective
    (the does-it-learn bar for the seq2seq path)."""
    pairs = [("red cat", "blue cat"), ("fast dog", "slow dog"),
             ("green bird", "red bird"), ("red fast", "blue fast")]
    batch = next(simbert_batches(pairs, tok, batch_size=8, max_len=8,
                                 shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    m = TextEncoder(vocab_size=len(tok.vocab), num_layers=2, model_dim=32,
                    num_heads=2, ffn_hidden=64, max_len=16, dropout=0.0,
                    pos_type="learned")
    variables = m.init(jax.random.PRNGKey(0), batch["tok"], batch["seg"])
    opt = optax.adam(3e-3)
    opt_state = opt.init(variables)

    @jax.jit
    def step(variables, opt_state):
        def lf(v):
            loss, aux = simbert_loss(m, v, batch, training=False)
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(variables)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss, aux

    variables, opt_state, first, aux0 = step(variables, opt_state)
    for _ in range(30):
        variables, opt_state, loss, aux = step(variables, opt_state)
    assert float(loss) < float(first) * 0.7, (float(first), float(loss))
    assert float(aux["lm_loss"]) < float(aux0["lm_loss"])
    assert float(aux["sim_loss"]) < float(aux0["sim_loss"])


def test_similarity_loss_prefers_partner_structure():
    """Pairs embedded identically (partner rows equal) score a lower loss
    than random vectors."""
    rng = np.random.RandomState(0)
    base = rng.randn(4, 16).astype(np.float32)
    paired = jnp.asarray(np.repeat(base, 2, axis=0))  # rows 2i == 2i+1
    rand = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    assert float(simbert_similarity_loss(paired)) < \
        float(simbert_similarity_loss(rand))


def test_unilm_lm_loss_masks_segment0():
    """Only segment-1 targets contribute: zeroing out segment-0 token
    contents must not change the loss."""
    rng = np.random.RandomState(1)
    hidden = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
    emb = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    tokb = jnp.asarray(rng.randint(4, 32, size=(2, 8)), jnp.int32)
    seg = jnp.asarray([[0, 0, 0, 1, 1, 1, 0, 0]] * 2, jnp.int32)
    l1 = unilm_lm_loss(hidden, emb, tokb, seg)
    tok2 = jnp.where(seg == 0, 5, tokb)  # rewrite every segment-0 token
    l2 = unilm_lm_loss(hidden, emb, tok2, seg)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)

def test_similarity_cls_blind_to_target_sentence(tok):
    """The similarity vectors must encode ONLY the source sentence: under
    the UniLM mask hidden[:, 0] (what simbert_loss uses) is invariant to
    segment-1 edits — a bidirectional pass over the concatenated pair
    would leak the target into [CLS] and make the in-batch objective
    trivially satisfiable by content matching."""
    pairs = [("red cat", "blue cat"), ("fast dog", "slow dog")]
    batch = next(simbert_batches(pairs, tok, batch_size=4, max_len=8,
                                 shuffle=False))
    ids, seg = jnp.asarray(batch["tok"]), jnp.asarray(batch["seg"])
    m = TextEncoder(vocab_size=len(tok.vocab), num_layers=2, model_dim=32,
                    num_heads=2, ffn_hidden=64, max_len=16, dropout=0.0,
                    pos_type="learned")
    v = m.init(jax.random.PRNGKey(0), ids, seg)
    h1 = m.apply(v, ids, seg, seq2seq=True, return_sequence=True)
    # mutate a segment-1 token of row 0
    pos = int(np.argmax(np.asarray(seg[0]) == 1))
    ids2 = ids.at[0, pos].set((int(ids[0, pos]) % (len(tok.vocab) - 5)) + 5)
    h2 = m.apply(v, ids2, seg, seq2seq=True, return_sequence=True)
    np.testing.assert_allclose(np.asarray(h1[0, 0]), np.asarray(h2[0, 0]),
                               atol=1e-6)
    # and it DOES depend on the source sentence
    ids3 = ids.at[0, 1].set((int(ids[0, 1]) % (len(tok.vocab) - 5)) + 5)
    h3 = m.apply(v, ids3, seg, seq2seq=True, return_sequence=True)
    assert np.abs(np.asarray(h1[0, 0]) - np.asarray(h3[0, 0])).max() > 1e-4
