"""Loss zoo tests: golden values vs naive numpy implementations of the
reference formulas, plus multi-chip (shard_map) == single-chip equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from recommendflow_tpu.losses import classify as C
from recommendflow_tpu.losses import match as M


def _rand_embeddings(b=16, d=8, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, d).astype(np.float32)
    dvec = rng.randn(b, d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dvec /= np.linalg.norm(dvec, axis=1, keepdims=True)
    y = (rng.rand(b) > 0.4).astype(np.float32)
    return y, q, dvec


# ------------------------------------------------------------- closed forms
def test_mse_and_bce():
    y, q, d = _rand_embeddings()
    pred = np.sum(q * d, axis=1)
    np.testing.assert_allclose(M.mean_squared_error(y, q, d),
                               np.mean((y - pred) ** 2), rtol=1e-5)


def test_cosent_golden():
    """Naive O(B^2) loop mirror of match_losses.py:42-56."""
    y, q, d = _rand_embeddings(b=12)
    scale = 20.0
    pred = np.sum(q * d, axis=1) * scale
    terms = [0.0]  # the +1 inside log
    for i in range(len(y)):
        for j in range(len(y)):
            if y[i] < y[j]:
                terms.append(pred[i] - pred[j])
    golden = np.log(np.sum(np.exp(np.array(terms))))
    got = float(M.cosent_loss(y, q, d, scale))
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_cosent_v2_ignores_satisfied_pairs():
    y = np.array([0.0, 1.0], np.float32)
    # pair (0,1): label order satisfied iff pred0 < pred1
    q = np.array([[1, 0], [1, 0]], np.float32)
    d_good = np.array([[0.1, 0], [0.9, 0]], np.float32)   # pred = 0.1 < 0.9 ok
    d_bad = np.array([[0.9, 0], [0.1, 0]], np.float32)    # violated
    good = float(M.cosent_loss_v2(y, q, d_good))
    bad = float(M.cosent_loss_v2(y, q, d_bad))
    assert good == pytest.approx(0.0, abs=1e-5)  # log(1+0)
    assert bad > 1.0


def test_scaled_multiclass_ce_golden():
    """Mirror of match_losses.py:149-165 (softmax over s*cos rows)."""
    y, q, d = _rand_embeddings(b=10)
    s = 20.0
    scores = s * (q @ d.T)
    num = np.diag(np.exp(scores))
    den = np.sum(np.exp(scores), axis=-1)
    golden = np.mean(-np.log(num / den) * y)
    got = float(M.batch_neg_sample_scaled_multi_class_ce_loss(y, q, d, scale=s))
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_margin_rank_golden():
    y, q, d = _rand_embeddings(b=10)
    m = 0.1
    scores = q @ d.T
    golden = 0.0
    for i in range(10):
        for j in range(10):
            if j != i:  # the positive column is not a negative
                golden += max(0.0, -(scores[i, i] - scores[i, j]) + m) * y[i]
    got = float(M.batch_neg_sample_margin_rank_loss(y, q, d, margin=m))
    np.testing.assert_allclose(got, golden, rtol=1e-4)
    # a perfectly ranked batch scores exactly 0 (no constant margin floor)
    qq = np.eye(4, 8, dtype=np.float32)
    perfect = float(M.batch_neg_sample_margin_rank_loss(
        np.ones(4, np.float32), qq, qq, margin=m))
    assert perfect == 0.0


def test_hard_neg_margin_golden():
    y, q, d = _rand_embeddings(b=10)
    m = 0.1
    scores = q @ d.T
    golden = 0.0
    for i in range(10):
        neg = np.delete(scores[i], i).max()
        golden += max(0.0, -(scores[i, i] - neg) + m) * y[i]
    got = float(M.batch_hard_neg_sample_margin_rank_loss(y, q, d, margin=m))
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_aux_label_cosent_matches_subset_gather():
    """Masked static-shape impl == explicit subset gather (reference style)."""
    rng = np.random.RandomState(3)
    b = 14
    y = (rng.rand(b) > 0.5).astype(np.float32)
    aux = rng.rand(b).astype(np.float32)
    q = rng.randn(b, 6).astype(np.float32)
    d = rng.randn(b, 6).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = float(M.pos_aux_label_cosent_loss(y, aux, q, d))
    pos = y == 1
    golden = float(M.cosent_loss_v2(aux[pos], q[pos], d[pos]))
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_spc_soft_runs_and_reduces_to_ce_when_no_pseudo():
    y, q, d = _rand_embeddings(b=8)
    loss_fn = M.batch_softmax_probabilistic_combining_soft(batch_size=8, miu=-2.0)
    # miu=-2 means pos_score<miu never true -> no pseudo positives ->
    # plain (unscaled) in-batch softmax CE
    got = float(loss_fn(y, q, d))
    scores = q @ d.T
    golden = np.mean(-(np.diag(scores) - np.log(np.sum(np.exp(scores), -1))) * y)
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_zipped_adapters():
    y, q, d = _rand_embeddings(b=6)
    inter = np.empty((12, 8), np.float32)
    inter[0::2] = q * 3.0   # un-normalized on purpose; adapter must L2-norm
    inter[1::2] = d * 5.0
    got = float(M.zipped_cosent_loss(y, inter))
    ref = float(M.cosent_loss(y, q, d))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


# ------------------------------------------------------------ classification
def test_multilabel_ce_golden():
    """Mirror of classify_losses.py:8-23 with explicit concat+logsumexp."""
    rng = np.random.RandomState(0)
    y = (rng.rand(4, 6) > 0.6).astype(np.float32)
    logits = rng.randn(4, 6).astype(np.float32)
    yp = (1 - 2 * y) * logits
    neg = np.where(y > 0, -1e12, yp)
    pos = np.where(y > 0, yp, -1e12)
    z = np.zeros((4, 1))

    def lse(x):
        m = x.max(-1, keepdims=True)
        return (m + np.log(np.sum(np.exp(x - m), -1, keepdims=True)))[:, 0]
    golden = lse(np.concatenate([neg, z], -1)) + lse(np.concatenate([pos, z], -1))
    got = np.asarray(C.multilabel_categorical_crossentropy(y, logits))
    np.testing.assert_allclose(got, golden, rtol=1e-4)


def test_sparse_multilabel_ce_consistency():
    """Sparse form == dense form on equivalent labels."""
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 8).astype(np.float32)
    pos_ids = np.array([[1, 4], [0, 7], [2, 3]])
    dense = np.zeros((3, 8), np.float32)
    for i, row in enumerate(pos_ids):
        dense[i, row] = 1.0
    sparse = np.asarray(C.sparse_multilabel_categorical_crossentropy(pos_ids, logits))
    dense_loss = np.asarray(C.multilabel_categorical_crossentropy(dense, logits))
    np.testing.assert_allclose(sparse, dense_loss, rtol=1e-3, atol=1e-3)


def test_focal_losses():
    y = np.array([1.0, 0.0, 1.0], np.float32)
    p = np.array([0.9, 0.1, 0.3], np.float32)
    got = float(C.binary_focal_loss(y, p, gamma=2.0, alpha=0.25))
    a_t = y * 0.25 + (1 - y) * 0.75
    p_t = y * p + (1 - y) * (1 - p) + 1e-7
    golden = np.mean(-a_t * (1 - p_t) ** 2 * np.log(p_t))
    np.testing.assert_allclose(got, golden, rtol=1e-4)

    focal = C.categorical_focal_loss(gamma=2.0, alpha=1.0)
    yt = np.eye(3, dtype=np.float32)
    yp = np.full((3, 3), 1 / 3, np.float32)
    out = np.asarray(focal(yt, yp))
    assert out.shape == (3,) and (out > 0).all()


def test_ghm_loss_state_threading():
    ghm = C.categorical_ghm_loss(bins=10, momentum=0.5)
    state = ghm.init_state()
    y = np.eye(4, dtype=np.float32)
    p = np.full((4, 4), 0.25, np.float32)
    mask = np.ones(4, np.float32)
    loss, state1 = ghm(y, p, mask, state)
    assert loss.shape == (4,) and np.isfinite(np.asarray(loss)).all()
    _, state2 = ghm(y, p, mask, state1)
    assert not np.allclose(np.asarray(state1), np.asarray(state2))


# ------------------------------------------------- global-batch equivalence
@pytest.mark.parametrize("loss_name", [
    "batch_neg_sample_ce_loss",
    "batch_neg_sample_scaled_multi_class_ce_loss",
    "batch_neg_sample_symmetrical_ce_loss",
    "batch_neg_sample_symmetrical_scaled_multi_class_ce_loss",
    "batch_neg_sample_margin_rank_loss",
    "batch_hard_neg_sample_margin_rank_loss",
])
def test_sharded_loss_equals_global(loss_name):
    """shard_map over 8 fake devices with all-gathered negatives must equal
    the single-device loss on the full batch — the parity contract for
    multi-host in-batch negatives (SURVEY §5 'distributed backend')."""
    ndev = len(jax.devices())
    assert ndev == 8, f"conftest should give 8 cpu devices, got {ndev}"
    y, q, d = _rand_embeddings(b=32, d=8, seed=42)
    loss = getattr(M, loss_name)
    global_val = float(loss(y, q, d))

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    sharded = shard_map(
        lambda yy, qq, dd: loss(yy, qq, dd, axis_name="dp"),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P(),
    )
    got = float(jax.jit(sharded)(y, q, d))
    np.testing.assert_allclose(got, global_val, rtol=2e-4, atol=2e-5)


def test_weighted_cosent_pair_semantics():
    """Uniform weights == plain cosent (up to the constant log w terms
    cancel... they don't cancel; w=1 -> logw=0 -> identical); a violated
    pair's contribution scales with its pair weight."""
    y, q, d = _rand_embeddings(b=8, seed=11)
    from recommendflow_tpu.losses.weighted import weighted_cosent_loss
    base = float(M.cosent_loss(y, q, d))
    uniform = float(weighted_cosent_loss(y, q, d, np.ones(8, np.float32)))
    np.testing.assert_allclose(uniform, base, rtol=1e-5)
    # upweighting samples increases the loss (heavier violated pairs)
    heavy = float(weighted_cosent_loss(y, q, d, np.full(8, 3.0, np.float32)))
    assert heavy > uniform


# ----------------------------------------------------- logQ bias correction
def test_logq_corrected_softmax_closed_form():
    """logq subtracts log p(item) from every column's logits (Yi et al.
    2019 sampled-softmax correction) — verify against a manual softmax."""
    y, q, d = _rand_embeddings(b=8, seed=21)
    logq = np.log(np.linspace(0.01, 0.3, 8)).astype(np.float32)
    s = 20.0
    logits = s * (q @ d.T) - logq[None, :]
    lp = logits - np.log(np.exp(logits - logits.max(1, keepdims=True))
                         .sum(1, keepdims=True)) - logits.max(1, keepdims=True)
    golden = float(np.mean(-np.diag(lp) * y))
    got = float(M.batch_neg_sample_scaled_multi_class_ce_loss(
        y, q, d, scale=s, logq=logq))
    np.testing.assert_allclose(got, golden, rtol=1e-4)
    # logq=None unchanged
    base = float(M.batch_neg_sample_scaled_multi_class_ce_loss(y, q, d))
    assert not np.isclose(got, base)


def test_logq_sharded_equals_single():
    y, q, d = _rand_embeddings(b=32, d=8, seed=22)
    logq = np.log(np.linspace(0.01, 0.3, 32)).astype(np.float32)
    for loss in (M.batch_neg_sample_scaled_multi_class_ce_loss,
                 M.batch_neg_sample_symmetrical_scaled_multi_class_ce_loss):
        global_val = float(loss(y, q, d, logq=logq))
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        sharded = shard_map(
            lambda yy, qq, dd, ll: loss(yy, qq, dd, axis_name="dp", logq=ll),
            mesh=mesh, in_specs=(P("dp"),) * 4, out_specs=P())
        got = float(jax.jit(sharded)(y, q, d, logq))
        np.testing.assert_allclose(got, global_val, rtol=2e-4, atol=2e-5)


def test_freq_estimator_tracks_item_rates():
    """Items occurring every k steps converge to interval≈k, i.e.
    log q ≈ -log k (train/freq.py, Yi et al. Algorithm 1)."""
    import jax.numpy as jnp

    from recommendflow_tpu.train.freq import freq_init, freq_update, log_q
    state = freq_init(64)
    # item 1 every step, item 2 every 4 steps, item 3 every 8 steps
    for step in range(1, 65):
        ids = [1]
        if step % 4 == 0:
            ids.append(2)
        if step % 8 == 0:
            ids.append(3)
        state = freq_update(state, jnp.asarray(ids, jnp.int32), step,
                            alpha=0.3)
    lq = np.asarray(log_q(state, jnp.asarray([1, 2, 3, 9], jnp.int32)))
    np.testing.assert_allclose(lq[0], np.log(1.0), atol=0.05)
    np.testing.assert_allclose(lq[1], -np.log(4.0), atol=0.1)
    np.testing.assert_allclose(lq[2], -np.log(8.0), atol=0.15)
    assert lq[3] < -10  # never-seen item: floor probability


def test_ghm_invalid_rows_contribute_zero():
    """valid_mask=0 rows must produce 0 loss (regression: review finding —
    they previously got full unweighted CE from padding garbage)."""
    ghm = C.categorical_ghm_loss(bins=10, momentum=0.5)
    state = ghm.init_state()
    y = np.eye(4, dtype=np.float32)
    p = np.full((4, 4), 0.25, np.float32)
    mask = np.array([1, 1, 0, 0], np.float32)
    loss, _ = ghm(y, p, mask, state)
    loss = np.asarray(loss)
    assert (loss[:2] > 0).all() and (loss[2:] == 0).all()


def test_weighted_losses_usable_without_weights():
    """The weighted family must work as a plain Networks.loss (models call
    loss(y, q, d)); weights default to uniform (regression: review
    finding)."""
    from recommendflow_tpu.losses.weighted import (
        weighted_binary_cross_entropy, weighted_cosent_loss,
        weighted_mean_squared_error)
    y, q, d = _rand_embeddings(b=6)
    for fn in (weighted_mean_squared_error, weighted_binary_cross_entropy,
               weighted_cosent_loss):
        v = float(fn(y, q, d))
        assert np.isfinite(v)
    base = float(M.cosent_loss(y, q, d))
    np.testing.assert_allclose(float(weighted_cosent_loss(y, q, d)), base,
                               rtol=1e-4)
