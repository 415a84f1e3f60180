"""Matching / retrieval losses: the in-batch negative-sampling family.

Pure jnp functions with the reference contract `loss(y_true, query, doc) ->
scalar` (backend/lossess/match_losses.py:7-249). query/doc are L2-normalized
tower embeddings [B, D]; y_true is [B].

Multi-chip: every in-batch loss accepts `axis_name`. When set (inside
pjit/shard_map over a data-parallel mesh axis), doc embeddings and labels are
all-gathered over that axis so the negative pool is the GLOBAL batch and the
positive diagonal is offset by the shard index — the sharded equivalent of
the reference's single-host q·dᵀ softmax (match_losses.py:149-189). Gradients
flow through the all-gather (XLA differentiates it as reduce-scatter), so
doc-tower grads from remote negatives arrive correctly.

Numerics: logsumexp-based forms throughout (the reference's raw exp() forms
overflow in bf16/f32 at scale=20); masked -1e9 instead of -1e12 to stay
finite in float32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK = -1e9


def _gather_negatives(query, doc, axis_name: Optional[str]):
    """Return (doc_all [Bg, D], pos_idx [B]) for the global batch. Labels
    are NOT gathered — every loss weights by its local shard's y_true, so a
    label all-gather would be a wasted per-step collective."""
    b = query.shape[0]
    if axis_name is None:
        return doc, jnp.arange(b)
    doc_all = jax.lax.all_gather(doc, axis_name, axis=0, tiled=True)
    shard = jax.lax.axis_index(axis_name)
    return doc_all, shard * b + jnp.arange(b)


def _mean_over_axis(value, axis_name: Optional[str]):
    return jax.lax.pmean(value, axis_name) if axis_name is not None else value


# ------------------------------------------------------------ pointwise
def mean_squared_error(y_true, query, doc):
    """MSE on dot(query, doc) (parity: match_losses.py:7-12)."""
    pred = jnp.sum(query * doc, axis=1)
    return jnp.mean((y_true - pred) ** 2)


def binary_cross_entropy(y_true, query, doc, from_logits: bool = False):
    """BCE on dot(query, doc) (parity: match_losses.py:15-20)."""
    pred = jnp.sum(query * doc, axis=1)
    if from_logits:
        return jnp.mean(jnp.maximum(pred, 0) - pred * y_true +
                        jnp.log1p(jnp.exp(-jnp.abs(pred))))
    eps = 1e-7
    pred = jnp.clip(pred, eps, 1 - eps)
    return jnp.mean(-(y_true * jnp.log(pred) + (1 - y_true) * jnp.log(1 - pred)))


# --------------------------------------------------------------- CoSENT
def cosent_loss_from_scores(y_true, y_pred, scale: float = 20.0):
    """CoSENT on precomputed cosine scores: log(1 + Σ_{(i,j): t_i<t_j}
    exp(s·(cos_i − cos_j))) (parity: match_losses.py:24-38)."""
    order = (y_true[:, None] < y_true[None, :]).astype(y_pred.dtype)
    diff = (y_pred[:, None] - y_pred[None, :]) * scale
    logits = jnp.where(order > 0, diff, MASK).reshape(-1)
    logits = jnp.concatenate([jnp.zeros((1,), y_pred.dtype), logits])
    return jax.nn.logsumexp(logits)


def cosent_loss(y_true, query, doc, scale: float = 20.0):
    """CoSENT on cos(query, doc) (parity: match_losses.py:42-56)."""
    return cosent_loss_from_scores(y_true, jnp.sum(query * doc, axis=1), scale)


def cosent_loss_v2(y_true, query, doc, scale: float = 20.0):
    """CoSENT dropping already-satisfied pairs (diff<=0 masked), so correctly
    ordered pairs contribute zero loss (parity: match_losses.py:59-69)."""
    pred = jnp.sum(query * doc, axis=1)
    order = (y_true[:, None] < y_true[None, :]).astype(pred.dtype)
    diff = (pred[:, None] - pred[None, :]) * scale
    logits = jnp.where((order > 0) & (diff > 0), diff, MASK).reshape(-1)
    logits = jnp.concatenate([jnp.zeros((1,), pred.dtype), logits])
    return jax.nn.logsumexp(logits)


def _masked_cosent_v2(aux_true, pred, member, scale):
    """cosent_v2 over the subset `member` (bool [B]) via pair masking —
    static-shape replacement for the reference's tf.gather subsetting
    (match_losses.py:90-93); mathematically identical because non-member
    pairs are -inf-masked out of the logsumexp."""
    pair_ok = member[:, None] & member[None, :]
    order = (aux_true[:, None] < aux_true[None, :])
    diff = (pred[:, None] - pred[None, :]) * scale
    logits = jnp.where(pair_ok & order & (diff > 0), diff, MASK).reshape(-1)
    logits = jnp.concatenate([jnp.zeros((1,), pred.dtype), logits])
    return jax.nn.logsumexp(logits)


def aux_label_cosent_loss(y_true, aux_true, query, doc,
                          scale: float = 20.0, alpha: float = 0.5):
    """CoSENT on an auxiliary business label (bid/ecpm), computed separately
    over positives and negatives then mixed (parity: match_losses.py:72-94)."""
    pred = jnp.sum(query * doc, axis=1)
    pos = _masked_cosent_v2(aux_true, pred, y_true == 1, scale)
    neg = _masked_cosent_v2(aux_true, pred, y_true == 0, scale)
    return (1 - alpha) * pos + alpha * neg


def pos_aux_label_cosent_loss(y_true, aux_true, query, doc, scale: float = 20.0):
    """Aux-label CoSENT over positives only (parity: match_losses.py:97-115)."""
    pred = jnp.sum(query * doc, axis=1)
    return _masked_cosent_v2(aux_true, pred, y_true == 1, scale)


# ------------------------------------------- in-batch negative sampling
def batch_neg_sample_ce_loss(y_true, query, doc, axis_name: Optional[str] = None):
    """Softmax CE of each query against the (global) batch of docs, weighted
    by y_true (parity intent: match_losses.py:118-130 — scores as logits)."""
    doc_all, pos = _gather_negatives(query, doc, axis_name)
    logits = query @ doc_all.T
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, pos[:, None], axis=1)[:, 0] * y_true
    return _mean_over_axis(jnp.mean(loss), axis_name)


def _column_lse(logits, axis_name: Optional[str]):
    """logsumexp over the (global) query axis of [B, Bg] logits -> [Bg].

    With data parallelism each shard holds only its local B query rows, so
    the doc->query softmax denominator is assembled with a pmax/psum pair —
    the sharded equivalent of log_softmax(axis=0) on the global matrix.
    """
    col_max = jnp.max(logits, axis=0)
    if axis_name is not None:
        col_max = jax.lax.pmax(col_max, axis_name)
    sums = jnp.sum(jnp.exp(logits - col_max[None, :]), axis=0)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    return col_max + jnp.log(sums)


def batch_neg_sample_symmetrical_ce_loss(y_true, query, doc,
                                         axis_name: Optional[str] = None):
    """Symmetric (query->doc and doc->query) in-batch CE
    (parity: match_losses.py:133-146)."""
    doc_all, pos = _gather_negatives(query, doc, axis_name)
    logits = query @ doc_all.T                       # [B, Bg]
    lp_q = jax.nn.log_softmax(logits, axis=-1)
    picked_q = jnp.take_along_axis(lp_q, pos[:, None], 1)[:, 0]
    pos_logit = jnp.take_along_axis(logits, pos[:, None], 1)[:, 0]
    picked_d = pos_logit - _column_lse(logits, axis_name)[pos]
    loss = -0.5 * (picked_q + picked_d) * y_true
    return _mean_over_axis(jnp.mean(loss), axis_name)


def _logq_correct(logits, logq, axis_name: Optional[str]):
    """Sampled-softmax bias correction (Yi et al. 2019): in-batch negatives
    are sampled ∝ item frequency, so subtract log p(item) from every
    column's logits. logq [B] is the LOCAL shard's docs' log-probabilities
    (train/freq.py:log_q); gathered to the global column axis under dp."""
    if logq is None:
        return logits
    lq = jax.lax.all_gather(logq, axis_name, axis=0, tiled=True) \
        if axis_name is not None else logq
    return logits - lq[None, :]


def batch_neg_sample_scaled_multi_class_ce_loss(y_true, query, doc,
                                                scale: float = 20.0,
                                                axis_name: Optional[str] = None,
                                                logq=None):
    """Que2Search scaled in-batch softmax: loss_i = −log softmax(s·cos)_ii,
    weighted by y_true to allow 0-labeled hot negatives
    (parity: match_losses.py:149-165). `logq` enables the sampling-bias
    correction (BEYOND the reference; see _logq_correct/train/freq.py)."""
    doc_all, pos = _gather_negatives(query, doc, axis_name)
    logits = _logq_correct(scale * (query @ doc_all.T), logq, axis_name)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, pos[:, None], 1)[:, 0] * y_true
    return _mean_over_axis(jnp.mean(loss), axis_name)


def batch_neg_sample_symmetrical_scaled_multi_class_ce_loss(
        y_true, query, doc, scale: float = 20.0,
        axis_name: Optional[str] = None, logq=None):
    """Symmetric Que2Search loss (docstring formula of match_losses.py:168-189;
    the reference body double-scales by s² — we implement the stated formula)."""
    doc_all, pos = _gather_negatives(query, doc, axis_name)
    logits = _logq_correct(scale * (query @ doc_all.T), logq, axis_name)
    lp_q = jax.nn.log_softmax(logits, axis=-1)
    picked_q = jnp.take_along_axis(lp_q, pos[:, None], 1)[:, 0]
    pos_logit = jnp.take_along_axis(logits, pos[:, None], 1)[:, 0]
    picked_d = pos_logit - _column_lse(logits, axis_name)[pos]
    loss = -0.5 * (picked_q + picked_d) * y_true
    return _mean_over_axis(jnp.mean(loss), axis_name)


def batch_neg_sample_margin_rank_loss(y_true, query, doc, margin: float = 0.1,
                                      axis_name: Optional[str] = None):
    """Margin ranking against every in-batch negative:
    Σ_j max(0, −(cos_ii − cos_ij) + margin) · y_i
    (parity: match_losses.py:192-205; sum-reduced like the reference)."""
    doc_all, pos = _gather_negatives(query, doc, axis_name)
    scores = query @ doc_all.T
    pos_score = jnp.take_along_axis(scores, pos[:, None], 1)
    viol = jnp.clip(-(pos_score - scores) + margin, 0.0, None)
    # the positive column is not a negative: without masking it every
    # positive row adds a constant `margin`, so a perfectly ranked batch
    # reports margin * num_pos instead of 0 (the hard-neg sibling below
    # always masked it)
    viol = viol * (1.0 - jax.nn.one_hot(pos, scores.shape[1],
                                        dtype=viol.dtype))
    loss = jnp.sum(viol * y_true[:, None])
    return jax.lax.psum(loss, axis_name) if axis_name else loss


def batch_hard_neg_sample_margin_rank_loss(y_true, query, doc,
                                           margin: float = 0.1,
                                           axis_name: Optional[str] = None):
    """Hardest-in-batch negative margin loss (Que2Search stage-2;
    parity: match_losses.py:208-226). Requires a warm model."""
    doc_all, pos = _gather_negatives(query, doc, axis_name)
    scores = jnp.asarray(query @ doc_all.T)
    pos_score = jnp.take_along_axis(scores, pos[:, None], 1)[:, 0]
    is_pos_col = jax.nn.one_hot(pos, scores.shape[1], dtype=bool)
    hard_neg = jnp.max(jnp.where(is_pos_col, MASK, scores), axis=-1)
    loss = jnp.sum(jnp.clip(-(pos_score - hard_neg) + margin, 0.0, None) * y_true)
    return jax.lax.psum(loss, axis_name) if axis_name else loss


def batch_softmax_probabilistic_combining_soft(batch_size: int, miu: float = 0.6):
    """Soft pseudo-positive probabilistic combining (parity:
    match_losses.py:229-249): off-diagonal cosines that exceed ξ=1/batch while
    the true positive is weak (pos<μ) are counted as extra positives."""
    xi = 1.0 / batch_size

    def loss_fn(y_true, query, doc, axis_name: Optional[str] = None):
        doc_all, pos = _gather_negatives(query, doc, axis_name)
        scores = query @ doc_all.T                       # [B, Bg]
        pos_score = jnp.take_along_axis(scores, pos[:, None], 1)[:, 0]
        is_pos_col = jax.nn.one_hot(pos, scores.shape[1], dtype=bool)
        pseudo_ok = (~is_pos_col) & (scores >= xi) & (pos_score < miu)[:, None]
        num_logits = jnp.where(is_pos_col | pseudo_ok, scores, MASK)
        log_num = jax.nn.logsumexp(num_logits, axis=-1)
        log_den = jax.nn.logsumexp(scores, axis=-1)
        loss = -(log_num - log_den) * y_true
        return _mean_over_axis(jnp.mean(loss), axis_name)

    return loss_fn


# ------------------------------------------------------- zipped adapters
def unzip_embedding(y_pred):
    """Interleaved [q0;d0;q1;d1;...] rows -> (query, doc), L2-normalized
    (parity: match_zipped_losses.py:18-28)."""
    q = y_pred[0::2]
    d = y_pred[1::2]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    return q, d


def _zipped(core):
    def wrapped(y_true, y_pred, **kw):
        q, d = unzip_embedding(y_pred)
        return core(y_true, q, d, **kw)
    wrapped.__name__ = "zipped_" + core.__name__
    return wrapped


zipped_mean_squared_error = _zipped(mean_squared_error)
zipped_binary_cross_entropy = _zipped(binary_cross_entropy)
zipped_cosent_loss = _zipped(cosent_loss)
zipped_cosent_loss_v2 = _zipped(cosent_loss_v2)
zipped_batch_neg_sample_ce_loss = _zipped(batch_neg_sample_ce_loss)
zipped_batch_neg_sample_scaled_multi_class_ce_loss = _zipped(
    batch_neg_sample_scaled_multi_class_ce_loss)
zipped_batch_neg_sample_margin_rank_loss = _zipped(batch_neg_sample_margin_rank_loss)
