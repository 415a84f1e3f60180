"""On-device streaming metrics.

Replaces the reference's in-graph tf.keras.metrics.AUC wrappers
(backend/core/metrics.py:4-10) with pure-functional binned accumulators that
live in the training step (jit-safe, psum-able across a mesh axis) plus
exact offline metrics for evaluation (sklearn parity,
backend/utils/eval_utils.py:33-82,270-293).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AucState(NamedTuple):
    """Binned TP/FP/TN/FN accumulators over score thresholds."""
    tp: jnp.ndarray
    fp: jnp.ndarray
    tn: jnp.ndarray
    fn: jnp.ndarray


def auc_init(num_thresholds: int = 200) -> AucState:
    z = jnp.zeros((num_thresholds,), jnp.float32)
    return AucState(z, z, z, z)


def _thresholds(n: int) -> jnp.ndarray:
    # keras-style: [-eps, n-2 inner points, 1+eps] -> n thresholds total
    eps = 1e-7
    if n <= 2:
        return jnp.array([-eps, 1.0 + eps])
    inner = jnp.linspace(0.0, 1.0, n)[1:-1]
    return jnp.concatenate([jnp.array([-eps]), inner, jnp.array([1.0 + eps])])


def auc_update(state: AucState, y_true: jnp.ndarray, y_score: jnp.ndarray,
               axis_name: Optional[str] = None) -> AucState:
    """Accumulate one batch; y_score in [0,1] (sigmoid/cosine rescaled)."""
    # [B,1]-shaped model outputs must not broadcast against [T,1]
    # thresholds (a shape error — or silent garbage when B == T)
    y_true = jnp.ravel(y_true)
    y_score = jnp.ravel(y_score)
    n = state.tp.shape[0]
    thr = _thresholds(n)[:, None]                       # [T, 1]
    pred_pos = y_score[None, :] > thr                   # [T, B]
    pos = (y_true > 0.5)[None, :]
    tp = jnp.sum(pred_pos & pos, axis=1).astype(jnp.float32)
    fp = jnp.sum(pred_pos & ~pos, axis=1).astype(jnp.float32)
    tn = jnp.sum(~pred_pos & ~pos, axis=1).astype(jnp.float32)
    fn = jnp.sum(~pred_pos & pos, axis=1).astype(jnp.float32)
    if axis_name is not None:
        tp, fp, tn, fn = (jax.lax.psum(x, axis_name) for x in (tp, fp, tn, fn))
    return AucState(state.tp + tp, state.fp + fp, state.tn + tn, state.fn + fn)


def auc_result(state: AucState) -> jnp.ndarray:
    """ROC-AUC by trapezoidal interpolation over the threshold bins.

    NaN when the stream held only one class (roc_auc parity) — 0.0 would
    read as a perfectly inverted model instead of 'undefined'; consumers
    already isfinite-gate (trainer.evaluate)."""
    tpr = state.tp / jnp.maximum(state.tp + state.fn, 1e-7)
    fpr = state.fp / jnp.maximum(state.fp + state.tn, 1e-7)
    # thresholds ascend -> fpr/tpr descend; integrate over fpr
    auc = jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)
    # tp+fn == total positives (constant across thresholds); idx 0 = -eps
    defined = (state.tp[0] + state.fn[0] > 0) & (state.fp[0] + state.tn[0] > 0)
    return jnp.where(defined, auc, jnp.nan)


# ------------------------------------------------------------ exact offline
def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Exact AUC via rank statistic (ties handled by average rank)."""
    y_true = np.asarray(y_true).ravel()
    y_score = np.asarray(y_score).ravel()
    pos = y_true > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = _average_ranks(y_score)
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def _average_ranks(x: np.ndarray) -> np.ndarray:
    """1-based ranks with ties averaged — fully vectorized (a python
    per-distinct-score loop here cost seconds per million rows on the
    evaluate() path)."""
    x = np.asarray(x).ravel()
    order = np.argsort(x, kind="mergesort")
    _, inv, counts = np.unique(x[order], return_inverse=True,
                               return_counts=True)
    ends = np.cumsum(counts).astype(np.float64)          # 1-based group ends
    starts = ends - counts + 1.0
    avg = (starts + ends) / 2.0                          # per distinct value
    ranks = np.empty(len(x), np.float64)
    ranks[order] = avg[inv]
    return ranks


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """AUPR (average precision), computed over distinct score THRESHOLDS.

    Tied scores are one atomic operating point (sklearn semantics): the
    naive per-item cumsum credited positives by their arbitrary row order
    inside a tied run, so the same (label, score) multiset scored
    differently depending on eval-set row order — common in practice with
    float32 sigmoid saturation at 0.0/1.0."""
    # binarize like roc_auc: raw label VALUES in the cumsum would yield
    # precision/AP > 1 for weighted or soft labels
    y_true = (np.asarray(y_true).ravel() > 0.5).astype(np.float64)
    scores = np.asarray(y_score).ravel()
    order = np.argsort(-scores, kind="mergesort")
    y = y_true[order]
    s = scores[order]
    total_pos = y.sum()
    if total_pos == 0:
        return float("nan")
    cum_pos = np.cumsum(y)
    k = np.arange(1, len(y) + 1)
    last = np.empty(len(y), bool)            # last index of each tied run
    last[:-1] = s[:-1] > s[1:]
    last[-1] = True
    p_end = cum_pos[last] / k[last]          # precision at each threshold
    pos_in_run = np.diff(np.concatenate([[0.0], cum_pos[last]]))
    return float(np.sum(p_end * pos_in_run) / total_pos)


def recall_at_precision(y_true: np.ndarray, y_score: np.ndarray,
                        precision_floor: float = 0.6) -> Tuple[float, float]:
    """Max recall subject to precision >= floor, and the threshold achieving
    it (parity: eval_utils.py:270-293)."""
    y_true = (np.asarray(y_true).ravel() > 0.5).astype(np.float64)
    order = np.argsort(-np.asarray(y_score).ravel(), kind="mergesort")
    y = y_true[order]
    scores = np.asarray(y_score).ravel()[order]
    cum_pos = np.cumsum(y)
    k = np.arange(1, len(y) + 1)
    precision = cum_pos / k
    total_pos = max(y.sum(), 1e-12)
    recall = cum_pos / total_pos
    ok = precision >= precision_floor
    # the returned threshold is DEPLOYED as `score >= t`: a cut inside a
    # tied-score run admits the whole run, so only the last index of each
    # run is an achievable operating point
    achievable = np.empty(len(y), bool)
    achievable[:-1] = scores[:-1] > scores[1:]
    achievable[-1] = True
    ok &= achievable
    if not ok.any():
        return 0.0, float("inf")
    best = np.argmax(np.where(ok, recall, -1.0))
    return float(recall[best]), float(scores[best])


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation (parity: eval_utils.py:79-82)."""
    # average ranks on ties (scipy.spearmanr semantics — ordinal ranks
    # would be input-order-dependent for tied values)
    ra, rb = _average_ranks(a), _average_ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else float("nan")
