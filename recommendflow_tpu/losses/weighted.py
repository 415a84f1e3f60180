"""Sample-weighted loss variants (parity: backend/lossess/weighted_losses.py:5-30)."""
from __future__ import annotations

import jax.numpy as jnp

def _default_weights(weights, y_true):
    """weights=None -> uniform: the weighted family stays usable as a plain
    Networks.loss (models call loss(y, q, d)); explicit per-sample weights
    come from custom call sites / the generators' 'weight' column."""
    return jnp.ones_like(y_true) if weights is None else weights


def weighted_mean_squared_error(y_true, query, doc, weights=None):
    weights = _default_weights(weights, y_true)
    pred = jnp.sum(query * doc, axis=1)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.sum(w * (y_true - pred) ** 2)


def weighted_binary_cross_entropy(y_true, query, doc, weights=None):
    weights = _default_weights(weights, y_true)
    eps = 1e-7
    pred = jnp.clip(jnp.sum(query * doc, axis=1), eps, 1 - eps)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.sum(-w * (y_true * jnp.log(pred) + (1 - y_true) * jnp.log(1 - pred)))


def weighted_cosent_loss(y_true, query, doc, weights=None,
                         scale: float = 20.0):
    """CoSENT with per-PAIR weights w_i*w_j scaling each pair's exp term
    (exp(diff)*w_ij == exp(diff + log w_ij)). Weighting the raw scores would
    corrupt the ordering comparison CoSENT is built on; the reference's
    cosent_loss_weighted ignores its weights entirely (weighted_losses.py),
    so this implements the evident intent."""
    import jax

    weights = _default_weights(weights, y_true)
    pred = jnp.sum(query * doc, axis=1)
    order = (y_true[:, None] < y_true[None, :])
    diff = (pred[:, None] - pred[None, :]) * scale
    logw = jnp.log(jnp.maximum(weights, 1e-12))
    pair_logw = logw[:, None] + logw[None, :]
    logits = jnp.where(order, diff + pair_logw, -1e9).reshape(-1)
    logits = jnp.concatenate([jnp.zeros((1,), pred.dtype), logits])
    return jax.nn.logsumexp(logits)
