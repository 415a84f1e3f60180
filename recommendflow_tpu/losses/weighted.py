"""Sample-weighted loss variants (parity: backend/lossess/weighted_losses.py:5-30)."""
from __future__ import annotations

import jax.numpy as jnp

from recommendflow_tpu.losses.match import cosent_loss_from_scores


def weighted_mean_squared_error(y_true, query, doc, weights):
    pred = jnp.sum(query * doc, axis=1)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.sum(w * (y_true - pred) ** 2)


def weighted_binary_cross_entropy(y_true, query, doc, weights):
    eps = 1e-7
    pred = jnp.clip(jnp.sum(query * doc, axis=1), eps, 1 - eps)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    return jnp.sum(-w * (y_true * jnp.log(pred) + (1 - y_true) * jnp.log(1 - pred)))


def weighted_cosent_loss(y_true, query, doc, weights, scale: float = 20.0):
    """CoSENT with per-sample weights folded into the score scale."""
    pred = jnp.sum(query * doc, axis=1) * weights
    return cosent_loss_from_scores(y_true, pred, scale)
