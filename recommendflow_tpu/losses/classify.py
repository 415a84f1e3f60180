"""Classification losses (parity: backend/lossess/classify_losses.py:7-155).

Pure jnp; logits-space and numerically stable on TPU bf16/f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MASK = -1e9
EPS = 1e-7


def multilabel_categorical_crossentropy(y_true, y_pred):
    """Su Jianlin's multilabel CE over raw logits (kexue.fm/archives/7359;
    parity: classify_losses.py:8-23). y_true in {0,1}, same shape as y_pred.
    No sigmoid/softmax on y_pred! Predict classes where y_pred > 0."""
    y_pred = (1 - 2 * y_true) * y_pred
    pred_neg = jnp.where(y_true > 0, MASK, y_pred)
    pred_pos = jnp.where(y_true > 0, y_pred, MASK)
    zeros = jnp.zeros_like(y_pred[..., :1])
    neg_loss = jax.nn.logsumexp(jnp.concatenate([pred_neg, zeros], axis=-1), axis=-1)
    pos_loss = jax.nn.logsumexp(jnp.concatenate([pred_pos, zeros], axis=-1), axis=-1)
    return neg_loss + pos_loss


def sparse_multilabel_categorical_crossentropy(y_true, y_pred,
                                               mask_zero: bool = False):
    """Sparse multilabel CE: y_true [..., num_positive] holds positive class
    ids, y_pred [..., num_classes] raw logits (parity: classify_losses.py:27-53;
    mask_zero treats class 0 as a padding label)."""
    zeros = jnp.zeros_like(y_pred[..., :1])
    y_pred = jnp.concatenate([y_pred, zeros], axis=-1)
    if mask_zero:
        inf_col = zeros + 1e12
        y_pred = jnp.concatenate([inf_col, y_pred[..., 1:]], axis=-1)
    y_pos_2 = jnp.take_along_axis(y_pred, y_true, axis=-1)
    y_pos_1 = jnp.concatenate([y_pos_2, zeros], axis=-1)
    if mask_zero:
        y_pred = jnp.concatenate([-inf_col, y_pred[..., 1:]], axis=-1)
        y_pos_2 = jnp.take_along_axis(y_pred, y_true, axis=-1)
    pos_loss = jax.nn.logsumexp(-y_pos_1, axis=-1)
    all_loss = jax.nn.logsumexp(y_pred, axis=-1)
    aux_loss = jax.nn.logsumexp(y_pos_2, axis=-1) - all_loss
    aux_loss = jnp.clip(1 - jnp.exp(aux_loss), EPS, 1.0)
    neg_loss = all_loss + jnp.log(aux_loss)
    return pos_loss + neg_loss


def sparse_categorical_crossentropy(y_true, y_pred):
    """Standard sparse softmax CE over logits."""
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    picked = jnp.take_along_axis(logp, y_true[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(picked)


def binary_crossentropy(y_true, y_pred, from_logits: bool = False):
    if from_logits:
        return jnp.mean(jnp.maximum(y_pred, 0) - y_pred * y_true +
                        jnp.log1p(jnp.exp(-jnp.abs(y_pred))))
    p = jnp.clip(y_pred, EPS, 1 - EPS)
    return jnp.mean(-(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p)))


def categorical_crossentropy(y_true, y_pred, from_logits: bool = False):
    if from_logits:
        logp = jax.nn.log_softmax(y_pred, axis=-1)
    else:
        logp = jnp.log(jnp.clip(y_pred, EPS, 1.0))
    return jnp.mean(-jnp.sum(y_true * logp, axis=-1))


def categorical_hinge(y_true, y_pred):
    pos = jnp.sum(y_true * y_pred, axis=-1)
    neg = jnp.max((1 - y_true) * y_pred - y_true * 1e12, axis=-1)
    return jnp.mean(jnp.maximum(0.0, neg - pos + 1.0))


def binary_focal_loss(y_true, y_score, gamma: float = 2.0, alpha: float = 0.25):
    """Binary focal loss on probabilities (parity: classify_losses.py:76-82)."""
    y_true = y_true.astype(jnp.float32)
    alpha_t = y_true * alpha + (1 - y_true) * (1 - alpha)
    p_t = y_true * y_score + (1 - y_true) * (1 - y_score) + EPS
    return jnp.mean(-alpha_t * (1 - p_t) ** gamma * jnp.log(p_t))


def categorical_focal_loss(gamma: float = 2.0, alpha: float = 1.0):
    """Multi-class focal loss factory (parity: classify_losses.py:141-155)."""
    def focal(y_true, y_pred):
        p = jnp.clip(y_pred, EPS, 1 - EPS)
        ce = -y_true * jnp.log(p)
        weight = alpha * jnp.abs(y_true - p) ** gamma
        return jnp.sum(weight * ce, axis=-1)
    return focal


def categorical_ghm_loss(bins: int = 30, momentum: float = 0.75):
    """Gradient-harmonizing CE (parity intent: classify_losses.py:85-138).

    Functional form: the EMA bin-count state threads explicitly through the
    call (no hidden Python state inside jit):
        loss, new_state = ghm(y_true, y_pred, valid_mask, state)
    where state is the [bins] EMA of per-bin gradient counts.
    """
    edges = jnp.linspace(0.0, 1.0, bins + 1)

    def init_state():
        return jnp.zeros((bins,), jnp.float32)

    def ghm(y_true, y_pred, valid_mask, state):
        p = jnp.clip(y_pred, EPS, 1 - EPS)
        gradient = jnp.abs(y_true - p)                       # [B, C]
        in_bin = ((gradient[None] >= edges[:-1, None, None]) &
                  (gradient[None] < edges[1:, None, None]))  # [bins, B, C]
        valid = valid_mask[None, :, None]
        counts = jnp.sum(in_bin * valid, axis=(1, 2)).astype(jnp.float32)
        new_state = momentum * state + (1 - momentum) * counts
        density = jnp.einsum("kbc,k->bc", in_bin.astype(jnp.float32), new_state)
        density = density * valid_mask[:, None] + (1 - valid_mask[:, None])
        ce = -y_true * jnp.log(p)
        loss = jnp.sum(ce / jnp.maximum(density, 1.0), axis=-1)
        # invalid (padded) rows must contribute ZERO loss and gradient, not
        # unweighted CE — valid_mask previously only shaped the densities
        return loss * valid_mask, new_state

    ghm.init_state = init_state
    return ghm
