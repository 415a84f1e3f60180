"""Streaming item-frequency estimation for sampled-softmax bias correction.

In-batch negatives are sampled proportionally to item frequency, which
biases the softmax toward punishing popular items; the standard production
correction (Yi et al. 2019, "Sampling-Bias-Corrected Neural Modeling for
Large Corpus Item Recommendations", Algorithm 1) subtracts log p(item) from
every logit, with p estimated ONLINE from the stream: for hash bucket h of
an item seen at global step t, keep an EMA of the step interval between
consecutive occurrences — p ≈ 1 / interval.

Beyond the reference's capability surface (its in-batch losses are
uncorrected, match_losses.py:149-189); pairs with the `logq=` parameter of
the scaled in-batch CE losses (losses/match.py).

Everything here is a pure function over a pytree state — jit/scan/donation
friendly, checkpointable alongside the optimizer state.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

FreqState = Dict[str, jnp.ndarray]


def freq_init(num_buckets: int = 1 << 20) -> FreqState:
    """State: per-bucket last-seen step (int32) and EMA'd step interval
    (float32, 0 = never seen)."""
    return {
        "last_step": jnp.zeros((num_buckets,), jnp.int32),
        "interval": jnp.zeros((num_buckets,), jnp.float32),
    }


def freq_update(state: FreqState, ids: jnp.ndarray, step: jnp.ndarray,
                alpha: float = 0.05) -> FreqState:
    """One stream batch: ids [N] int32 bucket ids (hash item identifiers
    into [0, num_buckets) first), step the current global step.

    interval[h] <- (1-a) * interval[h] + a * (step - last_step[h])
    (first sighting initializes the interval to the raw delta);
    last_step[h] <- step. Duplicate ids in one batch collapse to one
    update (same step -> same write)."""
    ids = ids.reshape(-1).astype(jnp.int32)
    step = jnp.asarray(step, jnp.int32)
    last = state["last_step"][ids]
    interval = state["interval"][ids]
    delta = jnp.maximum(step - last, 1).astype(jnp.float32)
    seen = (last > 0) | (interval > 0)
    new_interval = jnp.where(seen, (1 - alpha) * interval + alpha * delta,
                             delta)
    return {
        "last_step": state["last_step"].at[ids].set(step),
        "interval": state["interval"].at[ids].set(new_interval),
    }


def log_q(state: FreqState, ids: jnp.ndarray,
          floor: float = 1e-6) -> jnp.ndarray:
    """log of the estimated sampling probability per id: p = 1/interval.
    Unseen ids get log(floor) (a very rare item — large negative logQ, so
    its logit is BOOSTED least... i.e. corrected most conservatively)."""
    interval = state["interval"][ids.reshape(-1).astype(jnp.int32)]
    p = jnp.where(interval > 0, 1.0 / jnp.maximum(interval, 1.0), floor)
    return jnp.log(jnp.maximum(p, floor)).reshape(ids.shape)
