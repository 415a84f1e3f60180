"""Channel fusion (parity: backend/layers/fusion_layers.py:6-61
AttentionFusion): Que2Search-style attention over N embedding channels with
inference-time channel-importance introspection.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class AttentionFusion(nn.Module):
    """softmax(W·[channels]) weighted sum of per-channel embeddings.

    Channels: list of [B, D] tensors (same D). Accumulates mean attention
    weights into a non-trainable 'infer_weights' variable for channel
    importance introspection (parity: fusion_layers.py:33-53).
    """
    num_channels: int

    @nn.compact
    def __call__(self, channels: Sequence[jnp.ndarray],
                 training: bool = False) -> jnp.ndarray:
        assert len(channels) == self.num_channels, (
            f"expected {self.num_channels} channels, got {len(channels)}")
        stacked = jnp.stack(channels, axis=1)             # [B, C, D]
        b, c, d = stacked.shape
        flat = stacked.reshape(b, c * d)
        logits = nn.Dense(c, name="att")(flat)            # [B, C]
        weights = jax.nn.softmax(logits, axis=-1)
        infer = self.variable("stats", "infer_weights",
                              lambda: jnp.zeros((c,), jnp.float32))
        count = self.variable("stats", "infer_count",
                              lambda: jnp.zeros((), jnp.float32))
        if (not training and not self.is_initializing()
                and self.is_mutable_collection("stats")):
            # accumulate only when the caller allows it: a plain immutable
            # apply() (e.g. StableHLO export of que2search) must not crash
            # on the introspection side-channel
            infer.value = infer.value + jnp.mean(weights, axis=0)
            count.value = count.value + 1.0
        return jnp.einsum("bc,bcd->bd", weights, stacked)


def channel_importance(stats: dict) -> jnp.ndarray:
    """Mean fusion weights accumulated during inference (parity:
    que2search.py:152-157 introspection)."""
    w = stats["infer_weights"]
    n = jnp.maximum(stats["infer_count"], 1.0)
    return w / n
