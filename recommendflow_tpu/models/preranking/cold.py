"""COLD preranker (fills the reference's empty models/preranking/cold.py).

COLD (Computing power-aware Online Lightweight Deep ranking): SE-style
feature-importance gating over field embeddings (the mechanism COLD uses for
offline feature selection) + a small MLP head. The learned gate weights are
exposed at predict time so operators can prune features to meet a latency
budget.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_with_logits, field_stack, get_labels
from recommendflow_tpu.ops.mlp import MLP


class Cold(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    hidden_units: Sequence[int] = (128, 64)
    se_reduction: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        fields, names = field_stack(feats, schema)         # [B, F, D]
        b, f, d = fields.shape
        # squeeze-excitation over fields
        z = jnp.mean(fields, axis=-1)                      # [B, F]
        h = nn.relu(nn.Dense(max(f // self.se_reduction, 1), name="se1")(z))
        gate = nn.sigmoid(nn.Dense(f, name="se2")(h))      # [B, F]
        gated = fields * gate[..., None]
        x = gated.reshape(b, f * d)
        dense = [feats[s.name] for s in schema.dense_slots() if s.name in feats]
        if dense:
            x = jnp.concatenate([x] + dense, axis=-1)
        out = MLP(list(self.hidden_units), self.dropout, "relu", name="mlp")(
            x, training)
        logit = nn.Dense(1, name="head")(out)[:, 0]
        (y,) = get_labels(batch, schema, 1)
        if training:
            return bce_with_logits(y, logit), {"gate_mean": jnp.mean(gate)}
        return {"score": nn.sigmoid(logit), "label": y,
                "feature_gates": jnp.mean(gate, axis=0)}


COLD = Cold
