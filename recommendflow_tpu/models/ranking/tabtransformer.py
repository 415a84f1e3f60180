"""TabTransformer ranker (fills the reference's empty
models/ranking/tabtransformer.py using its block, blocks/transformer.py:8-26):
transformer over categorical field embeddings + dense features -> MLP head.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_with_logits, field_stack, get_labels
from recommendflow_tpu.ops.mlp import MLP
from recommendflow_tpu.ops.transformer import TabTransformer as TabBlocks


class TabTransformer(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    num_blocks: int = 2
    num_heads: int = 4
    hidden_units: Sequence[int] = (128, 64)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        fields, _ = field_stack(feats, schema)
        ctx = TabBlocks(self.num_blocks, self.num_heads,
                        ffn_hidden=4 * fields.shape[-1],
                        dropout=self.dropout, name="tab")(fields, training)
        dense = [feats[s.name] for s in schema.dense_slots() if s.name in feats]
        x = jnp.concatenate([ctx] + dense, axis=-1) if dense else ctx
        h = MLP(list(self.hidden_units), self.dropout, "relu", name="mlp")(x, training)
        logit = nn.Dense(1, name="head")(h)[:, 0]
        (y,) = get_labels(batch, schema, 1)
        if training:
            return bce_with_logits(y, logit), {"pred_mean": jnp.mean(nn.sigmoid(logit))}
        return {"score": nn.sigmoid(logit), "logit": logit, "label": y}
