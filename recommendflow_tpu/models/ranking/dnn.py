"""DNN CTR ranker (fills the reference's empty models/ranking/dnn.py slot;
blocks from backend/blocks/mlp.py:4-15)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_with_logits, concat_all, get_labels
from recommendflow_tpu.ops.mlp import MLP


class Dnn(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    hidden_units: Optional[Sequence[int]] = None
    dropout: float = 0.2
    activation: str = "relu"

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        x = concat_all(feats, schema)
        units = list(self.hidden_units or self.network_conf("hidden_units")
                     or [512, 256, 128])
        h = MLP(units, self.dropout, self.activation, name="mlp")(x, training)
        logit = nn.Dense(1, name="head")(h)[:, 0]
        (y,) = get_labels(batch, schema, 1)
        if training:
            loss = bce_with_logits(y, logit)
            return loss, {"pred_mean": jnp.mean(nn.sigmoid(logit))}
        return {"score": nn.sigmoid(logit), "logit": logit, "label": y}


DNN = Dnn
