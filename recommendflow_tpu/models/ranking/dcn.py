"""DCN ranker: CrossNetwork + deep tower in parallel (fills the reference's
empty models/ranking/dcn.py using its CrossNetwork block,
network_layers.py:130-171)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_with_logits, concat_all, get_labels
from recommendflow_tpu.ops.interactions import CrossNetwork
from recommendflow_tpu.ops.mlp import MLP


class Dcn(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    cross_layers: int = 3
    hidden_units: Optional[Sequence[int]] = None
    dropout: float = 0.2

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        x = concat_all(feats, schema)
        cross = CrossNetwork(self.cross_layers, name="cross")(x)
        units = list(self.hidden_units or self.network_conf("hidden_units")
                     or [256, 128])
        deep = MLP(units, self.dropout, "relu", name="deep")(x, training)
        logit = nn.Dense(1, name="head")(
            jnp.concatenate([cross, deep], axis=-1))[:, 0]
        (y,) = get_labels(batch, schema, 1)
        if training:
            return bce_with_logits(y, logit), {"pred_mean": jnp.mean(nn.sigmoid(logit))}
        return {"score": nn.sigmoid(logit), "logit": logit, "label": y}


DCN = Dcn
