"""DeepFM ranker: FM over field embeddings + deep tower (fills the empty
models/ranking/deepfm.py using the reference's New_FM/CIN blocks,
network_layers.py:174-255)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import (
    bce_with_logits, concat_all, field_stack, get_labels,
)
from recommendflow_tpu.ops.interactions import CIN, FM
from recommendflow_tpu.ops.mlp import MLP


class DeepFm(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    hidden_units: Optional[Sequence[int]] = None
    dropout: float = 0.2
    use_cin: bool = False        # True -> xDeepFM
    cin_layers: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        fields, _ = field_stack(feats, schema)
        fm_logit = FM(name="fm")(fields)
        x = concat_all(feats, schema)
        units = list(self.hidden_units or self.network_conf("hidden_units")
                     or [256, 128])
        deep = MLP(units, self.dropout, "relu", name="deep")(x, training)
        logit = fm_logit + nn.Dense(1, name="deep_head")(deep)[:, 0]
        if self.use_cin:
            cin = CIN(tuple(self.cin_layers), name="cin")(fields)
            logit = logit + nn.Dense(1, name="cin_head")(cin)[:, 0]
        (y,) = get_labels(batch, schema, 1)
        if training:
            return bce_with_logits(y, logit), {"pred_mean": jnp.mean(nn.sigmoid(logit))}
        return {"score": nn.sigmoid(logit), "logit": logit, "label": y}


DeepFM = DeepFm


class XDeepFm(DeepFm):
    use_cin: bool = True


XDeepFM = XDeepFm
