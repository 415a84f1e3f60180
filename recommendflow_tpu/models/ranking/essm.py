"""ESMM entire-space multi-task ranker (fills the reference's empty
models/ranking/essm.py — reference names it 'essm').

pCTR and pCVR towers over shared embeddings; supervision on pCTR (click) and
pCTCVR = pCTR*pCVR (conversion), eliminating CVR sample-selection bias.
Labels: label_names[0] = click, label_names[1] = conversion.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import concat_all, get_labels
from recommendflow_tpu.ops.mlp import MLP


def _bce_probs(y, p):
    from recommendflow_tpu.models.common import bce_probs
    return jnp.mean(bce_probs(y, p))


class Essm(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    tower_units: Sequence[int] = (128, 64)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        x = concat_all(feats, schema)
        ctr_h = MLP(list(self.tower_units), self.dropout, "relu",
                    name="ctr_tower")(x, training)
        cvr_h = MLP(list(self.tower_units), self.dropout, "relu",
                    name="cvr_tower")(x, training)
        p_ctr = nn.sigmoid(nn.Dense(1, name="ctr_head")(ctr_h)[:, 0])
        p_cvr = nn.sigmoid(nn.Dense(1, name="cvr_head")(cvr_h)[:, 0])
        p_ctcvr = p_ctr * p_cvr
        y_click, y_conv = get_labels(batch, schema, 2, training=training)
        if training:
            loss_ctr = _bce_probs(y_click, p_ctr)
            loss_ctcvr = _bce_probs(y_conv, p_ctcvr)
            return loss_ctr + loss_ctcvr, {"loss_ctr": loss_ctr,
                                           "loss_ctcvr": loss_ctcvr}
        return {"score": p_ctcvr, "p_ctr": p_ctr, "p_cvr": p_cvr,
                "label": y_click, "label_conv": y_conv}


ESSM = Essm
Esmm = Essm
