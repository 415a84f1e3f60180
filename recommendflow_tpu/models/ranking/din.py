"""DIN ranker: candidate-conditioned attention over the user behavior
sequence (Zhou et al. 2018, Deep Interest Network).

The reference ships DIN's Dice activation (blocks/mlp.py:24-29 dice_func)
but never the model — this completes that intent (BEYOND the reference's
model zoo, which stops at empty ranking files).

Config (Networks):
  din_sequence:  name of the behavior feature — MUST use `pooling: null`
                 so its per-position embeddings reach the model unpooled
  din_candidate: name of the candidate item feature (same embedding dim)
  att_units:     attention MLP widths (default [64, 32])
  hidden_units:  final tower widths (default [256, 128])

Per position t the attention weight is MLP_dice([e_t, v_c, e_t - v_c,
e_t * v_c]) — an UNNORMALIZED weighted sum like the paper (no softmax:
the total interest intensity carries signal); pad positions weigh 0.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_with_logits, get_labels
from recommendflow_tpu.ops.mlp import MLP, Dice


class Din(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    hidden_units: Optional[Sequence[int]] = None
    att_units: Optional[Sequence[int]] = None
    dropout: float = 0.2

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        seq_name = self.network_conf("din_sequence")
        cand_name = self.network_conf("din_candidate")
        if not seq_name or not cand_name:
            raise ValueError("Din needs Networks.din_sequence and "
                             "Networks.din_candidate feature names")
        seq_slot = schema.slots[seq_name]
        cand_slot = schema.slots[cand_name]
        if seq_slot.pooling.value != "null":
            raise ValueError(
                f"Din sequence feature '{seq_name}' must use pooling: null "
                "(the model pools it with candidate-aware attention)")
        if seq_slot.dim != cand_slot.dim:
            raise ValueError("Din sequence and candidate features need the "
                             f"same embedding dim ({seq_slot.dim} vs "
                             f"{cand_slot.dim})")

        feats = FeatureEmbedder(schema, name="embedder")(batch)

        h, L, d = seq_slot.num_hashes, seq_slot.max_len, seq_slot.dim
        b = feats[seq_name].shape[0]
        # null-pooled features arrive flattened [B, H*L*D]; per-position
        # channels concat the hash branches -> [B, L, H*D]
        seq = feats[seq_name].reshape(b, h, L, d).transpose(0, 2, 1, 3)
        seq = seq.reshape(b, L, h * d)
        mask = (batch[seq_name] > 0).any(axis=1)            # [B, L]
        cand = feats[cand_name].reshape(b, -1)              # [B, Hc*D]
        if cand.shape[-1] != seq.shape[-1]:
            cand = nn.Dense(seq.shape[-1], name="cand_proj")(cand)

        c = jnp.broadcast_to(cand[:, None, :], seq.shape)
        att_in = jnp.concatenate([seq, c, seq - c, seq * c], axis=-1)
        x = att_in
        for i, units in enumerate(list(self.att_units or
                                       self.network_conf("att_units") or
                                       [64, 32])):
            x = nn.Dense(units, name=f"att{i}")(x)
            x = Dice(name=f"dice{i}")(x, training)
        w = nn.Dense(1, name="att_out")(x)[..., 0]          # [B, L]
        w = jnp.where(mask, w, 0.0)
        interest = jnp.einsum("bl,bld->bd", w, seq)         # [B, H*D]

        other = [feats[n] for n in schema.order
                 if n in feats and n != seq_name]
        deep_in = jnp.concatenate(other + [interest], axis=-1)
        units = list(self.hidden_units or
                     self.network_conf("hidden_units") or [256, 128])
        deep = MLP(units, self.dropout, "relu", name="deep")(deep_in, training)
        logit = nn.Dense(1, name="head")(deep)[:, 0]
        (y,) = get_labels(batch, schema, 1)
        if training:
            return bce_with_logits(y, logit), {
                "pred_mean": jnp.mean(nn.sigmoid(logit))}
        return {"score": nn.sigmoid(logit), "logit": logit, "label": y}


DIN = Din
