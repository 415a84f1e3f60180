"""PDM: preference-aware deep match (the reference's models/matching/pdm.py
is an empty file — this implements a sequence-aware two-tower: the user
tower attends over the behavior sequence with the candidate-independent
self-attention pooling of attention_layers.py:83-134, giving a stronger user
representation than sum-pooling)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import get_labels
from recommendflow_tpu.ops.attention import SelfAttention
from recommendflow_tpu.ops.mlp import MLP, l2_normalize


class Pdm(RecModel):
    tower_units: Sequence[int] = (256, 128)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        embedder = FeatureEmbedder(schema, name="embedder")
        out_dim = int(self.network_conf("embedding_dim") or 128)
        units = list(self.tower_units) + [out_dim]

        # sequence features of the user tower get attention pooling on the
        # raw (unpooled) embeddings; others keep their configured pooling.
        # Excluding them from the pooled pass keeps ONE gather per sequence
        # per step (gathers are the dominant per-row cost, CLAUDE.md).
        seq_slots = [s for s in schema.tower_slots("user")
                     if s.kind == "sparse" and s.max_len > 1]
        # one fused gather for BOTH towers' pooled slots (a per-tower pass
        # costs an extra full-table backward scatter, models/base.py
        # tower_vectors); the attention-pooled sequences stay excluded
        feats = embedder(batch, exclude=[s.name for s in seq_slots])
        seq_vecs = []
        for slot in seq_slots:
            ids = batch[slot.name]                        # [B, H, L]
            emb = embedder.unpooled(batch, slot.name)     # [B, H, L, D]
            b, h, l, d = emb.shape
            emb = emb.transpose(0, 2, 1, 3).reshape(b, l, h * d)
            mask = (ids > 0).any(axis=1)                  # [B, L]
            pooled = SelfAttention(name=f"attn_{slot.name}")(emb, mask)
            seq_vecs.append(pooled)
        flat = [feats[s.name] for s in schema.tower_slots("user")
                if s.name in feats]
        u_in = jnp.concatenate(flat + seq_vecs, axis=-1)
        from recommendflow_tpu.ops.embedding import concat_tower
        a_in = concat_tower(feats, schema, "ad")

        u = l2_normalize(MLP(units, self.dropout, "relu",
                             final_activation="linear", name="user_tower")(
            u_in, training))
        a = l2_normalize(MLP(units, self.dropout, "relu",
                             final_activation="linear", name="ad_tower")(
            a_in, training))
        (y,) = get_labels(batch, schema, 1)
        if training:
            return self.resolve_loss()(y, u, a), {
                "pos_cos": jnp.sum(jnp.sum(u * a, axis=1) * y)
                / jnp.maximum(jnp.sum(y), 1.0)}
        return {"user": u, "ad": a, "label": y}
