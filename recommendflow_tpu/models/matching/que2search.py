"""Que2Search multi-channel two-tower recall model.

Capability parity with the reference's partial Que2Search
(models/matching/que2search.py:12-164, WIP bugs noted in SURVEY §2.6),
implemented as intended: each tower fuses several channels — a text-encoder
channel over token_id features and embedding-bag channels over hashed
n-gram/keyword features — via AttentionFusion (fusion_layers.py:6-61), then
projects to the shared embedding space; trained with the scaled in-batch
multi-class CE (match_losses.py:149-165). Channel attention weights are
accumulated for inference-time introspection.

Networks config keys: embedding_dim, text_vocab_size, text_dim, channel_dim.
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.config.proto import FeatureTower
from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import get_labels
from recommendflow_tpu.ops.fusion import AttentionFusion
from recommendflow_tpu.ops.mlp import MLP, l2_normalize
from recommendflow_tpu.ops.transformer import TextEncoder


class Que2Search(RecModel):
    channel_dim: int = 128
    text_vocab_size: int = 30000
    text_dim: int = 128
    text_layers: int = 2
    dropout: float = 0.1

    def _tower_channels(self, schema, tower: str):
        """(token features, sparse features) of one tower."""
        t = FeatureTower(tower)
        toks = [s for n in schema.order if (s := schema.slots[n]).tower == t
                and s.kind in ("token", "bert")]
        sparse = [s for n in schema.order if (s := schema.slots[n]).tower == t
                  and s.kind in ("sparse", "dense")]
        return toks, sparse

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        embedder = FeatureEmbedder(schema, name="embedder")
        out_dim = int(self.network_conf("embedding_dim") or 128)
        ch_dim = int(self.network_conf("channel_dim") or self.channel_dim)
        vocab = int(self.network_conf("text_vocab_size") or self.text_vocab_size)

        text_encoder = TextEncoder(
            vocab_size=vocab, num_layers=self.text_layers,
            model_dim=int(self.network_conf("text_dim") or self.text_dim),
            pooling="cls", max_len=self.token_max_len(),
            name="text_encoder")  # shared across towers

        def tower(tower_name: str):
            toks, sparse = self._tower_channels(schema, tower_name)
            feats = embedder(batch, tower=tower_name)
            channels: List[jnp.ndarray] = []
            for i, s in enumerate(toks):
                enc = text_encoder(batch[s.name], batch.get(f"{s.name}:seg"),
                                   training=training)
                channels.append(MLP([ch_dim], self.dropout, "relu",
                                    name=f"{tower_name}_txt{i}")(enc, training))
            for i, s in enumerate(sparse):
                if s.name not in feats:
                    continue
                channels.append(MLP([ch_dim], self.dropout, "relu",
                                    name=f"{tower_name}_ch{i}")(feats[s.name], training))
            if not channels:
                raise ValueError(f"tower '{tower_name}' has no channels")
            if len(channels) == 1:
                fused = channels[0]
            else:
                fused = AttentionFusion(len(channels),
                                        name=f"{tower_name}_fusion")(
                    channels, training)
            return l2_normalize(nn.Dense(out_dim, name=f"{tower_name}_out")(fused))

        u = tower("user")
        a = tower("ad")
        (y,) = get_labels(batch, schema, 1)

        # auxiliary classification tower (the reference sketches this but
        # leaves it commented out, que2search.py:64,132-141): when a second
        # label column exists, a small head over the fused ad embedding
        # predicts it (e.g. category / quality), regularizing the tower
        aux_logit = None
        if len(schema.label_names) > 1:
            aux_logit = nn.Dense(1, name="aux_head")(a)[:, 0]

        if training:
            loss = self.resolve_loss()(y, u, a)
            aux = {"pos_cos": jnp.sum(jnp.sum(u * a, axis=1) * y)
                   / jnp.maximum(jnp.sum(y), 1.0)}
            if aux_logit is not None:
                y_aux = batch.get(schema.label_names[1])
                if y_aux is not None:
                    from recommendflow_tpu.models.common import bce_with_logits
                    aux_w = float(self.network_conf("aux_weight") or 0.3)
                    aux_loss = bce_with_logits(y_aux, aux_logit)
                    loss = loss + aux_w * aux_loss
                    aux["aux_loss"] = aux_loss
            return loss, aux
        out = {"user": u, "ad": a, "label": y}
        if aux_logit is not None:
            out["aux_score"] = nn.sigmoid(aux_logit)
        return out
