"""Siamese text-encoder two-tower (the siamese_bert replacement).

Capability parity with models/matching/siamese_bert.py:12-111: ONE shared
text encoder applied to both towers' token_id features, output pooling via
dense projection / attention-fusion / sum / mean over multiple text inputs
per tower, L2-norm, loss on (label, u, a). The bert4keras dependency becomes
our flax TextEncoder (ops/transformer.py).
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.config.proto import FeatureTower
from recommendflow_tpu.models.base import Batch, RecModel
from recommendflow_tpu.models.common import get_labels
from recommendflow_tpu.ops.fusion import AttentionFusion
from recommendflow_tpu.ops.mlp import l2_normalize
from recommendflow_tpu.ops.transformer import TextEncoder


class SiameseEncoder(RecModel):
    """Networks keys: embedding_dim, embedding_pooling (dense|attention|
    sum|mean — siamese_bert.py:47-75 surface), text_vocab_size, text_dim,
    text_layers, text_pooling (cls/avg/...)."""
    dropout: float = 0.1

    def _tower_tokens(self, schema, tower: str) -> List[str]:
        t = FeatureTower(tower)
        return [n for n in schema.order
                if schema.slots[n].tower == t and schema.slots[n].kind in ("token", "bert")]

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        out_dim = int(self.network_conf("embedding_dim") or 128)
        merge = str(self.network_conf("embedding_pooling") or "dense")
        pre = (self.network_conf("pretrained") or {}).get("encoder")
        if pre:
            # size the encoder from the pretrained bert_config.json so the
            # trainer's init graft (encoder/pretrained.py:apply_pretrained)
            # matches shapes (reference bert_conf surface, siamese_bert.py)
            from recommendflow_tpu.encoder.pretrained import bert_encoder_kwargs
            kw = bert_encoder_kwargs(
                pre["config_path"],
                max_len=pre.get("max_len") or self.token_max_len(),
                pooling=str(self.network_conf("text_pooling") or "cls"))
            encoder = TextEncoder(**kw, name="encoder")
        else:
            encoder = TextEncoder(
                vocab_size=int(self.network_conf("text_vocab_size") or 30000),
                num_layers=int(self.network_conf("text_layers") or 4),
                model_dim=int(self.network_conf("text_dim") or 256),
                pooling=str(self.network_conf("text_pooling") or "cls"),
                max_len=self.token_max_len(),
                name="encoder")  # SHARED weights across towers & inputs

        def tower(tower_name: str):
            names = self._tower_tokens(schema, tower_name)
            if not names:
                raise ValueError(f"tower '{tower_name}' has no token_id features")
            encs = [encoder(batch[n], batch.get(f"{n}:seg"),
                            training=training) for n in names]
            if len(encs) == 1:
                merged = encs[0]
            elif merge == "sum":
                merged = sum(encs)
            elif merge == "mean":
                merged = sum(encs) / len(encs)
            elif merge == "attention":
                merged = AttentionFusion(len(encs),
                                         name=f"{tower_name}_fusion")(encs, training)
            else:  # dense
                merged = jnp.concatenate(encs, axis=-1)
            return l2_normalize(nn.Dense(out_dim, name=f"{tower_name}_proj")(merged))

        u = tower("user")
        a = tower("ad")
        (y,) = get_labels(batch, schema, 1)
        if training:
            loss = self.resolve_loss()(y, u, a)
            aux = {"pos_cos": jnp.mean(jnp.sum(u * a, axis=1) * y)}
            return loss, aux
        return {"user": u, "ad": a, "label": y}


# reference class name alias (siamese_bert.BertModel)
BertModel = SiameseEncoder
