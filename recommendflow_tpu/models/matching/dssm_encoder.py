"""Two-tower with SEPARATE query/doc text encoders (the dssm_bert
replacement; parity: models/matching/dssm_bert.py:11-109 — independent
user/ad encoder configs + linear projections to a shared space)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.config.proto import FeatureTower
from recommendflow_tpu.models.base import Batch, RecModel
from recommendflow_tpu.models.common import get_labels
from recommendflow_tpu.ops.mlp import l2_normalize
from recommendflow_tpu.ops.transformer import TextEncoder


class DssmEncoder(RecModel):
    """Networks keys: embedding_dim, user_encoder / ad_encoder sub-dicts
    ({vocab_size, num_layers, model_dim, pooling} — the user_bert_conf /
    ad_bert_conf surface of dssm_bert.py)."""
    dropout: float = 0.1

    def _encoder(self, key: str, name: str) -> TextEncoder:
        cfg = self.network_conf(key) or {}
        pre = (self.network_conf("pretrained") or {}).get(name)
        if pre:
            # size from the pretrained bert_config.json so the trainer's
            # init graft matches shapes (reference user_bert_conf/ad_bert_conf
            # surface, dssm_bert.py:30-38)
            from recommendflow_tpu.encoder.pretrained import bert_encoder_kwargs
            kw = bert_encoder_kwargs(
                pre["config_path"],
                max_len=pre.get("max_len") or self.token_max_len(),
                pooling=str(cfg.get("pooling", "cls")))
            return TextEncoder(**kw, name=name)
        return TextEncoder(
            vocab_size=int(cfg.get("vocab_size", 30000)),
            num_layers=int(cfg.get("num_layers", 4)),
            model_dim=int(cfg.get("model_dim", 256)),
            pooling=str(cfg.get("pooling", "cls")),
            max_len=self.token_max_len(),
            name=name)

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        out_dim = int(self.network_conf("embedding_dim") or 128)

        def tokens_of(tower: str):
            t = FeatureTower(tower)
            names = [n for n in schema.order
                     if schema.slots[n].tower == t and schema.slots[n].kind in ("token", "bert")]
            if not names:
                raise ValueError(f"tower '{tower}' has no token_id features")
            return names[0]

        user_enc = self._encoder("user_encoder", "user_encoder")
        ad_enc = self._encoder("ad_encoder", "ad_encoder")
        un, an = tokens_of("user"), tokens_of("ad")
        u = user_enc(batch[un], batch.get(f"{un}:seg"), training=training)
        a = ad_enc(batch[an], batch.get(f"{an}:seg"), training=training)
        u = l2_normalize(nn.Dense(out_dim, name="user_proj")(u))
        a = l2_normalize(nn.Dense(out_dim, name="ad_proj")(a))
        (y,) = get_labels(batch, schema, 1)
        if training:
            return self.resolve_loss()(y, u, a), {
                "pos_cos": jnp.mean(jnp.sum(u * a, axis=1) * y)}
        return {"user": u, "ad": a, "label": y}


# reference class name alias (dssm_bert.BertModel)
BertModel = DssmEncoder
