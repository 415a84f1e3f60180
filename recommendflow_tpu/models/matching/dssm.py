"""DSSM / two-tower recall model.

Capability parity with the reference's Dssm (models/matching/dssm.py:11-64)
implemented as intended (the reference's call() bypasses its own
preprocessor/towers — SURVEY §2.6): per-tower feature embedding -> MLP tower
(selu+BN by default) -> L2 normalize -> in-batch loss when training, an
embedding dict {'user','ad','label',...} when predicting (the dict feeds the
retrieval evaluator directly, as in predict.py:49-85).

TPU notes: both towers run in one jitted graph; the embedding gathers are
grouped per dim (ops/embedding.py); tower matmuls hit the MXU in bf16 when
dtype is set; batch is fixed-shape.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.ops.mlp import MLP, l2_normalize


class Dssm(RecModel):
    """Two-tower DSSM. Networks config keys: tower_units (default
    [1024,512,256] like the reference dssm.py:25-26), dropout, activation,
    embedding_dim (final projection width, 0 = last tower unit)."""
    row_injection = True  # single full-batch embed pass (models/base.py)
    tower_units: Optional[Sequence[int]] = None
    dropout: float = 0.3
    activation: str = "selu"
    use_bn: bool = True

    def _units(self) -> Sequence[int]:
        units = self.tower_units or self.network_conf("tower_units") or [1024, 512, 256]
        out_dim = int(self.network_conf("embedding_dim") or 0)
        units = list(units)
        if out_dim and units[-1] != out_dim:
            units.append(out_dim)
        return units

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        embedder = FeatureEmbedder(schema, name="embedder")
        units = self._units()

        # one fused gather for BOTH towers: per-tower gathers cost a second
        # full-table backward scatter pass (~3.2 ms/step at bench scale)
        user_in, ad_in = embedder.tower_vectors(batch, ("user", "ad"))

        compute_dtype = self.network_conf("compute_dtype")
        user_tower = MLP(units, self.dropout, self.activation,
                         use_bn=self.use_bn, final_activation="linear",
                         compute_dtype=compute_dtype, name="user_tower")
        ad_tower = MLP(units, self.dropout, self.activation,
                       use_bn=self.use_bn, final_activation="linear",
                       compute_dtype=compute_dtype, name="ad_tower")

        u = l2_normalize(user_tower(user_in, training))
        a = l2_normalize(ad_tower(ad_in, training))

        label_name = schema.label_names[0] if schema.label_names else "label"
        y_true = batch.get(label_name, jnp.ones(u.shape[0], u.dtype))

        # unconditional so the 'freq' collection exists at init; only train
        # steps advance the stream
        logq = self.logq_correction(batch, update=training)
        if training:
            loss_fn = self.resolve_loss()
            loss = loss_fn(y_true, u, a) if logq is None else \
                loss_fn(y_true, u, a, logq=logq)
            aux = {"pos_cos": jnp.sum(jnp.sum(u * a, axis=1) * y_true)
                   / jnp.maximum(jnp.sum(y_true), 1.0)}
            return loss, aux
        out: Dict[str, jnp.ndarray] = {"user": u, "ad": a, "label": y_true}
        # pass through any extra label-tower ids (ad_id/imei analogues,
        # reference dssm.py:54-60)
        for name in schema.label_names[1:]:
            if name in batch:
                out[name] = batch[name]
        return out


class TwoTower(Dssm):
    """Alias with a neutral name for non-ad domains."""
    pass
