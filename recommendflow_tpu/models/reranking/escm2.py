"""ESCM² reranker (fills the reference's empty models/reranking/escm2.py).

Entire-Space Counterfactual Multi-task model: CTR + CVR towers with
counterfactual CVR risk via inverse-propensity-score (IPS) weighting and an
optional doubly-robust (DR) imputation tower, plus the ESMM-style CTCVR
constraint. Labels: label_names[0] = click, [1] = conversion.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_probs as _bce_vec
from recommendflow_tpu.models.common import concat_all, get_labels
from recommendflow_tpu.ops.mlp import MLP


class Escm2(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    tower_units: Sequence[int] = (128, 64)
    dropout: float = 0.1
    counterfactual: str = "dr"       # 'ips' | 'dr'
    ctcvr_weight: float = 1.0
    cvr_weight: float = 1.0

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        x = concat_all(feats, schema)

        def tower(name, link=nn.sigmoid):
            h = MLP(list(self.tower_units), self.dropout, "relu",
                    name=f"{name}_tower")(x, training)
            return link(nn.Dense(1, name=f"{name}_head")(h)[:, 0])

        p_ctr = tower("ctr")
        p_cvr = tower("cvr")
        # imputation tower params must exist in every branch (flax init runs
        # the predict path). It regresses BCE errors in [0, ~16] — a sigmoid
        # link could never reach them (structurally biased low); softplus is
        # the non-negative unbounded link
        err_hat = tower("imp", link=nn.softplus) \
            if self.counterfactual == "dr" else None
        p_ctcvr = p_ctr * p_cvr
        y_click, y_conv = get_labels(batch, schema, 2, training=training)

        if not training:
            return {"score": p_ctcvr, "p_ctr": p_ctr, "p_cvr": p_cvr,
                    "label": y_click, "label_conv": y_conv}

        loss_ctr = jnp.mean(_bce_vec(y_click, p_ctr))
        loss_ctcvr = jnp.mean(_bce_vec(y_conv, p_ctcvr))

        # counterfactual CVR risk over the clicked subspace
        prop = jnp.clip(jax.lax.stop_gradient(p_ctr), 0.05, 1.0)
        ips = y_click / prop * _bce_vec(y_conv, p_cvr)
        if self.counterfactual == "dr":
            # doubly-robust risk: cvr_err stays DIFFERENTIABLE so the DR
            # term actually trains the CVR tower (stop-gradding it made
            # loss_cvr a constant w.r.t. p_cvr — ESCM2-DR degenerated to
            # ESMM); only the imputation REGRESSION TARGET is stop-gradded
            cvr_err = _bce_vec(y_conv, p_cvr)
            err_target = jax.lax.stop_gradient(cvr_err)
            loss_imp = jnp.mean((err_hat - err_target) ** 2 * y_click / prop)
            dr = err_hat + y_click / prop * (cvr_err - err_hat)
            loss_cvr = jnp.mean(dr) + loss_imp
        else:
            loss_cvr = jnp.mean(ips)

        total = loss_ctr + self.ctcvr_weight * loss_ctcvr + \
            self.cvr_weight * loss_cvr
        return total, {"loss_ctr": loss_ctr, "loss_ctcvr": loss_ctcvr,
                       "loss_cvr": loss_cvr}


ESCM2 = Escm2
