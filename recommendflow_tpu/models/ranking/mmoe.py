"""MMoE multi-task ranker (fills the reference's empty models/ranking/mmoe.py).

Multi-gate mixture of experts: N expert MLPs shared across K tasks, each task
with its own softmax gate and tower head. Task labels come from the config's
label tower features in order (schema.label_names).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel
from recommendflow_tpu.models.common import bce_with_logits, concat_all, get_labels
from recommendflow_tpu.ops.mlp import MLP, ExpertsMLP


class Mmoe(RecModel):
    row_injection = True  # single full-batch embed pass (models/base.py)
    num_experts: int = 4
    num_tasks: int = 2
    expert_units: Sequence[int] = (128, 64)
    tower_units: Sequence[int] = (32,)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False):
        schema = self.schema
        feats = FeatureEmbedder(schema, name="embedder")(batch)
        x = concat_all(feats, schema)

        # experts run as one batched computation with an [E, ...] param
        # axis (MXU-friendly; shardable over a mesh 'ep' axis — expert
        # parallelism via Trainer(shard_experts=True))
        experts = ExpertsMLP(self.num_experts, list(self.expert_units),
                             self.dropout, "relu")(x, training)  # [B, E, D]

        logits = []
        for t in range(self.num_tasks):
            gate = jax.nn.softmax(nn.Dense(self.num_experts,
                                           name=f"gate{t}")(x), axis=-1)
            mixed = jnp.einsum("be,bed->bd", gate, experts)
            h = MLP(list(self.tower_units), self.dropout, "relu",
                    name=f"tower{t}")(mixed, training)
            logits.append(nn.Dense(1, name=f"head{t}")(h)[:, 0])

        ys = get_labels(batch, schema, self.num_tasks,
                        training=training)
        if training:
            losses = [bce_with_logits(y, l) for y, l in zip(ys, logits)]
            aux = {f"task{t}_loss": l for t, l in enumerate(losses)}
            return sum(losses), aux
        out = {"label": ys[0]}
        for t in range(self.num_tasks):
            out[f"score{t}"] = nn.sigmoid(logits[t])
            out[f"label{t}"] = ys[t]
        out["score"] = out["score0"]
        return out


def migrate_legacy_params(params):
    """Convert a pre-ExpertsMLP Mmoe checkpoint param tree — one
    `expert{i}` MLP subtree per expert, written before experts were batched
    into a single [E, ...] computation — into the stacked layout
    (`ExpertsMLP_0/experts` with a leading expert axis). No-op when the
    tree is already stacked. Use when restoring an old checkpoint:

        params = migrate_legacy_params(restore_pytree(path))
    """
    import re

    d = dict(params)
    expert_keys = sorted((k for k in d if re.fullmatch(r"expert\d+", k)),
                         key=lambda k: int(k[len("expert"):]))
    if not expert_keys or "ExpertsMLP_0" in d:
        return params
    subtrees = [d.pop(k) for k in expert_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subtrees)
    d["ExpertsMLP_0"] = {"experts": stacked}
    return d


MMoE = Mmoe
