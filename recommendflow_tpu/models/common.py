"""Shared model helpers: input assembly for ranking/CTR models.

Ranking models consume every working non-label feature regardless of tower
(the reference's CTR guidance: set tower to one value, CONF_README.md:21).
Helpers here produce (a) the flat concat vector and (b) the [B, F, D] field
embedding tensor (same-dim features only) that FM/CIN/TabTransformer need.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from recommendflow_tpu.data.schema import BatchSchema, FeatureSlot


def input_slots(schema: BatchSchema) -> List[FeatureSlot]:
    """Every slot that contributes a pooled vector to the model input —
    including precomputed 'embedding' columns and 'image' features
    (embed_batch emits them; dropping them here silently weakened every
    ranking model that used those deals). Token/bert sequences feed text
    encoders, not the flat concat."""
    return [schema.slots[n] for n in schema.order
            if schema.slots[n].kind in ("sparse", "dense", "embedding",
                                        "image")]


def concat_all(features: Dict[str, jnp.ndarray], schema: BatchSchema) -> jnp.ndarray:
    """All pooled features in schema order -> [B, D_total]."""
    parts = [features[s.name] for s in input_slots(schema) if s.name in features]
    if not parts:
        raise ValueError("no input features produced — check working flags")
    return jnp.concatenate(parts, axis=-1)


def field_stack(features: Dict[str, jnp.ndarray], schema: BatchSchema,
                dim: Optional[int] = None) -> Tuple[jnp.ndarray, List[str]]:
    """Same-width pooled embeddings stacked to [B, F, D] for interaction
    layers. Picks the majority output width unless `dim` is given; hashing
    features contribute their two branches as two fields each."""
    sparse = [s for s in input_slots(schema) if s.kind == "sparse"]
    if not sparse:
        raise ValueError("no sparse features for field interactions")
    if dim is None:
        dim = Counter(s.dim for s in sparse).most_common(1)[0][0]
    fields, names = [], []
    for s in sparse:
        if s.dim != dim or s.name not in features:
            continue
        emb = features[s.name]                        # [B, H*dim]
        # [B, H, dim] view + one concat instead of an F-way slice+stack:
        # value-identical ([b, h] row == emb[b, h*dim:(h+1)*dim]), but the
        # concat keeps the field axis contiguous in the row-major layout
        fields.append(emb.reshape(emb.shape[0], s.num_hashes, dim))
        for h in range(s.num_hashes):
            names.append(f"{s.name}#{h}" if s.num_hashes > 1 else s.name)
    return jnp.concatenate(fields, axis=1), names


def get_labels(batch: Dict[str, jnp.ndarray], schema: BatchSchema,
               n: int = 1, training: bool = False) -> List[jnp.ndarray]:
    """First n label columns. Missing columns zero-fill for SERVING batches;
    during training they are a misconfiguration that would silently train a
    task against all-zero targets — raise instead (pass training=True)."""
    out = []
    some = next(iter(batch.values()))
    for i in range(n):
        if i < len(schema.label_names) and schema.label_names[i] in batch:
            out.append(batch[schema.label_names[i]])
        elif training:
            want = schema.label_names[i] if i < len(schema.label_names) \
                else f"<label #{i}>"
            raise ValueError(
                f"model needs {n} label columns but '{want}' is missing "
                f"from the batch (labels configured: {schema.label_names})")
        else:
            out.append(jnp.zeros(some.shape[0], jnp.float32))
    return out


def bce_probs(y_true: jnp.ndarray, p: jnp.ndarray,
              eps: float = 1e-7) -> jnp.ndarray:
    """Element-wise BCE on probabilities (clipped) — THE one copy the
    multi-task rankers share (essm/escm2 had private re-implementations)."""
    p = jnp.clip(p, eps, 1 - eps)
    return -(y_true * jnp.log(p) + (1 - y_true) * jnp.log(1 - p))


def bce_with_logits(y_true: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.maximum(logits, 0) - logits * y_true +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))
