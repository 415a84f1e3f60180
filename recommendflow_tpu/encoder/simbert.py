"""SimBERT training objective on the TextEncoder (UniLM seq2seq + in-batch
CLS similarity).

Capability parity with the reference's SimBERT data path (backend/utils/
generator.py:136-178 feeds a bert4keras UniLM model): a similar-sentence
pair (t1, t2) is packed as [CLS] t1 [SEP] t2 [SEP] in both orders
(encoder/generators.py:simbert_batches); the model trains on
  1. a seq2seq LM loss — predict each segment-1 token from the UniLM-masked
     hidden state of the PREVIOUS position (weight-tied to the token
     embedding table), and
  2. an in-batch similarity loss over CLS vectors — rows 2i and 2i+1 are
     mutual positives, everything else in the batch is a negative (the
     CoSENT-free SimBERT variant of the in-batch sampled softmax the
     matching losses already implement).
Everything is jit-compatible: static shapes, no Python control flow on
traced values.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def unilm_lm_loss(hidden: jnp.ndarray, tok_embedding: jnp.ndarray,
                  token_ids: jnp.ndarray,
                  segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Seq2seq LM loss under the UniLM mask.

    hidden: [B, L, D] from TextEncoder(..., seq2seq=True,
    return_sequence=True); tok_embedding: [V, D] (weight tying — logits are
    hidden @ E^T); predicts token_ids[:, t] for every position t whose
    segment id is 1 (the target sentence, including its final [SEP]) from
    hidden[:, t-1]. Mean over predicted tokens.
    """
    logits = jnp.einsum("bld,vd->blv", hidden[:, :-1], tok_embedding)
    targets = token_ids[:, 1:]
    # predict positions whose TARGET token sits in segment 1 and is real
    want = (segment_ids[:, 1:] == 1) & (targets > 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = want.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def simbert_similarity_loss(cls_vecs: jnp.ndarray,
                            scale: float = 30.0) -> jnp.ndarray:
    """In-batch CLS similarity: rows 2i and 2i+1 are mutual positives.

    Normalized dot products, self-similarity masked out, symmetric
    softmax-CE toward the partner row (SimBERT's retrieval objective).
    cls_vecs: [2B, D].
    """
    assert cls_vecs.shape[0] % 2 == 0, \
        "simbert similarity needs paired rows [2B, D] (2i <-> 2i+1)"
    v = cls_vecs / jnp.maximum(
        jnp.linalg.norm(cls_vecs, axis=-1, keepdims=True), 1e-12)
    sims = (v @ v.T) * scale
    n = sims.shape[0]
    sims = jnp.where(jnp.eye(n, dtype=bool), -1e9, sims)
    partner = jnp.arange(n) ^ 1          # 2i <-> 2i+1
    logp = jax.nn.log_softmax(sims, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, partner[:, None], axis=-1))


def simbert_loss(model, variables, batch: Dict[str, jnp.ndarray],
                 lm_weight: float = 1.0, sim_weight: float = 1.0,
                 training: bool = True,
                 rngs=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined SimBERT objective for one simbert_batches batch.

    Returns (loss, aux) following the framework's model contract. The CLS
    similarity vectors are hidden[:, 0] of the SAME UniLM-masked pass:
    under the seq2seq mask every segment-0 position (including [CLS])
    attends ONLY segment-0 keys (ops/transformer.py UniLM mask;
    tests/test_simbert.py:test_unilm_mask_causality), so row 2i's CLS
    encodes exactly t1 and row 2i+1's exactly t2 — true per-sentence
    embeddings, matching the distribution single-sentence serving encodes
    see. (A bidirectional pass over the concatenated pair would let both
    sentences into every CLS, making the in-batch objective trivially
    satisfiable by content hashing — and would cost a second forward.)
    """
    tok, seg = batch["tok"], batch["seg"]
    hidden = model.apply(variables, tok, seg, training=training,
                         seq2seq=True, return_sequence=True, rngs=rngs)
    emb = variables["params"]["tok_emb"]["embedding"]
    lm = unilm_lm_loss(hidden, emb, tok, seg)
    sim = simbert_similarity_loss(hidden[:, 0])
    loss = lm_weight * lm + sim_weight * sim
    return loss, {"lm_loss": lm, "sim_loss": sim}
