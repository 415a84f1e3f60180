"""Sequence-pair matching layers.

Parity: backend/layers/matching_layers.py:6-427 — MatchingLayer (pairwise
matching matrix between two sequences, dot/mul/plus/minus/concat modes, the
`abd,acd->abc` einsum) and MultiPerspective (BiMPM's four matching
strategies: full / attentive / max-attentive / max-pooling) over context
states. The reference drives MultiPerspective from BiLSTM states; recurrence
serializes on TPU, so any [B, L, D] context encoding (e.g. a transformer
block) plugs in — the matching math is encoder-agnostic.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def matching_matrix(a: jnp.ndarray, b: jnp.ndarray, mode: str = "dot"
                    ) -> jnp.ndarray:
    """Pairwise matching tensor between sequences a [B, La, D], b [B, Lb, D].

    Modes (matching_layers.py:6-131): 'dot' -> [B, La, Lb];
    'mul'/'plus'/'minus' -> [B, La, Lb, D]; 'concat' -> [B, La, Lb, 2D].
    """
    if mode == "dot":
        return jnp.einsum("abd,acd->abc", a, b)
    a_e = a[:, :, None, :]                      # [B, La, 1, D]
    b_e = b[:, None, :, :]                      # [B, 1, Lb, D]
    if mode == "mul":
        return a_e * b_e
    if mode == "plus":
        return a_e + b_e
    if mode == "minus":
        return a_e - b_e
    if mode == "concat":
        la, lb = a.shape[1], b.shape[1]
        return jnp.concatenate([
            jnp.broadcast_to(a_e, (a.shape[0], la, lb, a.shape[-1])),
            jnp.broadcast_to(b_e, (a.shape[0], la, lb, b.shape[-1]))], axis=-1)
    raise ValueError(f"unknown matching mode '{mode}' "
                     f"(dot/mul/plus/minus/concat)")


def _cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


class MultiPerspective(nn.Module):
    """BiMPM multi-perspective matching (matching_layers.py:134-427).

    Matches sequence a against sequence b with `num_perspectives` learned
    weight vectors under four strategies, each yielding [B, La, P]:
      1. full:          vs b's final state
      2. max-pooling:   max over per-position cosines
      3. attentive:     vs the cosine-attention-weighted mean of b
      4. max-attentive: vs b's highest-cosine position
    Output: [B, La, 4*P].
    """
    num_perspectives: int = 8

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray,
                 mask_a: Optional[jnp.ndarray] = None,
                 mask_b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = a.shape[-1]
        p = self.num_perspectives
        w = self.param("perspectives", nn.initializers.lecun_normal(),
                       (4, p, d))
        if mask_b is None:
            mask_b = jnp.ones(b.shape[:2], bool)
        mb = mask_b[:, None, :]                               # [B, 1, Lb]

        def weighted(x, wk):  # [B, L, D] x [P, D] -> [B, L, P, D]
            return x[:, :, None, :] * wk[None, None, :, :]

        # cosine relevance (unweighted) drives attentive strategies
        cos = _cosine(a[:, :, None, :], b[:, None, :, :])      # [B, La, Lb]
        cos = jnp.where(mb, cos, NEG_INF)

        # 1. full: against b's last valid position (mask_b defaulted to ones
        # above, so the masked path is the only path)
        lengths = jnp.maximum(mask_b.sum(axis=1), 1)
        last = jnp.take_along_axis(
            b, (lengths - 1)[:, None, None].astype(jnp.int32).repeat(d, -1),
            axis=1)[:, 0]                                      # [B, D]
        m_full = _cosine(weighted(a, w[0]),
                         (last[:, None, :] * w[0][None])[:, None])  # [B, La, P]

        # 2. max-pooling: max over positions of weighted cosines
        wa = weighted(a, w[1])[:, :, None, :, :]               # [B, La, 1, P, D]
        wb = weighted(b, w[1])[:, None, :, :, :]               # [B, 1, Lb, P, D]
        cos_pw = _cosine(wa, wb)                               # [B, La, Lb, P]
        cos_pw = jnp.where(mb[..., None], cos_pw, NEG_INF)
        # an all-padded b row would leak the NEG_INF fill straight into the
        # output (and NaN the loss downstream) — give it a finite 0 instead
        has_b = mask_b.any(axis=1)[:, None, None]
        m_max = jnp.where(has_b, jnp.max(cos_pw, axis=2), 0.0)

        # 3. attentive: cosine-weighted mean of b (cos is already masked)
        att = jax.nn.softmax(cos, axis=2)
        b_att = jnp.einsum("blm,bmd->bld", att, b)             # [B, La, D]
        m_att = _cosine(weighted(a, w[2]), weighted(b_att, w[2]))

        # 4. max-attentive: b's best-matching position
        best = jnp.argmax(cos, axis=2)                         # [B, La]
        b_best = jnp.take_along_axis(b, best[..., None].repeat(d, -1), axis=1)
        m_maxatt = _cosine(weighted(a, w[3]), weighted(b_best, w[3]))

        out = jnp.concatenate([m_full, m_max, m_att, m_maxatt], axis=-1)
        if mask_a is not None:
            out = out * mask_a[..., None]
        return out
