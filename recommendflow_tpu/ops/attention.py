"""Attention layers (parity: backend/layers/attention_layers.py:10-195 +
layer_utils.py:4-38).

Pure jnp + flax.linen; masking uses a large-negative fill before softmax
(the reference's -2^32+1 convention, layer_utils.py:18). The SDPA core is
the seam where the Pallas flash-attention kernel slots in
(ops/pallas/flash_attention.py) — same signature, chosen by `use_pallas`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def scaled_dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                                 mask: Optional[jnp.ndarray] = None,
                                 use_pallas: bool = False) -> jnp.ndarray:
    """SDPA over [..., L, D] with optional mask (True = valid): either a
    key mask [..., Lk] (broadcast over query positions) or a full attention
    mask with an explicit query axis — mask.ndim == q.ndim, broadcastable
    to the [..., Lq, Lk] logits (UniLM seq2seq masking uses this).

    Parity: layer_utils.py:4-24 (scale by sqrt(dk), -inf masking, softmax).
    """
    full_mask = mask is not None and mask.ndim == q.ndim
    if use_pallas:
        if full_mask:
            raise ValueError(
                "use_pallas supports key masks only; got a full attention "
                "mask of shape %s" % (mask.shape,))
        from recommendflow_tpu.ops.pallas.flash_attention import flash_attention
        # the kernel wants rank-4 [B, H, L, D] and a [B, Lk] key mask;
        # normalize the vanilla-path shapes ([..., L, D] + broadcastable mask)
        if q.ndim == 3:
            out = flash_attention(q[:, None], k[:, None], v[:, None],
                                  None if mask is None else mask.reshape(q.shape[0], -1))
            return out[:, 0]
        if q.ndim == 4:
            kmask = None
            if mask is not None:
                kmask = mask.reshape(mask.shape[0], -1) if mask.ndim <= 3 else None
                if kmask is None:
                    raise ValueError(
                        "use_pallas supports key masks [B, Lk]/[B, 1, Lk] only; "
                        "got a full attention mask of shape %s" % (mask.shape,))
            return flash_attention(q, k, v, kmask)
        raise ValueError(f"use_pallas requires rank 3/4 inputs, got {q.ndim}")
    dk = jnp.asarray(k.shape[-1], q.dtype)
    logits = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(dk)
    if mask is not None:
        logits = jnp.where(mask if full_mask else mask[..., None, :],
                           logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", weights, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, L, H*D] -> [B, H, L, D] (parity: layer_utils.py:27-38)."""
    b, l, hd = x.shape
    d = hd // num_heads
    return x.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def sinusoidal_position_encoding(length: int, dim: int,
                                 dtype=jnp.float32) -> jnp.ndarray:
    """Standard sin/cos positional encoding [L, D]."""
    pos = jnp.arange(length, dtype=dtype)[:, None]
    i = jnp.arange(dim, dtype=dtype)[None, :]
    angle = pos / jnp.power(10000.0, (2 * (i // 2)) / dim)
    return jnp.where(i % 2 == 0, jnp.sin(angle), jnp.cos(angle))


class MultiHeadAttention(nn.Module):
    """Custom q/k/v projection MHA (parity: attention_layers.py:137-168)."""
    num_heads: int
    head_dim: Optional[int] = None   # default model_dim // num_heads
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, k_in: jnp.ndarray, v_in: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 use_pallas: bool = False) -> jnp.ndarray:
        model_dim = q_in.shape[-1]
        head_dim = self.head_dim or model_dim // self.num_heads
        inner = self.num_heads * head_dim
        q = split_heads(nn.Dense(inner, name="q")(q_in), self.num_heads)
        k = split_heads(nn.Dense(inner, name="k")(k_in), self.num_heads)
        v = split_heads(nn.Dense(inner, name="v")(v_in), self.num_heads)
        # mask: [B, Lk] key mask, or [B, Lq, Lk] full attention mask (both
        # get a broadcast head axis; SDPA distinguishes by rank vs q)
        kmask = mask[:, None] if mask is not None else None
        out = scaled_dot_product_attention(q, k, v, kmask, use_pallas=use_pallas)
        out = merge_heads(out)
        return nn.Dense(self.out_dim or model_dim, name="out")(out)


class SelfAttention(nn.Module):
    """Single-head self-attention with sinusoidal positions + masked mean
    pool (parity: attention_layers.py:83-134)."""
    use_position: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, l, d = x.shape
        if self.use_position:
            x = x + sinusoidal_position_encoding(l, d, x.dtype)[None]
        q = nn.Dense(d, name="q")(x)
        k = nn.Dense(d, name="k")(x)
        v = nn.Dense(d, name="v")(x)
        out = scaled_dot_product_attention(q, k, v, mask)
        if mask is None:
            return jnp.mean(out, axis=1)
        m = mask[..., None].astype(out.dtype)
        return jnp.sum(out * m, axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


def soft_attention_align(a: jnp.ndarray, b: jnp.ndarray,
                         mask_a: Optional[jnp.ndarray] = None,
                         mask_b: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ESIM soft alignment: cross-attend two sequences
    (parity: attention_layers.py:10-80 SoftAttention).

    a: [B, La, D], b: [B, Lb, D] -> (a_aligned from b, b_aligned from a).
    """
    e = jnp.einsum("bld,bmd->blm", a, b)           # [B, La, Lb]
    ea = e
    if mask_b is not None:
        ea = jnp.where(mask_b[:, None, :], e, NEG_INF)
    eb = e
    if mask_a is not None:
        eb = jnp.where(mask_a[:, :, None], e, NEG_INF)
    a_att = jax.nn.softmax(ea, axis=2)              # weights over b
    b_att = jax.nn.softmax(eb, axis=1)              # weights over a
    a_aligned = jnp.einsum("blm,bmd->bld", a_att, b)
    b_aligned = jnp.einsum("blm,bld->bmd", b_att, a)
    return a_aligned, b_aligned


def esim_enhance(x: jnp.ndarray, aligned: jnp.ndarray) -> jnp.ndarray:
    """ESIM local-inference enhancement: [x; aligned; x-aligned; x*aligned]."""
    return jnp.concatenate([x, aligned, x - aligned, x * aligned], axis=-1)


class ItemSimilarityGating(nn.Module):
    """FISSA sigmoid gate over [item, global, candidate] concat
    (parity: attention_layers.py:171-195)."""
    dropout: float = 0.0

    @nn.compact
    def __call__(self, item_emb: jnp.ndarray, global_emb: jnp.ndarray,
                 candidate_emb: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = jnp.concatenate([item_emb, global_emb, candidate_emb], axis=-1)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        gate = nn.Dense(1, name="gate")(x)
        return nn.sigmoid(gate)


class LocationBasedAttention(nn.Module):
    """FISSA LBA pooling: learnable query attends the sequence
    (parity: network_layers.py:258-298 LBA — key projection W, scaled
    (kW)·qᵀ/√d logits, padding mask, and output projection W₂ over the
    attention-pooled values; keys and values may differ like the
    reference's (k, v, mask) input triple)."""
    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 values: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = x.shape[-1]
        v = x if values is None else values
        keys = nn.Dense(d, use_bias=False, name="key")(x)   # [B, L, D]
        query = self.param("query", nn.initializers.lecun_normal(), (d, 1))
        logits = (keys @ query)[..., 0] / jnp.sqrt(float(d))  # [B, L]
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        pooled = jnp.einsum("bl,bld->bd", w, v)
        return nn.Dense(v.shape[-1], use_bias=False, name="out")(pooled)
