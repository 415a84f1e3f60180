"""Transformer blocks + a compact text encoder (the bert4keras replacement).

Parity targets: FFN/TransformerEncoder (network_layers.py:301-352),
TabTransformer blocks (blocks/transformer.py:8-26), BERT tower builders with
pooling position / nth-layer output selection (blocks/bert.py:11-135,
encoder/bert_encoder.py:223-283). The encoder is a standard pre/post-LN
transformer over token ids — small maxlen (<=512) per the reference's usage,
so vanilla SDPA is fine; the Pallas flash path is available via use_pallas.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from recommendflow_tpu.ops.attention import MultiHeadAttention, sinusoidal_position_encoding


class FeedForward(nn.Module):
    """Position-wise FFN (parity: network_layers.py:301-318)."""
    hidden: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        from recommendflow_tpu.ops.mlp import get_activation
        d = self.out_dim or x.shape[-1]
        h = get_activation(self.activation)(nn.Dense(self.hidden)(x))
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(d)(h)


class TransformerEncoderBlock(nn.Module):
    """MHA + LN + residual + FFN (parity: network_layers.py:319-352,
    post-LN like the reference/BERT)."""
    num_heads: int
    ffn_hidden: int
    dropout: float = 0.0
    head_dim: Optional[int] = None       # default model_dim // num_heads
    ffn_activation: str = "gelu"         # reference FFN uses relu (network_layers.py:310)
    ln_epsilon: float = 1e-6             # BERT checkpoints use 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 training: bool = False, use_pallas: bool = False) -> jnp.ndarray:
        att = MultiHeadAttention(self.num_heads, head_dim=self.head_dim,
                                 name="mha")(
            x, x, x, mask, use_pallas=use_pallas)
        att = nn.Dropout(self.dropout, deterministic=not training)(att)
        x = nn.LayerNorm(name="ln1", epsilon=self.ln_epsilon)(x + att)
        ffn = FeedForward(self.ffn_hidden, dropout=self.dropout,
                          activation=self.ffn_activation, name="ffn")(
            x, training)
        ffn = nn.Dropout(self.dropout, deterministic=not training)(ffn)
        return nn.LayerNorm(name="ln2", epsilon=self.ln_epsilon)(x + ffn)


class TextEncoder(nn.Module):
    """Compact BERT-style encoder: token + segment + position embeddings,
    N encoder blocks, configurable pooling (cls/avg/max/sum/index) and
    out_layer selection (parity surface: blocks/bert.py:68-135,
    bert_encoder.py:223-283)."""
    vocab_size: int
    num_layers: int = 4
    model_dim: int = 256
    num_heads: int = 4
    ffn_hidden: int = 1024
    max_len: int = 64
    dropout: float = 0.1
    pooling: str = "cls"          # cls | avg | max | sum | pos
    out_layer: int = -1           # which block's output to pool
    pool_pos: int = 0             # for pooling == 'pos'
    pos_type: str = "sinusoidal"  # 'learned' == BERT-checkpoint layout
    type_vocab_size: int = 2      # segment/token-type vocabulary
    ln_epsilon: float = 1e-6      # BERT checkpoints use 1e-12
    ffn_activation: str = "gelu"  # BERT checkpoints use erf 'gelu_exact'

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray,
                 segment_ids: Optional[jnp.ndarray] = None,
                 training: bool = False,
                 use_pallas: bool = False,
                 seq2seq: bool = False,
                 return_sequence: bool = False) -> jnp.ndarray:
        """seq2seq=True applies the UniLM mask derived from segment ids
        (SimBERT training, reference generator.py:136-178 data layout):
        segment-0 tokens attend bidirectionally within segment 0, while a
        segment-1 token at position i attends segment 0 plus segment-1
        positions <= i — BERT-as-seq2seq without an architecture change.
        return_sequence=True skips pooling and returns [B, L, D] hidden
        states (the LM head in encoder/simbert.py consumes these)."""
        if token_ids.shape[1] > self.max_len:
            raise ValueError(
                f"sequence length {token_ids.shape[1]} exceeds the "
                f"encoder's configured max_len={self.max_len} — truncate "
                "at tokenization (Tokenizer.encode_batch maxlen)")
        mask = token_ids > 0
        x = nn.Embed(self.vocab_size, self.model_dim, name="tok_emb")(token_ids)
        # segment embedding is created unconditionally (zeros when absent) so
        # the param tree — and therefore checkpoints — does not depend on
        # whether a particular call site passes segment ids
        seg = (segment_ids if segment_ids is not None
               else jnp.zeros_like(token_ids))
        x = x + nn.Embed(self.type_vocab_size, self.model_dim,
                         name="seg_emb")(seg)
        if self.pos_type == "learned":
            pos = self.param("pos_emb", nn.initializers.normal(0.02),
                             (self.max_len, self.model_dim))
            x = x + pos[None, :token_ids.shape[1]].astype(x.dtype)
        else:
            x = x + sinusoidal_position_encoding(
                token_ids.shape[1], self.model_dim, x.dtype)[None]
        x = nn.LayerNorm(name="emb_ln", epsilon=self.ln_epsilon)(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)

        attn_mask = mask
        if seq2seq:
            # UniLM mask [B, Lq, Lk]: key j visible to query i iff j is a
            # real token AND (j is in segment 0 OR j <= i)
            l = token_ids.shape[1]
            tri = (jnp.arange(l)[None, :, None]        # i
                   >= jnp.arange(l)[None, None, :])    # j
            attn_mask = mask[:, None, :] & ((seg == 0)[:, None, :] | tri)
        layer_outputs = []
        for i in range(self.num_layers):
            x = TransformerEncoderBlock(
                self.num_heads, self.ffn_hidden, self.dropout,
                ffn_activation=self.ffn_activation,
                ln_epsilon=self.ln_epsilon,
                name=f"block{i}")(x, attn_mask, training, use_pallas)
            layer_outputs.append(x)
        out = layer_outputs[self.out_layer]
        if return_sequence:
            return out

        m = mask[..., None].astype(out.dtype)
        if self.pooling == "cls":
            return out[:, 0]
        if self.pooling == "pos":
            return out[:, self.pool_pos]
        if self.pooling == "avg":
            return jnp.sum(out * m, axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        if self.pooling == "sum":
            return jnp.sum(out * m, axis=1)
        if self.pooling == "max":
            return jnp.max(jnp.where(m > 0, out, -1e9), axis=1)
        raise ValueError(f"unknown pooling '{self.pooling}'")


class TabTransformer(nn.Module):
    """Transformer blocks over categorical field embeddings
    (parity: blocks/transformer.py:8-26 create_tab_transformer)."""
    num_blocks: int = 2
    num_heads: int = 4
    ffn_hidden: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, field_emb: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        x = field_emb                                     # [B, F, D]
        for i in range(self.num_blocks):
            x = TransformerEncoderBlock(
                self.num_heads, self.ffn_hidden, self.dropout,
                name=f"block{i}")(x, None, training)
        b, f, d = x.shape
        return x.reshape(b, f * d)


class ImageEncoder(nn.Module):
    """ViT-style image encoder (completes the reference's empty scaffold
    backend/encoder/vit_encoder.py:1 the way the empty model files were
    completed as real models): patchify -> linear patch embedding + learned
    [CLS] + learned position embeddings -> N transformer blocks -> pooled
    [B, out_dim] image representation.

    Input: [B, S, S, 3] float pixels (the image deal's host-decoded layout,
    data/schema.py); S must be a multiple of patch. The cheap alternative
    (linear patch projection + mean pool) remains the image deal's default —
    ops/embedding.py:patch_embed; this module is for image towers that
    deserve attention over patches.
    """
    out_dim: int = 128
    patch: int = 8
    num_layers: int = 2
    model_dim: int = 128
    num_heads: int = 4
    ffn_hidden: int = 512
    dropout: float = 0.1
    pooling: str = "cls"          # cls | avg

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b, s, _, c = images.shape
        p, n = self.patch, images.shape[1] // self.patch
        x = images.reshape(b, n, p, n, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, n * n, p * p * c)
        x = nn.Dense(self.model_dim, name="patch_proj")(x)   # [B, N, D]
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.model_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.model_dim)), x],
                            axis=1)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, n * n + 1, self.model_dim))
        x = nn.LayerNorm(name="emb_ln")(x + pos)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        for i in range(self.num_layers):
            # no padding exists over fixed-size patch grids: mask=None
            x = TransformerEncoderBlock(
                self.num_heads, self.ffn_hidden, self.dropout,
                name=f"block{i}")(x, None, training)
        pooled = x[:, 0] if self.pooling == "cls" else jnp.mean(x, axis=1)
        return nn.Dense(self.out_dim, name="head")(pooled)
