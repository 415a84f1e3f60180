"""Pooling layers: k-max and MatchPyramid dynamic pooling.

Parity: backend/layers/pooling_layers.py:6-124 (KMaxPooling via top_k,
DynamicPoolingLayer via strided max-pool on the match matrix).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kmax_pooling(x: jnp.ndarray, k: int, axis: int = -1) -> jnp.ndarray:
    """Top-k values along axis, order preserved by magnitude rank
    (parity: pooling_layers.py:6-27)."""
    moved = jnp.moveaxis(x, axis, -1)
    top, _ = jax.lax.top_k(moved, k)
    return jnp.moveaxis(top, -1, axis)


def dynamic_max_pooling(match: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """MatchPyramid dynamic pooling: max-pool a [B, H, W] (or [B, H, W, C])
    match matrix to a fixed [B, out_h, out_w(, C)] grid
    (parity: pooling_layers.py:30-124 without gather_nd index juggling —
    reduce_window handles ragged strides by padded pooling)."""
    squeeze = match.ndim == 3
    if squeeze:
        match = match[..., None]
    b, h, w, c = match.shape
    # pad H, W up to multiples of the output grid
    ph = -(-h // out_h) * out_h
    pw = -(-w // out_w) * out_w
    # EDGE padding: windows that spill past the real matrix re-pool the
    # last row/column (the reference's dynamic pooling stretches windows to
    # cover real data; -inf padding emitted constant 0s for those windows,
    # which beat every real value on all-negative match matrices)
    padded = jnp.pad(match, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)),
                     mode="edge")
    kh, kw = ph // out_h, pw // out_w
    pooled = jax.lax.reduce_window(
        padded, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, kh, kw, 1),
        padding="VALID")
    return pooled[..., 0] if squeeze else pooled
