"""Blocked (flash) attention kernel for TPU.

Online-softmax SDPA over key/value blocks: running max + running sum keep
the full [Lq, Lk] score matrix out of memory (only a [BQ, BK] tile lives in
VMEM at a time). Used by the text-encoder / ESIM paths via
`scaled_dot_product_attention(..., use_pallas=True)` (ops/attention.py).

Shapes: q [B, H, Lq, D], k/v [B, H, Lk, D], optional key mask [B, Lk]
(True = valid). D and the block sizes must respect TPU tiling (last dim
a multiple of 128 is ideal; smaller D works via implicit padding by Mosaic
for the MXU ops since tiles are VMEM-resident blocks, not HBM slices).

MEASURED ON v5e (steady-state, interleaved, f32 in / bf16-pass matmuls):
XLA's fused SDPA beats this kernel at every reference-relevant shape —
[512,4,32,64]: 2.4-3.7 vs 4.1-4.5 ms; [32,8,512,64]: 4.4 vs 7.3 ms;
[8,8,2048,64]: 11.8 vs 22.9 ms. Consistent with the chip's Pallas-pipeline
vs XLA streaming gap (CLAUDE.md HBM calibration). `use_pallas` therefore
stays OFF by default; the kernel is kept correct (interpret + on-device
tests) for toolchains where the gap closes and as the seam for a future
sequence-length regime that XLA mishandles.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BQ = 128
DEFAULT_BK = 128


def _fa_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, acc, m_scr, l_scr,
               *, scale: float, blocks_k: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0]                                     # [BQ, D]
    k = k_ref[0]                                     # [BK, D]
    v = v_ref[0]                                     # [BK, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0] > 0                          # [1, BK] int mask row
    s = jnp.where(valid, s, NEG_INF)                 # broadcast over rows

    m_prev = m_scr[:, 0:1]                           # [BQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)                           # [BQ, BK]
    corr = jnp.exp(m_prev - m_new)                   # [BQ, 1]
    l_new = corr * l_scr[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
    acc[:] = acc[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new

    @pl.when(kb == blocks_k - 1)
    def _():
        out_ref[0] = (acc[:] / jnp.maximum(l_scr[:, 0:1], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    block_q: int = DEFAULT_BQ, block_k: int = DEFAULT_BK,
                    interpret: bool = False) -> jnp.ndarray:
    """SDPA with online softmax. q [B, H, Lq, D]; k, v [B, H, Lk, D];
    mask [B, Lk] or [B, 1, Lk] (True = key valid). Returns [B, H, Lq, D]."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    orig_lq = lq
    scale = 1.0 / (d ** 0.5)

    bq = min(block_q, max(lq, 8))
    bk = min(block_k, max(lk, 8))
    lq_pad = pl.cdiv(lq, bq) * bq
    lk_pad = pl.cdiv(lk, bk) * bk

    if mask is None:
        mask = jnp.ones((b, lk), dtype=bool)
    mask = mask.reshape(b, lk)
    # fold query/key padding into the key mask: padded keys invalid
    if lk_pad != lk:
        mask = jnp.pad(mask, ((0, 0), (0, lk_pad - lk)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, 0)))
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0)))
        lq = lq_pad
    mask_i = mask.astype(jnp.int32)[:, None, :]      # [B, 1, Lk]

    bh = b * h
    qf = q.reshape(bh, lq, d)
    kf = k.reshape(bh, lk_pad, d)
    vf = v.reshape(bh, lk_pad, d)
    blocks_q = lq // bq
    blocks_k = lk_pad // bk

    grid = (bh, blocks_q, blocks_k)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, blocks_k=blocks_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda g, i, j, _bh=h: (g // _bh, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, mask_i)
    out = out.reshape(b, h, lq, d)
    return out[:, :, :orig_lq, :]
