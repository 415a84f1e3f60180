"""Pallas fused rowwise-Adagrad table update — one streaming HBM pass.

The embedding-table optimizer update is the largest dense-bandwidth consumer
of the train step (reference analogue: the Keras Adam apply over embedding
variables, backend/core of mechsihao/RecommendFlow; here it is
train/optimizers.py:rowwise_adagrad). Its minimum HBM traffic is

    read g + read p + write p (+ acc, ~W/4 smaller)  ~= 3 table passes,

and the XLA lowering of the fused jnp update measures ~9.1 ms isolated for a
768 MB bf16 table on v5e (~253 GB/s — see benchmarks/micro_table_update.py).
This kernel streams the table through VMEM in row blocks with Pallas'
automatic double-buffered pipeline and computes

    acc' = acc + mean(g^2, axis=1)          # one accumulator per stored row
    p'   = p - lr * g * rsqrt(acc' + eps)

in f32 regardless of table dtype. Semantics match
train/optimizers.py:rowwise_adagrad for 2-D [rows, width] tables (single
f32 rounding instead of the jnp path's double rounding at bf16).

MEASURED NEGATIVE RESULT — the trainer does NOT use this kernel. Interleaved
A/B on v5e (benchmarks/micro_table_update.py pallas): XLA fused 9.1 ms vs
Pallas 13.9 ms at every block size 512-2048 (>=4096 overflows the 16 MB
scoped VMEM). Calibration showed why: a plain carried x+1 over the same
bytes runs at ~250 GB/s under XLA while a minimal Pallas copy kernel tops
out at ~137 GB/s on this chip/toolchain — XLA's elementwise codegen already
saturates the achievable HBM streaming bandwidth, so the fused jnp update
(2.3 GB of traffic / 9.1 ms = 253 GB/s) has no headroom for Pallas to claim.
Kept for the record and for future toolchains where the Pallas DMA pipeline
closes the gap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Rows per grid block. Blocks are [BR, W]; at the packed 512-byte row layout
# (W = 256 bf16 or 128 f32 elems) a block is 512 KB, and the live set
# (p, g in + p out, double-buffered) stays ~3 MB — well inside ~16 MB VMEM.
_BLOCK_ROWS = 1024


def _update_kernel(p_ref, acc_ref, g_ref, p_out_ref, acc_out_ref, *,
                   lr: float, eps: float):
    g = g_ref[...].astype(jnp.float32)
    acc = acc_ref[...] + jnp.mean(g * g, axis=1, keepdims=True)
    p = p_ref[...].astype(jnp.float32) - lr * g * jax.lax.rsqrt(acc + eps)
    p_out_ref[...] = p.astype(p_out_ref.dtype)
    acc_out_ref[...] = acc


def rowwise_adagrad_update(p: jnp.ndarray, acc: jnp.ndarray, g: jnp.ndarray,
                           *, lr: float, eps: float = 1e-10,
                           block_rows: int = _BLOCK_ROWS,
                           interpret: bool = False):
    """(p [R, W], acc [R, 1] f32, g [R, W]) -> (p', acc').

    One fused streaming pass; numerics identical to the jnp path
    (f32 compute, cast back to p.dtype). Donate p and acc at the jit
    boundary — the outputs alias them.
    """
    assert p.ndim == 2 and acc.shape == (p.shape[0], 1) and g.shape == p.shape
    r, w = p.shape
    br = min(block_rows, r)
    grid = (pl.cdiv(r, br),)
    kernel = functools.partial(_update_kernel, lr=float(lr), eps=float(eps))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, w), lambda i: (i, 0)),
                  pl.BlockSpec((br, 1), lambda i: (i, 0)),
                  pl.BlockSpec((br, w), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((br, w), lambda i: (i, 0)),
                   pl.BlockSpec((br, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype),
                   jax.ShapeDtypeStruct(acc.shape, jnp.float32)],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(p, acc, g)
