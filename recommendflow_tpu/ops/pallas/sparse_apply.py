"""Pallas sparse-apply: rowwise-Adagrad table update straight from SORTED
per-row gradients — one streaming pass over the table.

The XLA split-'dense' pipeline (train/optimizers.py:split_table_update)
costs three passes over the table's bytes per step (device trace, PERF.md):

    scatter-add rows into a zero-init dense cotangent   ~3.3 ms
    row-mean g^2 pass over it                           ~1.0 ms
    fused apply p' = p - lr*g*rsqrt(acc'), reads g again ~3.4 ms

XLA cannot fuse through the scatter producer, so the dense cotangent is
written once and read twice (~3.9 GB of HBM traffic at the 770 MB bench
table). This kernel never materializes it: the table streams through VMEM
in row blocks, and each block's gradient rows arrive by a dynamic-offset
DMA from the SORTED compacted gradient array (segment-summed duplicates),
assembled into the dense block with one MXU one-hot contraction:

    onehotT [MAXN, BR] = (lane_iota == uid - i*BR)
    g_block [BR, W]    = onehotT^T @ gs_window          (f32 accumulate)

Total traffic ~= 2 table passes + ~2x the touched-row bytes — a >2x cut,
which is the measured bar for Pallas (~328 GB/s streaming on this
chip/toolchain) to beat an XLA pipeline (~500-760 GB/s per op): see
PERF.md §1 and the negative result in ops/pallas/table_update.py whose
traffic was NOT reduced.

Correctness devices:
  * the DMA window [aligned_start, aligned_start+MAXN) merely COVERS block
    i's rows: rows of neighboring blocks (and the sort-padding rows, which
    carry uid = R) self-mask because their local offset uid - i*BR falls
    outside [0, BR) and matches no lane — no explicit valid-mask needed;
  * window starts are aligned DOWN to 16 rows (bf16 tile sublane count) so
    the dynamic HBM slice is tile-aligned (Mosaic rejects unaligned
    dynamic row offsets — same constraint family as embedding_bag.py);
  * if any block's rows don't fit its MAXN window, the caller's
    lax.cond falls back to the XLA dense pipeline (bit-compatible), so the
    kernel is never wrong — just bypassed on pathological id clustering.

Reference analogue: the Keras optimizer apply over embedding tables
(mechsihao/RecommendFlow backend/core); here it is the split-update
engine of train/trainer.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 16          # bf16 sublane tile; also a multiple of the f32/int32 8


def _kernel(starts_ref, uid_hbm, gs_hbm, p_ref, acc_ref,
            p_out_ref, acc_out_ref, gs_s, uid_s, sem_g, sem_u, *,
            lr: float, eps: float, block_rows: int):
    i = pl.program_id(0)
    # window starts are aligned down to _ALIGN by _compact_sorted; Mosaic
    # needs the static divisibility proof for the tiled HBM slice
    start = pl.multiple_of(starts_ref[i], _ALIGN)
    dma_g = pltpu.make_async_copy(gs_hbm.at[pl.ds(start, gs_s.shape[0])],
                                  gs_s, sem_g)
    dma_u = pltpu.make_async_copy(uid_hbm.at[pl.ds(start, uid_s.shape[0])],
                                  uid_s, sem_u)
    dma_g.start()
    dma_u.start()
    dma_g.wait()
    dma_u.wait()

    maxn = gs_s.shape[0]
    loc = uid_s[:, 0:1] - i * block_rows                    # [MAXN, 1] int32
    lanes = lax.broadcasted_iota(jnp.int32, (maxn, block_rows), 1)
    onehot_t = (lanes == loc).astype(gs_s.dtype)            # [MAXN, BR]
    # [BR, W] f32: contract the window dim on the MXU (both operands keep
    # MAXN on sublanes — no transposes, which Mosaic restricts)
    g_block = lax.dot_general(
        onehot_t, gs_s[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    acc2 = acc_ref[...] + jnp.mean(g_block * g_block, axis=1, keepdims=True)
    p2 = (p_ref[...].astype(jnp.float32)
          - lr * g_block * lax.rsqrt(acc2 + eps))
    p_out_ref[...] = p2.astype(p_out_ref.dtype)
    acc_out_ref[...] = acc2


@functools.partial(jax.jit, static_argnames=("lr", "eps", "block_rows",
                                             "maxn", "interpret"))
def sparse_adagrad_apply(p: jnp.ndarray, acc: jnp.ndarray,
                         uid: jnp.ndarray, gs: jnp.ndarray,
                         starts: jnp.ndarray, *, lr: float,
                         eps: float = 1e-10, block_rows: int = 2048,
                         maxn: int = 512, interpret: bool = False):
    """One-pass rowwise-Adagrad from compacted sorted row gradients.

    p [R, W] (R % block_rows == 0), acc [R, 1] f32, uid [N, LANES] int32
    (sorted unique touched rows broadcast across lanes; padding rows carry
    R), gs [N, W] same dtype family as compute (duplicates pre-summed),
    starts [G] int32 16-aligned window starts with
    starts[i] + maxn <= N and all of block i's rows inside its window.
    Returns (p', acc'). Untouched rows are bit-identical to the inputs.
    """
    r, w = p.shape
    grid = (r // block_rows,)
    kernel = functools.partial(_kernel, lr=float(lr), eps=float(eps),
                               block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                       # starts
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # uid stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # gs stays in HBM
            pl.BlockSpec((block_rows, w), lambda i, *_: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, w), lambda i, *_: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((maxn, w), gs.dtype),
            pltpu.VMEM((maxn, uid.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype),
                   jax.ShapeDtypeStruct(acc.shape, jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, uid, gs, p, acc)


def _compact_sorted(p, ids, g, maxn: int, block_rows: int):
    """Sort + segment-sum duplicate rows; build the kernel's window plan.

    Returns (uid2d, gs32, starts, overflow): sorted unique row ids
    broadcast to DMA lanes (padding rows carry R), f32 summed grads
    (kept f32 so the kernel squares the SAME values the XLA dense
    pipeline squares — the grad-window DMA bytes are negligible next to
    the table pass), 16-aligned per-block window starts, and a scalar
    bool that is True when some block's rows exceed its maxn window
    (caller must fall back).
    """
    from recommendflow_tpu.train.optimizers import segment_row_grads

    r = p.shape[0]
    n = ids.shape[0]
    s, order = lax.sort_key_val(ids, jnp.arange(n, dtype=jnp.int32))
    gs = jnp.take(g, order, axis=0).astype(jnp.float32)
    # shared compaction (padding segments: zero grad rows + distinct
    # out-of-bounds uids >= R, which self-mask in the kernel's
    # local-offset compare)
    summed, uid, valid = segment_row_grads(s, gs, num_rows=r)
    gs32 = summed  # stays f32: the accumulator must square unrounded sums

    g_blocks = r // block_rows
    bounds = jnp.arange(g_blocks + 1, dtype=jnp.int32) * block_rows
    edges = jnp.searchsorted(uid, bounds).astype(jnp.int32)  # [G+1]
    # BOTH the alignment round-down AND the end-of-array clamp must land on
    # an _ALIGN multiple, or the kernel's pl.multiple_of promise is a lie
    # (Mosaic would DMA a misaligned window = silently wrong gradients —
    # the interpret-blind failure class CLAUDE.md warns about)
    clamp = (max(n - maxn, 0) // _ALIGN) * _ALIGN
    starts = jnp.minimum((edges[:-1] // _ALIGN) * _ALIGN, jnp.int32(clamp))
    overflow = jnp.any(edges[1:] - starts > maxn)
    # broadcast uid across the DMA lane width: a [N] int32 slice at a
    # dynamic offset is not a legal TPU DMA shape; [N, 128] tiles are
    uid2d = jnp.broadcast_to(uid[:, None], (n, 128))
    return uid2d, gs32, starts, overflow


def split_update_pallas(p: jnp.ndarray, acc: jnp.ndarray, ids: jnp.ndarray,
                        g: jnp.ndarray, *, lr: float, eps: float = 1e-10,
                        block_rows: int = 2048, maxn: int = 512,
                        interpret: bool = False):
    """Drop-in for split_table_update(strategy='dense') on tables whose row
    count divides block_rows: Pallas one-pass kernel with a lax.cond
    fallback to the XLA dense pipeline when the id distribution clusters
    beyond the per-block window (or the batch has fewer ids than maxn)."""
    from recommendflow_tpu.train.optimizers import split_table_update

    if ids.shape[0] < maxn or p.shape[0] % block_rows:
        # window larger than the id array (or ragged table): the kernel
        # branch would not even trace — static fallback
        return split_table_update(p, acc, ids, g, lr=lr, eps=eps,
                                  strategy="dense")

    uid2d, gs32, starts, overflow = _compact_sorted(
        p, ids, g, maxn, block_rows)

    def dense_path(_):
        return split_table_update(p, acc, ids, g, lr=lr, eps=eps,
                                  strategy="dense")

    def pallas_path(_):
        return tuple(sparse_adagrad_apply(
            p, acc, uid2d, gs32, starts, lr=lr, eps=eps,
            block_rows=block_rows, maxn=maxn, interpret=interpret))

    return lax.cond(overflow, dense_path, pallas_path, None)
