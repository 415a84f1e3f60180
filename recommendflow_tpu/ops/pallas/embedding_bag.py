"""Pallas TPU kernels for embedding lookup: pipelined row gather + RMW
scatter-add.

Why: XLA's gather/scatter on TPU costs ~110/220 ns PER ROW regardless of
locality (measured on v5e: 87k-row gather from a 6M x 64 table = 9.3 ms for
22 MB — 2.3 GB/s effective; the dense-grad scatter-add = ~19 ms). The row
cost is fixed overhead, not bandwidth. These kernels stream rows with deep
asynchronous DMA pipelining (NBUF outstanding copies) to hide the per-row
latency, the classic TPU double-buffering pattern (pallas_guide.md
§Async DMA / §Double Buffering).

  gather_rows(table, ids)            -> [N, D]   (forward)
  scatter_add_rows(ids, grads, rows) -> [R, D]   (backward accumulate)

`take_rows` wraps them as a custom-VJP drop-in for jnp.take(axis=0); the
backward pre-combines duplicate ids with an XLA sort+segment-sum so the RMW
pipeline never sees the same row twice in its in-flight window.

Measured reality check (v5e, 87k x 512-byte rows from a 1.5M-row bf16 table,
benchmarks/micro_pallas_scatter.py): XLA take 35 ns/row, XLA sorted
scatter-add 86 ns/row; this gather 128 ns/row, this RMW scatter 1154 ns/row.
At single-row granularity the scalar core issuing DMA descriptors (3 DMAs +
2 semaphore waits per row) is the bottleneck, not HBM — XLA's native
gather/scatter wins the dim<128 packed regime and is what ops/embedding.py
uses. These kernels remain the right shape for dim>=128 rows (>=1 full tile
per DMA) where the descriptor cost amortizes.

bf16 tables: Mosaic cannot DMA a single bf16 row (tiled HBM layout packs 2
logical rows per sublane word), so both kernels run on zero-copy f32 byte
views of the same buffers; the RMW add bitcasts in-register to bf16 — exact,
since table and grad rows share the byte layout (_as_f32_view).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows processed per grid program / outstanding DMA depth
CHUNK = 512
NBUF = 32


def _as_f32_view(x: jnp.ndarray) -> jnp.ndarray:
    """[.., W] bf16 -> [.., W//2] f32 zero-copy byte view.

    Mosaic cannot DMA a single bf16 row: the tiled HBM layout packs 2
    logical rows per sublane word, so a [1, W] bf16 slice is neither
    contiguous nor tile-aligned ("slice along dim 0 must be aligned to
    tiling (8)"). An f32 view of the same bytes has packing 1 — single-row
    slices with minor dim % 128 == 0 are legal DMA endpoints.
    """
    return jax.lax.bitcast_convert_type(
        x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2)), jnp.float32)


def _from_f32_view(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _as_f32_view: [.., W] f32 -> [.., 2*W] bf16."""
    y = jax.lax.bitcast_convert_type(x, jnp.bfloat16)
    return y.reshape(y.shape[:-2] + (y.shape[-2] * 2,))


def _check_row_dma(table: jnp.ndarray, interpret: bool) -> None:
    """On hardware a single-row HBM DMA must be exactly one (8,128) f32 tile:
    in the tiled layout a [1, W] slice with W > 128 f32 straddles tiles and
    is not contiguous (Mosaic: 'slice along dim 0 must be aligned to
    tiling'). Verified on v5e: f32 W=128 and bf16 W=256 (via f32 view) work;
    f32 W=256 does not."""
    if interpret:
        return
    w_f32 = table.shape[1] * jnp.dtype(table.dtype).itemsize // 4
    if w_f32 != 128:
        raise NotImplementedError(
            f"pallas row kernels require 512-byte rows on TPU (one DMA tile);"
            f" got {table.shape[1]} x {jnp.dtype(table.dtype).name}. Use the"
            f" XLA path (ops/embedding.py take_rows) for other widths.")


def _gather_kernel(ids_ref, n_ref, table_ref, out_ref, sems):
    """One program gathers CHUNK rows: DMA j+NBUF is issued while DMA j is
    awaited — NBUF row-copies stay in flight."""
    base = pl.program_id(0) * CHUNK
    n_total = n_ref[0]

    def issue(j):
        # clamp: padded tail rows re-fetch row 0 (discarded by caller)
        idx = jnp.where(base + j < n_total, ids_ref[base + j], 0)
        pltpu.make_async_copy(
            table_ref.at[idx], out_ref.at[j], sems.at[j % NBUF]).start()

    # warm-up: fill the pipeline
    for j in range(NBUF):
        issue(j)

    def body(j, _):
        # wait for DMA j, then issue DMA j+NBUF into the freed semaphore slot
        pltpu.make_async_copy(
            table_ref.at[0], out_ref.at[j], sems.at[j % NBUF]).wait()

        @pl.when(j + NBUF < CHUNK)
        def _():
            issue(j + NBUF)
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jnp.ndarray, ids: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """table [R, D] (HBM), ids [N] int32 -> [N, D]. D must be a multiple of
    128 lanes' dtype packing; any D works via the row-copy DMA."""
    _check_row_dma(table, interpret)
    if table.dtype == jnp.bfloat16 and not interpret:
        # bf16 single-row DMA is illegal (tiled sublane packing) — gather on
        # the f32 byte view and re-view the result (see _as_f32_view)
        return _from_f32_view(gather_rows(_as_f32_view(table), ids,
                                          interpret=interpret))
    n = ids.shape[0]
    n_pad = pl.cdiv(n, CHUNK) * CHUNK
    ids_pad = jnp.zeros((n_pad,), jnp.int32).at[:n].set(ids.astype(jnp.int32))
    n_arr = jnp.asarray([n], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                  # ids, n
        grid=(n_pad // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # table stays in HBM
        out_specs=pl.BlockSpec((CHUNK, table.shape[1]),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, table.shape[1]), table.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids_pad, n_arr, table)
    return out[:n]


ACC_SLOTS = 2 * NBUF  # slot-reuse gap of 2*NBUF iterations hides write latency


def _scatter_kernel(ids_ref, n_ref, grads_ref, table_in_ref, table_out_ref,
                    acc, gbuf, sems, gsems, out_sems, *,
                    sum_dtype=None):
    """RMW accumulate: for each (unique) id, DMA the table row AND its grad
    row in, add, DMA the sum back. Reads pipeline NBUF ahead over 2*NBUF acc
    slots: the read that reuses a slot waits the write issued 2*NBUF
    iterations earlier, so the wait is normally already satisfied. Grad rows
    are DMA'd from HBM (the whole [N, D] cotangent array cannot live in
    VMEM at production N). ids MUST be unique (caller segment-sums
    duplicates), so no two in-flight operations touch the same table row."""
    n_total = n_ref[0]
    max_n = ids_ref.shape[0]

    def wait_write(j):
        # waits the write DMA that used slot j % ACC_SLOTS (the descriptor
        # only carries the transfer size)
        pltpu.make_async_copy(acc.at[j % ACC_SLOTS, 0],
                              table_out_ref.at[0],
                              out_sems.at[j % ACC_SLOTS]).wait()

    def issue_read(j, static_warmup: bool):
        @pl.when(j < n_total)
        def _():
            if not static_warmup:
                # slot was last used by write j - ACC_SLOTS
                @pl.when(j >= ACC_SLOTS)
                def _():
                    wait_write(j - ACC_SLOTS)
            pltpu.make_async_copy(
                table_out_ref.at[ids_ref[j]], acc.at[j % ACC_SLOTS, 0],
                sems.at[j % ACC_SLOTS]).start()
            pltpu.make_async_copy(
                grads_ref.at[j], gbuf.at[j % ACC_SLOTS, 0],
                gsems.at[j % ACC_SLOTS]).start()

    for j in range(NBUF):
        issue_read(j, static_warmup=True)

    def body(j, _):
        @pl.when(j < n_total)
        def _():
            pltpu.make_async_copy(
                table_out_ref.at[0], acc.at[j % ACC_SLOTS, 0],
                sems.at[j % ACC_SLOTS]).wait()
            pltpu.make_async_copy(
                grads_ref.at[0], gbuf.at[j % ACC_SLOTS, 0],
                gsems.at[j % ACC_SLOTS]).wait()
            # scratch is [SLOTS, 1, W]: the dynamic slot index stays on the
            # untiled leading dim (Mosaic rejects dynamic sublane indices).
            # For bf16 tables the buffers are f32 byte views (DMA legality);
            # the add happens in the real dtype via an in-register bitcast —
            # exact, since table/grad rows share the same byte layout.
            if sum_dtype is not None:
                s = (pltpu.bitcast(acc[j % ACC_SLOTS], sum_dtype) +
                     pltpu.bitcast(gbuf[j % ACC_SLOTS], sum_dtype))
                acc[j % ACC_SLOTS] = pltpu.bitcast(s, jnp.float32)
            else:
                acc[j % ACC_SLOTS] = acc[j % ACC_SLOTS] + gbuf[j % ACC_SLOTS]
            pltpu.make_async_copy(
                acc.at[j % ACC_SLOTS, 0],
                table_out_ref.at[ids_ref[j]],
                out_sems.at[j % ACC_SLOTS]).start()
            issue_read(j + NBUF, static_warmup=False)
        return 0

    jax.lax.fori_loop(0, max_n, body, 0)

    # drain the last min(ACC_SLOTS, n_total) outstanding writes; iterations
    # beyond n_total never issued a write, so waiting on them would hang
    lo = jnp.maximum(n_total - ACC_SLOTS, 0)

    def drain(j, _):
        @pl.when((j >= lo) & (j < n_total))
        def _():
            wait_write(j)
        return 0

    jax.lax.fori_loop(0, max_n, drain, 0)


def scatter_add_rows(ids: jnp.ndarray, grads: jnp.ndarray, table: jnp.ndarray,
                     n_valid=None, interpret: bool = False) -> jnp.ndarray:
    """table[ids] += grads, in place via aliasing. ids [N] MUST be unique
    (pre-combine duplicates); grads [N, D]; returns the updated table.
    `n_valid` (scalar, may be traced) limits processing to the first entries
    — padded tails beyond it are never touched, so duplicate-padded ids
    cannot race a real row's read-modify-write."""
    _check_row_dma(table, interpret)
    n = ids.shape[0]
    n_arr = jnp.asarray([n], jnp.int32) if n_valid is None else \
        jnp.asarray(n_valid, jnp.int32).reshape(1)

    sum_dtype = None
    orig_dtype = table.dtype
    if table.dtype == jnp.bfloat16 and not interpret:
        # single bf16 rows are not DMA-able (tiled sublane packing); run the
        # whole kernel on f32 byte views and add via in-register bitcast
        sum_dtype = jnp.bfloat16
        table = _as_f32_view(table)
        grads = _as_f32_view(grads.astype(jnp.bfloat16))
    else:
        grads = grads.astype(table.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),    # grads (HBM, DMA'd)
                  pl.BlockSpec(memory_space=pl.ANY)],   # table (aliased)
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((ACC_SLOTS, 1, grads.shape[1]), table.dtype),
                        pltpu.VMEM((ACC_SLOTS, 1, grads.shape[1]), grads.dtype),
                        pltpu.SemaphoreType.DMA((ACC_SLOTS,)),
                        pltpu.SemaphoreType.DMA((ACC_SLOTS,)),
                        pltpu.SemaphoreType.DMA((ACC_SLOTS,))],
    )
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, sum_dtype=sum_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={3: 0},    # 2 scalar-prefetch + grads, table -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.astype(jnp.int32), n_arr, grads, table)
    if sum_dtype is not None:
        out = _from_f32_view(out)
    assert out.dtype == orig_dtype, (out.dtype, orig_dtype)
    return out


def _combine_duplicates(ids: jnp.ndarray, grads: jnp.ndarray):
    """Sort ids, segment-sum cotangents of equal ids. Returns (padded unique
    ids, summed cotangents, n_uniq); the scatter kernel must only process
    the first n_uniq entries (scatter_add_rows n_valid) — padded tails
    repeat id 0 and would otherwise race row 0's real read-modify-write."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = grads[order]
    # head of each run of equal ids
    head = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head) - 1                      # run index per position
    summed = jax.ops.segment_sum(sg, seg, num_segments=n)
    uniq = jax.ops.segment_max(sid, seg, num_segments=n)
    n_uniq = head.sum()
    valid = jnp.arange(n) < n_uniq
    uniq = jnp.where(valid, uniq, 0)
    summed = summed * valid[:, None]
    return uniq.astype(jnp.int32), summed, n_uniq.astype(jnp.int32)


@jax.custom_vjp
def take_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for jnp.take(table, ids, axis=0) with Pallas fwd/bwd."""
    return gather_rows(table, ids)


def _take_fwd(table, ids):
    return gather_rows(table, ids), (table, ids)


def _take_bwd(res, g):
    table, ids = res
    uniq, summed, n_uniq = _combine_duplicates(ids, g)
    grad_table = scatter_add_rows(uniq, summed, jnp.zeros_like(table),
                                  n_valid=n_uniq)
    return grad_table, None


take_rows.defvjp(_take_fwd, _take_bwd)
