"""Pallas fused score+group-max kernel for exact top-k retrieval.

The tournament-pruned exact search (retrieval/searcher.py:_build_search)
needs per-group score maxima m1[q, n] = max_{i in group n} q·v_i. Computed
in XLA this materializes the full [Q, N] f32 score matrix in HBM (~8 MB per
query for a 1M-item corpus — write + read back for the max ≈ 8 GB of
traffic per 1024-query block, measured 31 ms on v5e, bandwidth-bound at the
~250 GB/s practical ceiling; benchmarks/micro_search.py).

This kernel tiles (query block) x (item block), does the [QB, D] x [D, C]
dot on the MXU, masks padded items, and reduces each G-item group to its
max entirely in VMEM — HBM sees only the corpus stream (once per query
block) and the [Q, N/G] m1 output. For l2 the surrogate 2q·v − ‖v‖² is
formed in-kernel from a streamed ‖v‖² row.

Reference replaced: FAISS IndexFlat search (faiss_searcher.py:152-176) —
this is the TPU-native scan stage of its exact-search equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -1e30

_BLOCK_QUERIES = 1024  # QB: queries per grid step. The MXU dot is
# [C, D] x [D, QB] with a thin D=128 contraction — utilization scales with
# QB (measured v5e, 1M x 128: qb=512 10.4 ms, qb=1024 5.9 ms per 1024
# queries; block-size sweep in /tmp lost to history, summary in CLAUDE.md).
# items per grid step is 128*group so the [QB, C/group] output block keeps a
# 128-lane minor dim (Mosaic block requirement); at group=16 the score tile
# is [1024, 2048] f32 = 8 MB of VMEM (+1 MB corpus block +1 MB in/out)


def _kernel(q_ref, v_ref, sqn_ref, o_ref, *, group: int, num_items: int,
            block_items: int, l2: bool):
    # Scores are computed TRANSPOSED ([items, queries]) so the G-item groups
    # lie along sublanes: Mosaic supports the [C, QB] -> [C/G, G, QB]
    # shape cast (minor lane dim unchanged) but not the lane-splitting
    # [QB, C] -> [QB, C/G, G] one.
    j = pl.program_id(0)
    # bf16 corpus: bf16 x bf16 MXU dot with f32 accumulation (queries are
    # pre-cast by the caller) — halves the HBM corpus stream. uint8 corpus
    # (SQ8 codes): HBM streams 1 byte/elem and the cast to the query dtype
    # happens in VMEM — integers <= 255 are exactly representable in bf16
    # (8 significand bits), so the dequant-free SQ8 scoring identity holds
    v = v_ref[...]
    if v.dtype == jnp.uint8:
        # Mosaic rejects the direct uint8 -> bf16/f32 cast on real TPU
        # ("Unsupported cast"; interpret mode accepts it — probed on v5e
        # 2026-08-21); the int32 hop lowers fine and is exact for codes
        # <= 255 in either target dtype
        v = v.astype(jnp.int32).astype(q_ref.dtype)
    s = jax.lax.dot_general(v, q_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [C, QB]
    if l2:
        s = 2.0 * s - sqn_ref[...]          # [C, 1] broadcasts over queries
    row = j * block_items + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row < num_items, s, NEG)
    qb = s.shape[1]
    o_ref[...] = jnp.max(s.reshape(block_items // group, group, qb), axis=1)


def grouped_score_max(queries: jnp.ndarray, vecs: jnp.ndarray,
                      sq_norms: jnp.ndarray | None, *, group: int,
                      num_items: int, interpret: bool = False) -> jnp.ndarray:
    """(queries [Q, D], vecs [N_pad, D], sq_norms [N_pad] or None)
    -> m1T [N_pad/group, Q] f32 group maxima of the (masked) score matrix,
    TRANSPOSED (groups first — see _kernel; transpose downstream in XLA,
    it's small).

    Scores are q·v (ip/cos) or the l2 surrogate 2q·v − ‖v‖² when sq_norms is
    given; items >= num_items score NEG. Requires D % 128 == 0 and
    N_pad % (128*group) == 0 (call sites fall back to XLA otherwise).
    """
    q, d = queries.shape
    n_pad = vecs.shape[0]
    c = 128 * group
    qb = min(_BLOCK_QUERIES, q)
    assert d % 128 == 0 and n_pad % c == 0
    if vecs.dtype in (jnp.bfloat16, jnp.uint8):
        # match operand dtypes so the dot is a native bf16 MXU pass (uint8
        # codes cast to bf16 in-kernel, exactly — see _kernel)
        queries = queries.astype(jnp.bfloat16)
    l2 = sq_norms is not None
    sqn = (sq_norms.reshape(n_pad, 1) if l2 else
           jnp.zeros((n_pad, 1), jnp.float32))
    # grid is (item blocks, query blocks), QUERY axis fastest: the big corpus
    # block stays resident across the inner query sweep and HBM streams the
    # corpus exactly once per call (query-major order re-streamed it once
    # per 512-query block: measured 13.1 -> 7.9 ms at Q=1024, 1M x 128)
    grid = (n_pad // c, pl.cdiv(q, qb))
    return pl.pallas_call(
        functools.partial(_kernel, group=group, num_items=num_items,
                          block_items=c, l2=l2),
        grid=grid,
        in_specs=[pl.BlockSpec((qb, d), lambda j, i: (i, 0)),
                  pl.BlockSpec((c, d), lambda j, i: (j, 0)),
                  pl.BlockSpec((c, 1), lambda j, i: (j, 0))],
        out_specs=pl.BlockSpec((c // group, qb), lambda j, i: (j, i)),
        out_shape=jax.ShapeDtypeStruct((n_pad // group, q), jnp.float32),
        interpret=interpret,
    )(queries, vecs, sqn)
