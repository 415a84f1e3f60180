"""ShardedSearcher: exact top-k retrieval over a corpus row-sharded on a
device mesh.

The reference's FAISS path offers multi-GPU sharded indices
(faiss_searcher.py GPU option); the TPU-native equivalent shards the item
axis across the mesh with `shard_map`: every device runs the same
tournament-pruned exact scan (searcher.py:_tournament_select) over its
local rows, then a cross-shard `all_gather` of the per-shard top-k merges
to the global exact top-k (correct because a global top-k element is a
local top-k element of its own shard).

Per-shard masking with a TRACED valid count (shards cut the corpus at
arbitrary offsets) uses over-inclusion: fully-padded groups score NEG, the
single group straddling the valid boundary is pinned to +BIG so it is
always carried as a candidate, and the exact per-item mask is applied at
rescore time. The tournament runs with select_k = k + 1 so the pinned
boundary group occupies the extra slot instead of displacing a true top-k
group (with exactly k slots a true k-th item in its own group could be
dropped — the over-inclusion must widen the selection, not just join it).

`ShardedSqSearcher` composes the same sharding with scalar quantization
(the beyond-HBM tier). Both accept any mesh that has an 'items' axis; the
shard count is that axis's size (other axes replicate the scan).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommendflow_tpu.retrieval.searcher import (
    NEG, _GROUP, _SUPERGROUP, SqSearcher, TpuSearcher, _l2_normalize,
    _tournament_select,
)

BIG = 1e30


def _mask_groups(m1, valid, group):
    """Over-inclusion masking of group maxima against a TRACED valid count:
    groups entirely past `valid` score NEG, the single straddling group is
    pinned +BIG (always selected; the exact per-item mask applies at
    rescore). The subtlest invariant in this file — single home, used by
    both sharded searchers."""
    g = jax.lax.broadcasted_iota(jnp.int32, (1, m1.shape[1]), 1)
    full = (g + 1) * group <= valid          # group entirely below the cut
    boundary = (g * group < valid) & ~full   # straddles the cut
    return jnp.where(full, m1, jnp.where(boundary, BIG, NEG))


def _gathered_merge(queries, s, i, axis, k, metric):
    """all_gather per-shard (scores, GLOBAL indices) and reduce to the
    global top-k; l2 surrogate scores convert to distances after the
    merge. Exact: a global top-k item is in its own shard's local top-k."""
    s_all = jax.lax.all_gather(s, axis)              # [n_sh, Q, k_local]
    i_all = jax.lax.all_gather(i, axis)
    nq = queries.shape[0]
    s_flat = s_all.transpose(1, 0, 2).reshape(nq, -1)
    i_flat = i_all.transpose(1, 0, 2).reshape(nq, -1)
    top, pos = jax.lax.top_k(s_flat, k)
    idx = jnp.take_along_axis(i_flat, pos, axis=1)
    if metric == "l2":
        q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
        top = jnp.sqrt(jnp.maximum(q_sq - top, 0.0))
    return top, idx


def _items_axis_size(mesh: Mesh, axis: str) -> int:
    if axis not in mesh.axis_names:
        raise ValueError(
            f"mesh {dict(mesh.shape)} has no '{axis}' axis — sharded "
            f"searchers shard the corpus along an axis named '{axis}'")
    return int(mesh.shape[axis])


class _MeshPickle:
    """jax Device handles don't pickle: drop the mesh on dump and rebuild
    over the restoring host's devices on load (mixin; chains into the
    parent searcher's __getstate__/__setstate__)."""

    def __getstate__(self):
        state = super().__getstate__()
        state["mesh"] = None
        return state

    def __setstate__(self, state):
        state["mesh"] = Mesh(np.asarray(jax.devices()), (self.AXIS,))
        super().__setstate__(state)


def _local_m1(queries, vecs, sq_norms, valid, *, group, use_kernel):
    """Group maxima of the masked local score matrix, [Q, n_local/group].

    `valid` may be traced: see _mask_groups."""
    n_local = vecs.shape[0]
    if use_kernel:
        from recommendflow_tpu.ops.pallas.grouped_topk import grouped_score_max
        m1 = grouped_score_max(queries, vecs, sq_norms,
                               group=group, num_items=n_local).T
    else:
        if sq_norms is not None:
            s = 2.0 * (queries @ vecs.T) - sq_norms[None, :]
        else:
            s = queries @ vecs.T
        m1 = jnp.max(s.reshape(queries.shape[0], n_local // group, group),
                     axis=-1)
    return _mask_groups(m1, valid, group)


def _local_topk(queries, vecs, vecs_g, sq_norms, sqn_g, valid, k, *,
                metric, use_kernel):
    """Exact (surrogate-score, local-index) top-k over one shard."""
    n_local = vecs.shape[0]
    G, G2 = _GROUP, _SUPERGROUP
    sqn = sq_norms if metric == "l2" else None

    if vecs_g is not None:
        m1 = _local_m1(queries, vecs, sqn, valid, group=G,
                       use_kernel=use_kernel)
        # select_k = k + 1: one slot reserved for the +BIG boundary group
        return _tournament_select(queries, m1, vecs_g, sqn_g, k, k + 1,
                                  valid, metric)

    if sqn is not None:
        s = 2.0 * (queries @ vecs.T) - sqn[None, :]
    else:
        s = queries @ vecs.T
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
    s = jnp.where(col < valid, s, NEG)
    return jax.lax.top_k(s, k)


class ShardedSearcher(_MeshPickle, TpuSearcher):
    """TpuSearcher with the item axis sharded over a `jax.sharding.Mesh`.

    Same surface as TpuSearcher (train/add/search/save/load/pickle); the
    corpus is placed row-sharded at train() and every search runs SPMD with
    a final all-gathered exact merge. Corpus capacity therefore scales with
    mesh size (each chip holds N/n_shards rows). Restoring (load/unpickle)
    rebuilds on the current default mesh.
    """

    AXIS = "items"
    # the sharded scan scores with the matmul family only
    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: str = "cos",
                 mesh: Optional[Mesh] = None, query_block: int = 4096):
        super().__init__(dim, metric, query_block=query_block)
        self.mesh = mesh if mesh is not None else Mesh(
            np.asarray(jax.devices()), (self.AXIS,))
        _items_axis_size(self.mesh, self.AXIS)

    # --------------------------------------------------------------- build
    def train(self, vectors: np.ndarray,
              items: Optional[Sequence[Any]] = None):
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(
                f"expected [N, {self.dim}] vectors, got {vectors.shape}")
        if self.metric == "cos":
            vectors = _l2_normalize(vectors)
        self.num_items = len(vectors)
        n_sh = _items_axis_size(self.mesh, self.AXIS)
        # each shard gets an equal row count, padded so the tournament's
        # group structure holds locally (65536 at scale, 512 for small/test
        # corpora — both multiples of _GROUP * _SUPERGROUP)
        per = 65536 if self.num_items > 131072 * n_sh else 512
        local = -(-self.num_items // (per * n_sh)) * per
        n_pad = local * n_sh
        padded = np.zeros((n_pad, self.dim), np.float32)
        padded[:self.num_items] = vectors
        sharding = NamedSharding(self.mesh, P(self.AXIS, None))
        self._vecs = jax.device_put(padded, sharding)
        if self.metric == "l2":
            sq = np.zeros((n_pad,), np.float32)
            sq[:self.num_items] = (vectors ** 2).sum(-1)
            self._sq_norms = jax.device_put(sq, NamedSharding(self.mesh,
                                                              P(self.AXIS)))
        self.items = np.asarray(items) if items is not None \
            else np.arange(self.num_items)
        self._search_fn = None
        self._vecs_g = self._sqn_g = None
        return self

    # -------------------------------------------------------------- search
    def _build_search(self, k: int):
        metric = self.metric
        num_items = self.num_items
        mesh = self.mesh
        n_sh = _items_axis_size(mesh, self.AXIS)
        n_pad = int(self._vecs.shape[0])
        n_local = n_pad // n_sh
        use_kernel = (jax.default_backend() != "cpu"
                      and self.dim % 128 == 0 and n_local % (128 * _GROUP) == 0)
        axis = self.AXIS
        G, G2 = _GROUP, _SUPERGROUP
        k_local = min(k, n_local)
        # select_k = k_local + 1 tournament slots must fit in the local
        # supergroup count
        hier = (n_local % (G * G2) == 0
                and n_local // (G * G2) > max(k_local + 1, 64))
        if hier and self._vecs_g is None:
            # one-time grouped relayouts for the rescore gather, SHARDED the
            # same way (row-sharding along axis 0 is preserved by the
            # [N, D] -> [N/G, G, D] reshape since n_local % G == 0). Doing
            # this inside the per-call jit would copy the full shard every
            # search and gather slow [1, G*D] wide rows — see
            # _tournament_select's layout notes / CLAUDE.md measurements.
            dim = self.dim
            self._vecs_g = jax.jit(
                lambda v: v.reshape(n_pad // G, G, dim),
                out_shardings=NamedSharding(mesh, P(axis, None, None)),
            )(self._vecs)
            if self._sq_norms is not None:
                self._sqn_g = jax.jit(
                    lambda s: s.reshape(n_pad // G, G),
                    out_shardings=NamedSharding(mesh, P(axis, None)),
                )(self._sq_norms)

        def local_merge(queries, vecs, vecs_g, sq_norms, sqn_g):
            shard = jax.lax.axis_index(axis)
            offset = shard * n_local
            valid = jnp.clip(num_items - offset, 0, n_local)
            s, i = _local_topk(queries, vecs, vecs_g, sq_norms, sqn_g,
                               valid, k_local, metric=metric,
                               use_kernel=use_kernel)
            return _gathered_merge(queries, s, i + offset, axis, k, metric)

        from jax import shard_map
        spec_g = P(axis, None, None) if hier else P()
        spec_sq = P(axis) if metric == "l2" else P()
        spec_sqg = P(axis, None) if (hier and metric == "l2") else P()
        shard_fn = jax.jit(shard_map(
            lambda q, v, vg, sq, sqg: local_merge(
                q, v, vg if hier else None,
                sq if metric == "l2" else None,
                sqg if (hier and metric == "l2") else None),
            mesh=mesh,
            in_specs=(P(), P(axis, None), spec_g, spec_sq, spec_sqg),
            out_specs=(P(), P()), check_vma=False))
        zero = jnp.zeros((), jnp.float32)

        def run(q, v, sq):
            return shard_fn(q, v,
                            self._vecs_g if hier else zero,
                            sq if metric == "l2" else zero,
                            self._sqn_g if (hier and metric == "l2") else zero)
        return run


class ShardedSqSearcher(_MeshPickle, SqSearcher):
    """SqSearcher with the quantized code matrix row-sharded over a mesh.

    The beyond-HBM composition: scalar quantization already fits 2x (bf16)
    or 4x (sq8) more items per chip than f32; sharding the item axis
    multiplies that by mesh size (8 chips x sq8 = 32x the f32 single-chip
    corpus at recall ~0.97, bf16 = 16x at ~1.0 — regime numbers in
    COVERAGE.md §2.8). Search runs SPMD: every shard scans its local codes
    with the same grouped-tournament used on one chip (Pallas fused m1 scan
    for both code dtypes when Mosaic shapes allow — uint8 SQ8 codes cast to
    bf16 in-VMEM), then an `all_gather` of per-shard
    top-k merges exactly — correct because a global top-k item is a local
    top-k item of its own shard. Same surface as SqSearcher
    (train/add/search/save/load/pickle); the restoring host rebuilds on its
    own default mesh.

    Scoring matches SqSearcher: q·x̂ = q·vmin + (q⊙scale)·codes (sq8) rides
    the integer codes without dequantizing; the per-query affine base is a
    rank-preserving shift, so group selection needs only the code matmul.
    Per-shard padding masks with the traced valid count via the same
    over-inclusion trick as ShardedSearcher (_mask_groups + select_k=k+1).
    """

    AXIS = "items"

    def __init__(self, dim: int, metric: str = "cos", qtype: str = "bf16",
                 mesh: Optional[Mesh] = None, item_block: int = 65536,
                 query_block: int = 2048):
        super().__init__(dim, metric, qtype=qtype, item_block=item_block,
                         query_block=query_block)
        self.mesh = mesh if mesh is not None else Mesh(
            np.asarray(jax.devices()), (self.AXIS,))
        _items_axis_size(self.mesh, self.AXIS)

    # ------------------------------------------- restore placement hooks
    # (the restore logic itself lives in SqSearcher._restore_codes)
    def _pad_rows(self, n: int) -> int:
        n_sh = _items_axis_size(self.mesh, self.AXIS)
        per = 65536 if n > 131072 * n_sh else 512
        return max(-(-n // (per * n_sh)), 1) * per * n_sh

    def _put_codes(self, padded: np.ndarray):
        return jax.device_put(
            padded, NamedSharding(self.mesh, P(self.AXIS, None)))

    def _put_norms(self, xsq: np.ndarray):
        return jax.device_put(xsq, NamedSharding(self.mesh, P(self.AXIS)))

    # -------------------------------------------------------------- search
    def _build_search(self, k: int):
        metric, qtype, dim = self.metric, self.qtype, self.dim
        num_items = self.num_items
        mesh, axis = self.mesh, self.AXIS
        n_sh = _items_axis_size(mesh, axis)
        n_pad = int(self._codes.shape[0])
        n_local = n_pad // n_sh
        G, G2 = _GROUP, _SUPERGROUP
        k_local = min(k, n_local)
        # largest power-of-two-scaled block <= item_block dividing the
        # per-shard row count; n_local is always a multiple of 512, so the
        # 512 fallback always divides (a non-power-of-two item_block would
        # otherwise degrade the halving loop to bn=1)
        bn = min(self.item_block, n_local)
        while bn > 512 and n_local % bn:
            bn //= 2
        if n_local % bn:
            bn = 512
        hier = (n_local % (G * G2) == 0 and bn % G == 0
                and n_local // (G * G2) > max(k_local + 1, 64))
        use_kernel = (jax.default_backend() != "cpu"
                      and dim % 128 == 0 and n_local % (128 * G) == 0)
        if hier and self._codes_g is None:
            self._codes_g = jax.jit(
                lambda c: c.reshape(n_pad // G, G, dim),
                out_shardings=NamedSharding(mesh, P(axis, None, None)),
            )(self._codes)
            if metric == "l2":
                self._xsq_g = jax.jit(
                    lambda s: s.reshape(n_pad // G, G),
                    out_shardings=NamedSharding(mesh, P(axis, None)),
                )(self._xhat_sq)
        vmin = self._vmin if qtype == "sq8" else jnp.zeros((1,), jnp.float32)
        scale = self._scale if qtype == "sq8" else jnp.ones((1,), jnp.float32)

        def local_topk(queries, codes, codes_g, xsq, xsq_g, valid):
            nq = queries.shape[0]
            if qtype == "sq8":
                qs = queries * scale[None, :]
                base = queries @ vmin                          # [Q]
            else:
                qs = queries
                base = jnp.zeros((nq,), jnp.float32)

            if hier:
                if use_kernel:
                    from recommendflow_tpu.ops.pallas.grouped_topk import (
                        grouped_score_max)
                    m1 = grouped_score_max(
                        qs, codes, xsq if metric == "l2" else None,
                        group=G, num_items=n_local).T
                else:
                    gb = bn // G

                    def one(gstart):
                        blk = jax.lax.dynamic_slice(
                            codes_g, (gstart, 0, 0), (gb, G, dim))
                        s = jnp.einsum("qd,ngd->qng", qs,
                                       blk.astype(jnp.float32),
                                       preferred_element_type=jnp.float32)
                        if metric == "l2":
                            s = 2.0 * s - jax.lax.dynamic_slice(
                                xsq_g, (gstart, 0), (gb, G))[None]
                        return jnp.max(s, axis=-1)             # [Q, gb]

                    starts = jnp.arange(n_local // bn) * gb
                    m1b = jax.lax.map(one, starts)             # [nb, Q, gb]
                    m1 = m1b.transpose(1, 0, 2).reshape(nq, n_local // G)
                # base is a per-query constant: rank-preserving, so m1 can
                # skip it — selection only compares within a query's row
                m1 = _mask_groups(m1, valid, G)
                return _tournament_select(
                    qs, m1, codes_g, xsq_g, k_local, k_local + 1, valid,
                    metric, base=base)

            def one(start):
                blk = jax.lax.dynamic_slice(codes, (start, 0), (bn, dim))
                s = jnp.einsum("qd,nd->qn", qs.astype(jnp.bfloat16),
                               blk.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                s = s + base[:, None]
                if metric == "l2":
                    s = 2.0 * s - jax.lax.dynamic_slice(
                        xsq, (start,), (bn,))[None, :]
                gidx = start + jax.lax.broadcasted_iota(
                    jnp.int32, (nq, bn), 1)
                s = jnp.where(gidx < valid, s, NEG)
                bs, bp = jax.lax.top_k(s, min(k_local, bn))
                return bs, jnp.take_along_axis(gidx, bp, axis=1)

            starts = jnp.arange(n_local // bn) * bn
            bs, bi = jax.lax.map(one, starts)
            all_s = bs.transpose(1, 0, 2).reshape(nq, -1)
            all_i = bi.transpose(1, 0, 2).reshape(nq, -1)
            s, pos = jax.lax.top_k(all_s, k_local)
            return s, jnp.take_along_axis(all_i, pos, axis=1)

        def local_merge(queries, codes, codes_g, xsq, xsq_g):
            shard = jax.lax.axis_index(axis)
            offset = shard * n_local
            valid = jnp.clip(num_items - offset, 0, n_local)
            s, i = local_topk(queries, codes, codes_g, xsq, xsq_g, valid)
            return _gathered_merge(queries, s, i + offset, axis, k, metric)

        from jax import shard_map
        spec_cg = P(axis, None, None) if hier else P()
        spec_xsq = P(axis) if metric == "l2" else P()
        spec_xsqg = P(axis, None) if (hier and metric == "l2") else P()
        shard_fn = jax.jit(shard_map(
            lambda q, c, cg, xs, xsg: local_merge(
                q, c, cg if hier else None,
                xs if metric == "l2" else None,
                xsg if (hier and metric == "l2") else None),
            mesh=mesh,
            in_specs=(P(), P(axis, None), spec_cg, spec_xsq, spec_xsqg),
            out_specs=(P(), P()), check_vma=False))
        zero = jnp.zeros((), jnp.float32)

        def run(q, v, sq):
            return shard_fn(q, self._codes,
                            self._codes_g if hier else zero,
                            self._xhat_sq if metric == "l2" else zero,
                            self._xsq_g if (hier and metric == "l2") else zero)
        return run
