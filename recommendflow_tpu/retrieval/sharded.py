"""ShardedSearcher: exact top-k retrieval over a corpus row-sharded on a
device mesh.

The reference's FAISS path offers multi-GPU sharded indices
(faiss_searcher.py GPU option); the TPU-native equivalent shards the item
axis across the mesh with `shard_map`: every device runs the same
tournament-pruned exact scan (see searcher.py:_build_search) over its local
rows, then a cross-shard `all_gather` of the per-shard top-k merges to the
global exact top-k (correct because a global top-k element is a local top-k
element of its own shard).

Per-shard masking with a TRACED valid count (shards cut the corpus at
arbitrary offsets) uses the over-inclusion trick: fully-padded groups score
NEG, the single group straddling the valid boundary scores +BIG so it is
always selected as a candidate, and the exact per-item mask is applied at
rescore time — a superset of the true top-k groups keeps the tournament
exact.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recommendflow_tpu.retrieval.searcher import (
    NEG, _GROUP, _SUPERGROUP, TpuSearcher, _l2_normalize,
)

BIG = 1e30


def _local_m1(queries, vecs, sq_norms, valid, *, group, use_kernel):
    """Group maxima of the masked local score matrix, [Q, n_local/group].

    `valid` may be traced: groups entirely past it score NEG, the boundary
    group +BIG (always-candidate over-inclusion; exact per-item masking
    happens at rescore)."""
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
    g = jax.lax.broadcasted_iota(jnp.int32, (1, n_local // group), 1)
    full = (g + 1) * group <= valid          # group entirely below the cut
    boundary = (g * group < valid) & ~full   # straddles the cut
    return jnp.where(full, m1, jnp.where(boundary, BIG, NEG))


def _local_topk(queries, vecs, sq_norms, valid, k, *, metric, use_kernel):
    """Exact (surrogate-score, local-index) top-k over one shard."""
    nq = queries.shape[0]
    n_local = vecs.shape[0]
    G, G2 = _GROUP, _SUPERGROUP
    sqn = sq_norms if metric == "l2" else None

    hier = (n_local % (G * G2) == 0 and n_local // (G * G2) > max(k, 64))
    if hier:
        n_sg = n_local // (G * G2)
        m1 = _local_m1(queries, vecs, sqn, valid, group=G,
                       use_kernel=use_kernel)
        m2 = jnp.max(m1.reshape(nq, n_sg, G2), axis=-1)
        _, sg = jax.lax.top_k(m2, k)
        c1 = jnp.take_along_axis(m1.reshape(nq, n_sg, G2),
                                 sg[:, :, None], axis=1)
        _, pos = jax.lax.top_k(c1.reshape(nq, k * G2), k)
        gids = (sg[:, :, None] * G2 +
                jnp.arange(G2)[None, None, :]).reshape(nq, k * G2)
        gidx = jnp.take_along_axis(gids, pos, axis=1)        # [Q, k] groups
        gv = vecs.reshape(n_local // G, G * vecs.shape[1])[gidx]
        cs = jnp.einsum("qkgd,qd->qkg",
                        gv.reshape(nq, k, G, vecs.shape[1]), queries)
        cand = (gidx[:, :, None] * G +
                jnp.arange(G)[None, None, :]).reshape(nq, k * G)
        if metric == "l2":
            cs = 2.0 * cs - sq_norms.reshape(n_local // G, G)[gidx]
        cs = jnp.where(cand.reshape(nq, k, G) < valid,
                       cs, NEG).reshape(nq, k * G)
        top, p2 = jax.lax.top_k(cs, k)
        return top, jnp.take_along_axis(cand, p2, axis=1)

    if sqn is not None:
        s = 2.0 * (queries @ vecs.T) - sqn[None, :]
    else:
        s = queries @ vecs.T
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_local), 1)
    s = jnp.where(col < valid, s, NEG)
    return jax.lax.top_k(s, k)


class ShardedSearcher(TpuSearcher):
    """TpuSearcher with the item axis sharded over a `jax.sharding.Mesh`.

    Same surface as TpuSearcher (train/add/search/save/load/pickle); the
    corpus is placed row-sharded at train() and every search runs SPMD with
    a final all-gathered exact merge. Corpus capacity therefore scales with
    mesh size (each chip holds N/n_dev rows). Restoring (load/unpickle)
    rebuilds on the current default mesh.
    """

    AXIS = "items"

    def __init__(self, dim: int, metric: str = "cos",
                 mesh: Optional[Mesh] = None, query_block: int = 4096):
        super().__init__(dim, metric, query_block=query_block)
        self.mesh = mesh if mesh is not None else Mesh(
            np.asarray(jax.devices()), (self.AXIS,))

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
        n_dev = self.mesh.devices.size
        # each shard gets an equal row count, padded so the tournament's
        # group structure holds locally (65536 at scale, 512 for small/test
        # corpora — both multiples of _GROUP * _SUPERGROUP)
        per = 65536 if self.num_items > 131072 * n_dev else 512
        local = -(-self.num_items // (per * n_dev)) * per
        n_pad = local * n_dev
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
        n_dev = mesh.devices.size
        n_local = int(self._vecs.shape[0]) // n_dev
        use_kernel = (jax.default_backend() != "cpu"
                      and self.dim % 128 == 0 and n_local % (128 * _GROUP) == 0)
        axis = self.AXIS

        def local_merge(queries, vecs, sq_norms):
            shard = jax.lax.axis_index(axis)
            offset = shard * n_local
            valid = jnp.clip(num_items - offset, 0, n_local)
            s, i = _local_topk(queries, vecs, sq_norms, valid,
                               min(k, n_local), metric=metric,
                               use_kernel=use_kernel)
            i = i + offset
            s_all = jax.lax.all_gather(s, axis)          # [n_dev, Q, k']
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

        from jax import shard_map
        if metric == "l2":
            shard_fn = jax.jit(shard_map(
                local_merge, mesh=mesh,
                in_specs=(P(), P(axis, None), P(axis)),
                out_specs=(P(), P()), check_vma=False))
            return shard_fn
        shard_fn = jax.jit(shard_map(
            lambda q, v: local_merge(q, v, None), mesh=mesh,
            in_specs=(P(), P(axis, None)),
            out_specs=(P(), P()), check_vma=False))
        return lambda q, v, sq: shard_fn(q, v)
