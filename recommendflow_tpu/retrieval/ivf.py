"""IVF approximate search (FAISS IVF{n},Flat parity) — see class doc."""
from __future__ import annotations

import pickle
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from recommendflow_tpu.retrieval._kernels import (
    NEG, _DISTANCE_METRICS, _FAISS_METRIC_INTS, _GROUP, _HIER_MIN_ITEMS,
    _SUPERGROUP, _assign_blocks, _build_capped_lists, _l2_normalize,
    _make_pairwise_distance, _pq_decode_np, _pq_encode, _pq_train_codebooks,
    _tournament_select, kmeans, resolve_metric,
)
from recommendflow_tpu.retrieval.flat import TpuSearcher


class IvfSearcher(TpuSearcher):
    """IVF approximate top-k: k-means coarse quantizer + capped inverted
    lists, probed per query (parity surface: FAISS 'IVF{n},Flat' indices,
    faiss_searcher.py:80-97; nprobe attribute like faiss).

    TPU regime note (measured, v5e-1, 1M x 128 cos, k=100): the exact
    tournament searcher wins at this scale at EVERY batch size and by a
    wide margin (22.4k q/s exact vs 950 q/s IVF at nprobe=32; B=16: 4.2 vs
    5.5 ms) because the dense [Q, D] x [D, N] scan rides the MXU while
    IVF's per-query candidate gathers pay the fixed per-row gather cost
    (~25 ns/512-byte row). Recall is also data-dependent: 0.992 on
    clustered corpora but only ~0.2 on isotropic random vectors (neighbors
    spread across lists — inherent to IVF, same as FAISS). Prefer the exact
    TpuSearcher (or ShardedSearcher beyond one chip's HBM) at reference
    scales; IvfSearcher exists for FAISS API parity and memory-tiered
    setups where scanning is impossible.

    Static-shape design (everything jit-safe):
      * inverted lists are a dense [nlist, M] int32 matrix of item indices,
        -1 padded, M = cap_factor * N / nlist;
      * items overflowing their list's cap go to an OVERFLOW pool that is
        always scanned exactly — recall never silently drops from capping;
      * search: centroid matmul -> lax.top_k nprobe lists -> gather their
        member ids -> gather member vectors -> batched einsum -> top-k over
        (candidates + overflow).
    """

    # quantized decode-and-score math assumes the matmul family
    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: str = "cos", nlist: int = 1024,
                 nprobe: int = 8, query_block: int = 256,
                 cap_factor: float = 2.0, kmeans_iters: int = 10,
                 train_sample: int = 262144, seed: int = 0):
        super().__init__(dim, metric, query_block=query_block)
        self.nlist = nlist
        self.nprobe = nprobe
        self.cap_factor = cap_factor
        self.kmeans_iters = kmeans_iters
        self.train_sample = train_sample
        self.seed = seed
        self._centroids = None      # [nlist, D]
        self._lists = None          # [nlist, M] int32, -1 pad
        self._overflow = None       # [O, D] overflow vectors (scanned exactly)
        self._overflow_idx = None   # [O] their item indices

    # --------------------------------------------------------------- build
    def train(self, vectors: np.ndarray, items: Optional[Sequence[Any]] = None):
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {vectors.shape}")
        if self.metric == "cos":
            vectors = _l2_normalize(vectors)
        n = len(vectors)
        self.num_items = n
        self.items = np.asarray(items) if items is not None else np.arange(n)
        self.nlist = max(1, min(self.nlist, n))

        # 0. ONE corpus upload (row n = zeros for -1 pads); everything else
        # (sampling, k-means, assignment) runs on device — the tunnel's
        # host->device path is the slow resource, not the chip
        padded = np.zeros((n + 1, self.dim), np.float32)
        padded[:n] = vectors
        self._vecs = jnp.asarray(padded)
        # 1. coarse quantizer on a device-side sample (faiss practice:
        # don't kmeans 10M rows). NOTE: never slice self._vecs[:n] eagerly
        # here — an eager slice materializes a second full-corpus copy
        # (5.1 GB at 10M x 128) and OOMs train on one chip.
        rng = np.random.RandomState(self.seed)
        if n <= self.train_sample:
            sample = jnp.take(self._vecs, jnp.arange(n), axis=0)
        else:
            sample_idx = rng.choice(n, self.train_sample, replace=False)
            sample = jnp.take(self._vecs, jnp.asarray(sample_idx), axis=0)
        self._centroids = kmeans(
            sample, self.nlist, iters=self.kmeans_iters,
            seed=self.seed, spherical=self.metric in ("cos", "ip"))

        # 2. assign every item to its nearest centroid (one device pass)
        assign = _assign_blocks(self._vecs, self._centroids, n)

        # 3. capped dense lists + overflow pool (vectorized: a python loop
        # over 1M items costs minutes; this is ~3 numpy passes)
        lists, ov = _build_capped_lists(assign, self.nlist, self.cap_factor)
        self._lists = jnp.asarray(lists)
        self._overflow_idx = ov
        self._overflow = jnp.take(self._vecs, jnp.asarray(ov), axis=0) \
            if len(ov) else jnp.zeros((0, self.dim), jnp.float32)

        if self.metric == "l2":
            sqn = np.full((n + 1,), np.inf, np.float32)
            sqn[:n] = (vectors ** 2).sum(-1)
            self._sq_norms = jnp.asarray(sqn)
        self._search_fn = None
        return self

    def add(self, vectors, items=None):
        """Append = retrain quantizer + lists (exactness of the coarse
        quantizer over drifting corpora beats incremental insertion at
        offline-eval scales; FAISS also retrains for quality)."""
        return super().add(vectors, items)

    # -------------------------------------------------------------- search
    def _build_search(self, k: int):
        metric = self.metric
        nprobe = min(self.nprobe, self.nlist)
        num_items = self.num_items
        n_over = int(self._overflow.shape[0])
        over_idx = jnp.asarray(self._overflow_idx.astype(np.int32)) \
            if n_over else jnp.zeros((0,), jnp.int32)
        # k can exceed the candidate pool (nprobe lists + overflow) even when
        # k <= num_items; FAISS pads such rows with -1 instead of erroring.
        # Clamp top_k to the pool and pad the tail with NEG scores / index 0
        # (index pads stay clamped to 0 like the in-pool -1 pads below).
        cand_width = nprobe * int(self._lists.shape[1]) + n_over
        k_eff = min(k, cand_width)

        def search_block(queries, vecs, sq_norms, centroids, lists, overflow):
            nq = queries.shape[0]
            # coarse: pick nprobe lists (L2 and IP pick identically for
            # normalized centroids; use the metric-true score)
            if metric == "l2":
                cs = 2.0 * (queries @ centroids.T) - \
                    jnp.sum(centroids * centroids, axis=1)[None, :]
            else:
                cs = queries @ centroids.T
            _, probe = jax.lax.top_k(cs, nprobe)                 # [Q, P]
            cand_pm = lists[probe]                               # [Q, P, M]

            # scan over the probe axis: peak temp is one [Q, M, D] gather
            # instead of [Q, P*M, D] (which OOMs at Q=512, P=32, M~2000)
            def score_probe(_, ids):                             # ids [Q, M]
                safe = jnp.where(ids >= 0, ids, num_items)       # zero pad row
                cv = jnp.take(vecs, safe, axis=0)                # [Q, M, D]
                sp = jnp.einsum("qd,qmd->qm", queries, cv)
                if metric == "l2":
                    sp = 2.0 * sp - jnp.take(sq_norms, safe, axis=0)
                return None, jnp.where(ids >= 0, sp, NEG)

            _, s_pm = jax.lax.scan(score_probe, None,
                                   cand_pm.transpose(1, 0, 2))   # [P, Q, M]
            s = s_pm.transpose(1, 0, 2).reshape(nq, -1)          # [Q, P*M]
            cand = cand_pm.reshape(nq, -1)
            if n_over:
                so = queries @ overflow.T                        # [Q, O]
                if metric == "l2":
                    so = 2.0 * so - jnp.take(sq_norms, over_idx, axis=0)[None, :]
                s = jnp.concatenate([s, so], axis=1)
                cand = jnp.concatenate(
                    [cand, jnp.broadcast_to(over_idx[None, :], (nq, n_over))],
                    axis=1)
            top_scores, pos = jax.lax.top_k(s, k_eff)
            top_idx = jnp.take_along_axis(cand, pos, axis=1)
            top_idx = jnp.maximum(top_idx, 0)   # k > matches: clamp pads
            if k_eff < k:
                pad = ((0, 0), (0, k - k_eff))
                top_scores = jnp.pad(top_scores, pad, constant_values=NEG)
                top_idx = jnp.pad(top_idx, pad)
            if metric == "l2":
                q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
                top_scores = jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))
            return top_scores, top_idx

        jitted = jax.jit(search_block)
        return lambda q, v, sq: jitted(q, v, sq, self._centroids,
                                       self._lists, self._overflow)

    # ------------------------------------------------------------- persist
    def save(self, path: str):
        if self._vecs is None:
            raise RuntimeError("nothing to save")
        np.savez_compressed(
            path, vecs=np.asarray(self._vecs)[:self.num_items],
            items=self.items, dim=self.dim, metric=self.metric,
            nlist=self.nlist, nprobe=self.nprobe, ivf=True,
            # the quantizer is rebuilt at load(); persist everything that
            # shapes it so the restored index equals the saved one
            cap_factor=self.cap_factor, kmeans_iters=self.kmeans_iters,
            train_sample=self.train_sample, seed=self.seed)

    @classmethod
    def load(cls, path: str) -> "IvfSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        kw = {key: t(data[key]) for key, t in
              [("cap_factor", float), ("kmeans_iters", int),
               ("train_sample", int), ("seed", int)] if key in data}
        s = cls(int(data["dim"]), str(data["metric"]),
                nlist=int(data["nlist"]), nprobe=int(data["nprobe"]), **kw)
        s.train(data["vecs"], items=data["items"])
        return s

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_vecs"] = np.asarray(self._vecs)[:self.num_items] \
            if self._vecs is not None else None
        for key in ("_sq_norms", "_search_fn", "_vecs_g", "_sqn_g",
                    "_centroids", "_lists", "_overflow", "_overflow_idx"):
            state[key] = None
        return state


