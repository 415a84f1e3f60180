"""TpuSearcher: on-device exact top-k retrieval — the FAISS replacement.

The reference wraps FAISS C++ ANN indices (backend/third_party_components/
faiss_searcher.py:23-225). At reference scales (1e5-1e7 items, dim<=512) a
TPU does exact search faster than CPU ANN: score = one [Q, D] x [D, N]
matmul on the MXU, top-k via jax.lax.top_k over item blocks. Design:

  * items live on device as a [N_pad, D] matrix (zero-padded to a block
    multiple; padded rows score -inf),
  * search streams query blocks through a jitted matmul+top_k; item axis can
    be sharded over the mesh with a final cross-shard merge (a k-way top-k
    reduction under psum-free concatenation),
  * the searcher supports the reference's metric surface: ip / cos / l2
    (cos = L2-normalize then ip, faiss_searcher.py:57),
  * save/load to .npz, plus whole-searcher pickling parity.
"""
from __future__ import annotations

import pickle
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from recommendflow_tpu.retrieval import _kernels
from recommendflow_tpu.retrieval._kernels import (
    NEG, _DISTANCE_METRICS, _FAISS_METRIC_INTS, _GROUP,
    _SUPERGROUP, _assign_blocks, _build_capped_lists, _l2_normalize,
    _to_host,
    _make_pairwise_distance, _pq_decode_np, _pq_encode, _pq_train_codebooks,
    _tournament_select, kmeans, resolve_metric,
)


class TpuSearcher:
    """Exact top-k searcher over an item embedding matrix.

    Parameters
    ----------
    metric : 'ip' | 'cos' | 'l2' for the MXU matmul path, plus the
             reference's full distance surface 'l1' | 'l_inf' | 'l_p' |
             'brayCurtis' | 'canberra' | 'jensen_shannon' (blocked pairwise
             kernels), or a raw FAISS MetricType int
             (faiss_searcher.py:80-97). Distance metrics return ascending
             distances from search() like FAISS.
    metric_arg : p for 'l_p' (FAISS metric_arg; distance is sum|x-y|^p,
             no 1/p root — FAISS formula)
    items  : optional identifier array aligned with vectors (ids returned
             from search like the reference's joined DataFrame output)
    """

    SUPPORTED_METRICS = ("ip", "cos", "l2") + _DISTANCE_METRICS

    def __init__(self, dim: int, metric: Union[str, int] = "cos",
                 query_block: int = 4096, pad_multiple: int = 512,
                 metric_arg: float = 3.0):
        metric = resolve_metric(metric)
        if metric not in self.SUPPORTED_METRICS:
            raise ValueError(f"metric '{metric}' not in {self.SUPPORTED_METRICS}")
        self.dim = dim
        self.metric = metric
        self.metric_arg = float(metric_arg)
        self.query_block = query_block
        self.pad_multiple = pad_multiple
        self.items: Optional[np.ndarray] = None          # identifiers
        self._vecs: Optional[jnp.ndarray] = None          # [N_pad, D] device
        self._vecs_g: Optional[jnp.ndarray] = None        # [N_pad/G, G*D] view
        self._sq_norms: Optional[jnp.ndarray] = None      # for l2
        self._sqn_g: Optional[jnp.ndarray] = None
        self.num_items = 0
        self._search_fn = None

    # --------------------------------------------------------------- build
    def train(self, vectors: np.ndarray, items: Optional[Sequence[Any]] = None):
        """Load the item corpus (name parity with FaissSearcher.train,
        faiss_searcher.py:141-150 — exact search needs no training)."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {vectors.shape}")
        if self.metric == "cos":
            vectors = _l2_normalize(vectors)
        self.num_items = len(vectors)
        # large corpora pad to the top-k chunk size so the two-stage reduce
        # can reshape the item axis evenly
        pad_to = 65536 if self.num_items > 131072 else self.pad_multiple
        n_pad = -(-self.num_items // pad_to) * pad_to
        padded = np.zeros((n_pad, self.dim), np.float32)
        padded[:self.num_items] = vectors
        self._vecs = jnp.asarray(padded)
        if self.metric == "l2":
            sq = np.full((n_pad,), np.inf, np.float32)
            sq[:self.num_items] = (vectors ** 2).sum(-1)
            self._sq_norms = jnp.asarray(sq)
        self.items = np.asarray(items) if items is not None else np.arange(self.num_items)
        self._search_fn = None  # rebuilt lazily (item count may change)
        self._vecs_g = self._sqn_g = None  # grouped relayouts, built lazily
        return self

    def add(self, vectors: np.ndarray, items=None):
        """APPEND vectors to the corpus (FAISS index.add semantics — train()
        replaces, add() extends)."""
        vectors = np.asarray(vectors, np.float32)
        if self._vecs is None:
            return self.train(vectors, items)
        existing = _to_host(self._vecs)[:self.num_items]
        if self.metric == "cos":
            # stored vectors are already normalized; train() re-normalizes
            # (no-op for them) and normalizes the new ones
            pass
        new_items = np.asarray(items) if items is not None else \
            np.arange(self.num_items, self.num_items + len(vectors))
        all_items = np.concatenate([self.items, new_items])
        return self.train(np.concatenate([existing, vectors], axis=0),
                          items=all_items)

    # -------------------------------------------------------------- search
    def _is_empty(self) -> bool:
        """True when no corpus is loaded; subclasses that store the corpus
        in another form (e.g. PQ codes) override this instead of faking
        `_vecs` (keeps `search` reentrant under concurrent serving)."""
        return self._vecs is None

    def _build_search(self, k: int):
        metric = self.metric
        num_items = self.num_items
        n_pad = int(self._vecs.shape[0])
        dim = self.dim

        if metric in _DISTANCE_METRICS:
            # blocked pairwise-distance scan: no matmul decomposition
            # exists for these, but XLA fuses the broadcast-sub-reduce so
            # the [Q, nb, D] intermediate never materializes; [Q, N]
            # distances -> top_k of the negation, returned ascending
            dist = _make_pairwise_distance(metric, self.metric_arg)
            nb = 512
            while n_pad % nb:          # pad_multiple is caller-configurable
                nb //= 2

            def search_block(queries, vecs, sq_norms):
                nq = queries.shape[0]
                blocks = vecs.reshape(n_pad // nb, nb, dim)

                def body(_, vb):
                    return None, dist(queries, vb)

                _, parts = jax.lax.scan(body, None, blocks)  # [NB, Q, nb]
                d = jnp.transpose(parts, (1, 0, 2)).reshape(nq, n_pad)
                col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
                neg = jnp.where(col < num_items, -d, NEG)
                top, idx = jax.lax.top_k(neg, k)
                return -top, idx

            return jax.jit(search_block)

        def raw_scores(queries, vecs, sq_norms):
            if metric == "l2":
                # argmin ||q - v||^2 == argmax 2 q·v - ||v||^2
                scores = 2.0 * (queries @ vecs.T) - sq_norms[None, :]
            else:
                scores = queries @ vecs.T
            col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
            return jnp.where(col < num_items, scores, NEG)

        def finish_l2(queries, top_scores):
            # convert the 2q·v − ‖v‖² surrogate back to real L2 distance
            q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
            return jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))

        # Tournament pruning: at most k groups can contain a top-k element,
        # and each such group's max is itself >= the k-th best score, so the
        # top-k groups-by-max cover every top-k element — EXACT at any depth
        # of nesting (the same argument applies to supergroups of groups).
        G, G2 = _GROUP, _SUPERGROUP

        if n_pad % (G * G2) == 0 and n_pad // (G * G2) > max(k, 64) \
                and n_pad >= _kernels._HIER_MIN_ITEMS:
            if self._vecs_g is None:
                # one-time device-side relayout ([N, D] -> [N/G, G, D] is a
                # real copy on TPU: the (8,128) tilings differ — never do it
                # inside the per-call jit). The 3D group layout matters for
                # the rescore gather: XLA row-gathers of [1, G, D] tiles run
                # ~2x faster than [1, G*D] 8 KB rows (measured v5e, 102k
                # gathers from 1M x 128: 6.2 vs 12.8 ms — wide 2D rows
                # straddle lane tiles; see CLAUDE.md perf notes)
                self._vecs_g = jax.jit(
                    lambda v: v.reshape(n_pad // G, G, dim))(self._vecs)
                if self._sq_norms is not None:
                    self._sqn_g = jax.jit(
                        lambda s: s.reshape(n_pad // G, G))(self._sq_norms)
            # Two-level tournament + vector-gather rescore. Measured (v5e,
            # 1M x 128 f32, k=100, benchmarks/micro_search.py): the flat
            # path's costs are the [Q, N] f32 score materialization
            # (~8 MB/query of HBM traffic, ~250 GB/s ceiling) and
            # lax.top_k over N/G=62.5k group maxima (~47 ms @ Q=256).
            # Here top_k only ever sees N/(G*G2) supergroup maxima and the
            # candidate-k*G2 / k*G tails; full scores for the k winning
            # groups are RE-COMPUTED from gathered group vectors (k row
            # gathers of G*D contiguous floats per query) instead of
            # gathered out of a materialized score matrix. Same exact
            # result, ~3x the throughput (select + rescore shared with the
            # sharded searcher: _tournament_select above).
            # the scan stage (scores + group max) runs as a fused Pallas
            # kernel on TPU — the [Q, N] score matrix never touches HBM
            # (measured 31 -> 13 ms per 1024 queries at 1M x 128; see
            # ops/pallas/grouped_topk.py). XLA fallback elsewhere.
            use_kernel = (jax.default_backend() != "cpu"
                          and dim % 128 == 0 and n_pad % (128 * G) == 0)

            def compute_m1(queries, vecs, sq_norms):
                if use_kernel:
                    from recommendflow_tpu.ops.pallas.grouped_topk import (
                        grouped_score_max)
                    m1t = grouped_score_max(
                        queries, vecs, sq_norms if metric == "l2" else None,
                        group=G, num_items=num_items)
                    return m1t.T
                scores = raw_scores(queries, vecs, sq_norms)
                return jnp.max(
                    scores.reshape(queries.shape[0], n_pad // G, G), axis=-1)

            def search_block(queries, vecs, vecs_g, sq_norms, sqn_g):
                m1 = compute_m1(queries, vecs, sq_norms)
                top_scores, top_idx = _tournament_select(
                    queries, m1, vecs_g, sqn_g, k, k, num_items, metric)
                if metric == "l2":
                    top_scores = finish_l2(queries, top_scores)
                return top_scores, top_idx

            jitted = jax.jit(search_block)
            return lambda q, v, sq: jitted(q, v, self._vecs_g, sq, self._sqn_g)

        if n_pad % G == 0 and n_pad // G > 4 * k and n_pad > 262144:
            # single-level group-max prune (mid-size corpora)
            def search_block(queries, vecs, sq_norms):
                nq = queries.shape[0]
                scores = raw_scores(queries, vecs, sq_norms)
                gmax = jnp.max(scores.reshape(nq, n_pad // G, G), axis=-1)
                _, gidx = jax.lax.top_k(gmax, k)              # [Q, k] group ids
                member = gidx[:, :, None] * G + jnp.arange(G)[None, None, :]
                cand_idx = member.reshape(nq, k * G)          # [Q, k*G]
                cand_s = jnp.take_along_axis(scores, cand_idx, axis=1)
                top_scores, pos = jax.lax.top_k(cand_s, k)
                top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
                if metric == "l2":
                    top_scores = finish_l2(queries, top_scores)
                return top_scores, top_idx

        else:
            def search_block(queries, vecs, sq_norms):
                scores = raw_scores(queries, vecs, sq_norms)
                top_scores, top_idx = jax.lax.top_k(scores, k)
                if metric == "l2":
                    top_scores = finish_l2(queries, top_scores)
                return top_scores, top_idx

        return jax.jit(search_block)

    def search(self,
               queries: np.ndarray,
               topk: Union[int, Sequence[int]] = 10,
               return_items: bool = True):
        """Top-k per query. topk may be a list (parity: FaissSearcher.search
        accepting List[int], faiss_searcher.py:178-204) — results are
        computed at max(topk) and sliced per k.

        Returns (items, scores, indices) arrays [Q, k]; items omitted when
        return_items=False or no identifiers were given.
        """
        if self._is_empty():
            raise RuntimeError("searcher is empty — call train(vectors) first")
        ks = sorted({int(k) for k in (topk if isinstance(topk, (list, tuple)) else [topk])})
        k_max = min(max(ks), self.num_items)
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.metric == "cos":
            queries = _l2_normalize(queries)

        if self._search_fn is None:
            self._search_fn = {}
        if k_max not in self._search_fn:
            self._search_fn[k_max] = self._build_search(k_max)
        fn = self._search_fn[k_max]

        # dispatch all blocks first, fetch after — np.asarray inside the loop
        # would sync per block and serialize host transfer with device compute
        out = []
        for start in range(0, len(queries), self.query_block):
            q = jnp.asarray(queries[start:start + self.query_block])
            out.append(fn(q, self._vecs, self._sq_norms))
        scores = np.concatenate([np.asarray(s) for s, _ in out], axis=0)
        idx = np.concatenate([np.asarray(i) for _, i in out], axis=0)

        def slice_k(arr):
            return arr if len(ks) == 1 else {k: arr[:, :k] for k in ks}

        if return_items and self.items is not None:
            items = self.items[idx]
            return slice_k(items), slice_k(scores), slice_k(idx)
        return slice_k(scores), slice_k(idx)

    # ------------------------------------------------------------- persist
    def save(self, path: str):
        if self._vecs is None:
            raise RuntimeError("nothing to save")
        np.savez_compressed(
            path,
            vecs=_to_host(self._vecs)[:self.num_items],
            items=self.items,
            dim=self.dim, metric=self.metric)

    @classmethod
    def load(cls, path: str) -> "TpuSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        s = cls(int(data["dim"]), str(data["metric"]))
        vecs = data["vecs"]
        if s.metric == "cos":
            # vectors were saved already normalized; train() re-normalizes (no-op)
            pass
        s.train(vecs, items=data["items"])
        return s

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_vecs"] = _to_host(self._vecs)[:self.num_items] if self._vecs is not None else None
        for key in ("_sq_norms", "_search_fn", "_vecs_g", "_sqn_g"):
            state[key] = None
        return state

    def __setstate__(self, state):
        vecs = state.pop("_vecs")
        self.__dict__.update(state)
        self._vecs, self._sq_norms, self._search_fn = None, None, None
        if vecs is not None:
            self.train(vecs, items=state.get("items"))

    def dump(self, path: str):
        """Whole-searcher pickle (parity: faiss_searcher.py:217-225)."""
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load_pickle(cls, path: str) -> "TpuSearcher":
        with open(path, "rb") as f:
            return pickle.load(f)

