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

NEG = -1e30

# tournament-pruned exact top-k parameters (see _build_search): items are
# max-pooled in groups of _GROUP, group maxima in supergroups of _SUPERGROUP;
# the hierarchical path engages above _HIER_MIN_ITEMS padded items
_GROUP = 16
_SUPERGROUP = 16
_HIER_MIN_ITEMS = 262144


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


# distance metrics beyond the matmul family (smaller = better; search()
# returns them ascending, FAISS-style). Parity: the reference's 9-metric map
# faiss_searcher.py:81-97.
_DISTANCE_METRICS = ("l1", "l_inf", "l_p", "brayCurtis", "canberra",
                     "jensen_shannon")
# FAISS MetricType enum values -> names (the reference passes raw ints
# through to faiss, faiss_searcher.py:95-96)
_FAISS_METRIC_INTS = {0: "ip", 1: "l2", 2: "l1", 3: "l_inf", 4: "l_p",
                      20: "canberra", 21: "brayCurtis", 22: "jensen_shannon"}


def resolve_metric(measurement: Union[str, int]) -> str:
    """Accept a metric name or a raw FAISS MetricType int (reference
    int pass-through parity, faiss_searcher.py:95-96)."""
    if isinstance(measurement, (int, np.integer)):
        if int(measurement) not in _FAISS_METRIC_INTS:
            raise ValueError(
                f"unknown FAISS MetricType int {measurement}; known: "
                f"{_FAISS_METRIC_INTS}")
        return _FAISS_METRIC_INTS[int(measurement)]
    return str(measurement)


def _make_pairwise_distance(metric: str, p: float):
    """[Q, D] x [Nb, D] -> [Q, Nb] distance block (FAISS formula parity:
    Lp is sum|x-y|^p WITHOUT the 1/p root; Canberra skips zero-denominator
    terms; JensenShannon assumes non-negative inputs and guards zeros)."""
    def dist(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        diff = jnp.abs(q[:, None, :] - v[None, :, :])
        if metric == "l1":
            return jnp.sum(diff, -1)
        if metric == "l_inf":
            return jnp.max(diff, -1)
        if metric == "l_p":
            return jnp.sum(diff ** p, -1)
        if metric == "brayCurtis":
            den = jnp.sum(jnp.abs(q[:, None, :] + v[None, :, :]), -1)
            return jnp.sum(diff, -1) / jnp.maximum(den, 1e-20)
        if metric == "canberra":
            den = jnp.abs(q)[:, None, :] + jnp.abs(v)[None, :, :]
            return jnp.sum(jnp.where(den > 0,
                                     diff / jnp.maximum(den, 1e-20), 0.0), -1)
        if metric == "jensen_shannon":
            x, y = q[:, None, :], v[None, :, :]
            m = jnp.maximum(0.5 * (x + y), 1e-20)
            t1 = jnp.where(x > 0, x * jnp.log(jnp.maximum(x, 1e-20) / m), 0.0)
            t2 = jnp.where(y > 0, y * jnp.log(jnp.maximum(y, 1e-20) / m), 0.0)
            return 0.5 * jnp.sum(t1 + t2, -1)
        raise ValueError(f"not a distance metric: {metric}")
    return dist


def _tournament_select(queries, m1, vecs_g, sqn_g, k, select_k, valid,
                       metric, base=None):
    """Two-level tournament select + exact vector rescore.

    m1      [Q, n_groups] per-group score maxima (masked by the caller).
    vecs_g  [n_groups, G, D] grouped corpus relayout; sqn_g [n_groups, G]
            squared norms (l2 only). valid: item indices >= valid score NEG
            at rescore (may be a traced scalar).
    select_k >= k supergroups/groups survive each tournament level — callers
    that force an over-included candidate group (e.g. a traced-boundary
    group pinned to +BIG, see sharded.py) pass select_k = k + 1 so the
    forced group cannot displace a true top-k group from the k slots.

    Exactness: at most k groups can contain a top-k element and each such
    group's max is >= the k-th best score, so the top-select_k(>=k)
    groups-by-max cover every top-k element — at any nesting depth. Full
    scores for the winning groups are RE-COMPUTED from gathered group
    vectors (FLAT index into the 3D group table: [1, G, D] tile gathers run
    ~2x faster than [1, G*D] wide rows — 6.2 vs 12.8 ms per 102k gathers
    from 1M x 128, measured v5e) instead of gathered out of a materialized
    [Q, N] score matrix. take_along_axis with [:, :, None] indices lowers
    to cheap row gathers; flat per-element indexing costs ~30 ns/element.
    """
    nq = queries.shape[0]
    G2 = _SUPERGROUP
    G, dim = vecs_g.shape[1], vecs_g.shape[2]
    n_sg = m1.shape[1] // G2
    m2 = jnp.max(m1.reshape(nq, n_sg, G2), axis=-1)
    _, sg = jax.lax.top_k(m2, select_k)               # [Q, sk] supergroups
    c1 = jnp.take_along_axis(m1.reshape(nq, n_sg, G2),
                             sg[:, :, None], axis=1)
    _, pos = jax.lax.top_k(c1.reshape(nq, select_k * G2), select_k)
    gids = (sg[:, :, None] * G2 +
            jnp.arange(G2)[None, None, :]).reshape(nq, select_k * G2)
    gidx = jnp.take_along_axis(gids, pos, axis=1)     # [Q, sk] groups
    gv = vecs_g[gidx.reshape(-1)].reshape(nq, select_k, G, dim)
    # vecs_g may hold quantized codes (SqSearcher): cast to the query dtype
    # and add the caller's per-query affine base (q·vmin for SQ8)
    cs = jnp.einsum("qkgd,qd->qkg", gv.astype(queries.dtype), queries)
    if base is not None:
        cs = cs + base[:, None, None]
    cand = (gidx[:, :, None] * G +
            jnp.arange(G)[None, None, :]).reshape(nq, select_k * G)
    if metric == "l2":
        cs = 2.0 * cs - sqn_g[gidx.reshape(-1)].reshape(nq, select_k, G)
    cs = jnp.where(cand.reshape(nq, select_k, G) < valid,
                   cs, NEG).reshape(nq, select_k * G)
    top_scores, p2 = jax.lax.top_k(cs, k)
    return top_scores, jnp.take_along_axis(cand, p2, axis=1)


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
        existing = np.asarray(self._vecs)[:self.num_items]
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
                and n_pad >= _HIER_MIN_ITEMS:
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
            vecs=np.asarray(self._vecs)[:self.num_items],
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
        state["_vecs"] = np.asarray(self._vecs)[:self.num_items] if self._vecs is not None else None
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


# ------------------------------------------------------------------ k-means
def kmeans(vectors: jnp.ndarray, nlist: int, iters: int = 10,
           seed: int = 0, spherical: bool = False) -> jnp.ndarray:
    """Lloyd's k-means on device: assignment is one [N, D] x [D, C] MXU
    matmul per iteration, the update a segment-sum. Returns [nlist, D]
    centroids. spherical=True renormalizes centroids every step (cos/ip)."""
    n, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (nlist,), replace=n < nlist)
    centroids = vectors[init_idx]

    # vectors MUST be a jit argument, not a closure capture: captured device
    # arrays are baked into the executable as constants and re-uploaded at
    # compile time (measured: 128 MB constant -> 7.5 s/step over the tunnel)
    @jax.jit
    def step(x, c):
        # nearest centroid in L2: argmin ||x||^2 - 2 x·c + ||c||^2
        scores = 2.0 * (x @ c.T) - jnp.sum(c * c, axis=1)[None, :]
        assign = jnp.argmax(scores, axis=1)                      # [N]
        sums = jax.ops.segment_sum(x, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32),
                                     assign, num_segments=nlist)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        new = jnp.where(counts[:, None] > 0, new, c)             # keep empties
        if spherical:
            new = new / jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        return new

    for _ in range(iters):
        centroids = step(vectors, centroids)
    return centroids


# ------------------------------------------------------- shared IVF/PQ tools
def _assign_blocks(padded_vecs: jnp.ndarray, centroids: jnp.ndarray,
                   n: int, block: int = 16384) -> np.ndarray:
    """Nearest-centroid assignment for the first n rows of a padded device
    corpus, row-blocked via lax.map to bound the [block, nlist] score temp.

    Blocks OVERLAP at the tail instead of padding (start clamps to
    N - block): padding would copy the whole corpus on device — at 10M x
    128 that second 5.1 GB copy OOMs the chip during train. Overlapping
    rows compute identical assignments, so later blocks harmlessly rewrite
    them on the host."""
    N = int(padded_vecs.shape[0])
    block = min(block, N)
    n_blk = -(-n // block)
    starts_np = np.minimum(np.arange(n_blk) * block, N - block)

    @jax.jit
    def assign_all(v, c, starts):
        c_sq = jnp.sum(c * c, axis=1)

        def one(start):
            x = jax.lax.dynamic_slice(v, (start, 0), (block, v.shape[1]))
            return jnp.argmax(2.0 * (x @ c.T) - c_sq[None, :], axis=1)

        return jax.lax.map(one, starts)

    parts = np.asarray(assign_all(padded_vecs, centroids,
                                  jnp.asarray(starts_np, jnp.int32)))
    out = np.empty(N, np.int64)
    for i, s in enumerate(starts_np):
        out[s:s + block] = parts[i]
    return out[:n]


def _build_capped_lists(assign: np.ndarray, nlist: int, cap_factor: float):
    """Capped dense inverted lists + overflow (vectorized ~3 numpy passes).

    Returns (lists [nlist, M] int32 with -1 pads, overflow item order)."""
    n = len(assign)
    m = max(1, int(np.ceil(cap_factor * n / nlist)))
    order = np.argsort(assign, kind="stable")       # cluster-contiguous
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(nlist))
    rank = np.arange(n) - starts[sorted_assign]     # position within cluster
    keep = rank < m
    lists = np.full((nlist, m), -1, np.int64)
    lists[sorted_assign[keep], rank[keep]] = order[keep]
    return lists.astype(np.int32), order[~keep]


def _pq_train_codebooks(sample: np.ndarray, m: int, iters: int,
                        seed: int) -> jnp.ndarray:
    """Per-subspace 256-centroid codebooks [M, 256, D/M]: ONE vmapped
    k-means over the subspace axis (M concurrent [S, ds] problems)."""
    ds = sample.shape[1] // m
    sub = jnp.asarray(sample.reshape(len(sample), m, ds).transpose(1, 0, 2))
    return jax.vmap(
        lambda v, s: kmeans(v, 256, iters=iters, seed=s))(
        sub, jnp.arange(seed, seed + m))


def _pq_encode(vectors: np.ndarray, codebooks: jnp.ndarray) -> np.ndarray:
    """Encode [N, D] to uint8 codes [N, M] in device blocks (the [B, M, 256]
    score temp bounds the block size)."""
    m = int(codebooks.shape[0])
    ds = int(codebooks.shape[2])
    n = len(vectors)
    blk = 65536
    codes = np.empty((n, m), np.uint8)

    @jax.jit
    def encode(x, cb):                   # x [B, M, ds], cb [M, 256, ds]
        s = jnp.einsum("bmd,mkd->bmk", x, cb)
        s = 2.0 * s - jnp.sum(cb * cb, axis=-1)[None, :, :]
        return jnp.argmax(s, axis=-1).astype(jnp.uint8)

    for start in range(0, n, blk):
        x = jnp.asarray(vectors[start:start + blk].reshape(-1, m, ds).copy())
        codes[start:start + blk] = np.asarray(encode(x, cb=codebooks))
    return codes


def _pq_decode_np(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Host-side decode of uint8 codes [B, M] -> [B, D] (reconstruction)."""
    codes = np.atleast_2d(np.asarray(codes))   # scalar-key reconstruct: [1, M]
    m = codebooks.shape[0]
    return codebooks[np.arange(m)[None, :], codes.astype(np.int64)] \
        .reshape(len(codes), -1)


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


class PqSearcher(TpuSearcher):
    """Product-quantized top-k (parity surface: FAISS 'PQ{M}' indices).

    Memory-tiered regime: the corpus is stored as uint8 codes [N, M] plus
    per-subspace codebooks [M, 256, D/M] — 4·D/M x compression (32x at
    D=128, M=16) — for corpora whose f32 vectors exceed one chip's HBM.
    Scores are approximate (quantization distortion), like FAISS PQ.

    TPU-native scan design: classic ADC walks a [M, 256] lookup table with
    per-item per-subspace gathers — N·M scalar gathers are row-latency
    bound on TPU (~30 ns/element, CLAUDE.md perf notes), hopeless at 1M
    items. Instead each item block DECODES on the MXU — one-hot(codes) ·
    codebooks is a [Bn·M, 256] x [256, D/M] bf16 matmul — and scores the
    whole query block against the reconstruction with a second matmul. The
    decoded block lives only in the block loop; the full decoded corpus
    never materializes in HBM. Per-block top-k then a final cross-block
    top-k merge keeps the score matrix [Q, block] instead of [Q, N].
    """

    # quantized decode-and-score math assumes the matmul family
    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: str = "cos", num_subspaces: int = 8,
                 kmeans_iters: int = 10, train_sample: int = 131072,
                 item_block: int = 4096, query_block: int = 1024,
                 seed: int = 0):
        super().__init__(dim, metric, query_block=query_block)
        if dim % num_subspaces != 0:
            raise ValueError(f"dim {dim} not divisible by num_subspaces "
                             f"{num_subspaces}")
        self.num_subspaces = num_subspaces
        self.kmeans_iters = kmeans_iters
        self.train_sample = train_sample
        self.item_block = item_block
        self.seed = seed
        self._codebooks = None    # [M, 256, ds] f32
        self._codes = None        # [N_pad, M] uint8 on device

    # --------------------------------------------------------------- build
    def train(self, vectors: np.ndarray, items: Optional[Sequence[Any]] = None):
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {vectors.shape}")
        if self.metric == "cos":
            vectors = _l2_normalize(vectors)
        n = len(vectors)
        m, ds = self.num_subspaces, self.dim // self.num_subspaces
        self.num_items = n
        self.items = np.asarray(items) if items is not None else np.arange(n)

        # 1. per-subspace codebooks from a sample (256 centroids = 8-bit
        # codes; tiny corpora just repeat seeds)
        rng = np.random.RandomState(self.seed)
        if n > self.train_sample:
            sample = vectors[rng.choice(n, self.train_sample, replace=False)]
        else:
            sample = vectors
        self._codebooks = _pq_train_codebooks(
            sample, m, self.kmeans_iters, self.seed)        # [M, 256, ds]

        # 2. encode the corpus in device blocks
        self._set_codes(_pq_encode(vectors, self._codebooks))
        return self

    def _set_codes(self, codes: np.ndarray):
        """Install [N, M] uint8 codes: pad N up to an item_block multiple
        (padded slots are masked in the scan) and upload. Single home for
        the pad-and-upload logic shared by train / load / unpickle."""
        n_pad = -(-len(codes) // self.item_block) * self.item_block
        padded = np.zeros((n_pad, self.num_subspaces), np.uint8)
        padded[:len(codes)] = codes
        self._codes = jnp.asarray(padded)
        self._vecs = None            # no raw vectors on device — that's the point
        self._search_fn = None

    def add(self, vectors, items=None):
        raise NotImplementedError(
            "PqSearcher.add: PQ drops the raw vectors after encoding, so an "
            "append cannot retrain the codebooks — rebuild with train() over "
            "the full corpus (FAISS PQ also requires train before add)")

    # -------------------------------------------------------------- search
    def _build_search(self, k: int):
        metric = self.metric
        num_items = self.num_items
        m, ds = self.num_subspaces, self.dim // self.num_subspaces
        bn = self.item_block
        n_pad = int(self._codes.shape[0])
        n_blocks = n_pad // bn
        k_eff = min(k, bn)           # per-block k (merged across blocks)

        def search_block(queries, codes, codebooks):
            cb16 = codebooks.astype(jnp.bfloat16)

            def one(start):
                blk = jax.lax.dynamic_slice(codes, (start, 0), (bn, m))
                onehot = jax.nn.one_hot(blk.astype(jnp.int32), 256,
                                        dtype=jnp.bfloat16)     # [Bn, M, 256]
                dec = jnp.einsum("bmk,mkd->bmd", onehot, cb16)
                dec = dec.reshape(bn, m * ds).astype(jnp.float32)
                s = queries @ dec.T                              # [Q, Bn]
                if metric == "l2":
                    s = 2.0 * s - jnp.sum(dec * dec, axis=-1)[None, :]
                gidx = start + jax.lax.broadcasted_iota(
                    jnp.int32, (queries.shape[0], bn), 1)
                s = jnp.where(gidx < num_items, s, NEG)
                bs, bp = jax.lax.top_k(s, k_eff)
                return bs, jnp.take_along_axis(gidx, bp, axis=1)

            starts = jnp.arange(n_blocks) * bn
            bs, bi = jax.lax.map(one, starts)    # [nb, Q, k_eff]
            nq = queries.shape[0]
            all_s = bs.transpose(1, 0, 2).reshape(nq, -1)
            all_i = bi.transpose(1, 0, 2).reshape(nq, -1)
            # base search clamps k <= num_items <= n_blocks * k_eff, so the
            # merged candidate pool always covers k
            top_scores, pos = jax.lax.top_k(all_s, k)
            top_idx = jnp.take_along_axis(all_i, pos, axis=1)
            if metric == "l2":
                q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
                top_scores = jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))
            return top_scores, top_idx

        jitted = jax.jit(search_block)
        return lambda q, v, sq: jitted(q, self._codes, self._codebooks)

    def _is_empty(self) -> bool:
        return self._codes is None

    def reconstruct(self, indices: np.ndarray) -> np.ndarray:
        """Decode items back to (approximate) vectors — FAISS
        Index.reconstruct parity; also the exact decode the scan scores."""
        codes = np.asarray(self._codes)[np.asarray(indices)]
        return _pq_decode_np(codes, np.asarray(self._codebooks))

    # ------------------------------------------------------------- persist
    def save(self, path: str):
        if self._codes is None:
            raise RuntimeError("nothing to save")
        np.savez_compressed(
            path, codes=np.asarray(self._codes)[:self.num_items],
            codebooks=np.asarray(self._codebooks), items=self.items,
            dim=self.dim, metric=self.metric, pq=True,
            num_subspaces=self.num_subspaces, item_block=self.item_block,
            query_block=self.query_block, seed=self.seed,
            kmeans_iters=self.kmeans_iters, train_sample=self.train_sample)

    @classmethod
    def load(cls, path: str) -> "PqSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        s = cls(int(data["dim"]), str(data["metric"]),
                num_subspaces=int(data["num_subspaces"]),
                item_block=int(data["item_block"]),
                # tuning knobs round-trip too (older files lack them)
                query_block=int(data.get("query_block", 1024)),
                seed=int(data.get("seed", 0)),
                kmeans_iters=int(data.get("kmeans_iters", 10)),
                train_sample=int(data.get("train_sample", 131072)))
        s._codebooks = jnp.asarray(data["codebooks"])
        codes = data["codes"]
        s.num_items = len(codes)
        s.items = data["items"]
        s._set_codes(codes)
        return s

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_codes"] = np.asarray(self._codes)[:self.num_items] \
            if self._codes is not None else None
        state["_codebooks"] = np.asarray(self._codebooks) \
            if self._codebooks is not None else None
        for key in ("_vecs", "_sq_norms", "_search_fn", "_vecs_g", "_sqn_g"):
            state[key] = None
        return state

    def __setstate__(self, state):
        codes = state.pop("_codes")
        cbs = state.pop("_codebooks")
        self.__dict__.update(state)
        self._search_fn = None
        self._codes = self._codebooks = None
        if codes is not None:
            self._codebooks = jnp.asarray(cbs)
            self._set_codes(codes)


class IvfPqSearcher(TpuSearcher):
    """IVF coarse quantizer + residual product quantization — FAISS
    'IVF{n},PQ{m}' parity (faiss_searcher.py:80-97 index_factory strings).

    Memory-tiered like PqSearcher: after encoding, the device holds only
    uint8 codes [N, M] of the RESIDUAL (x − centroid[assign]), the [nlist,
    D] centroids, the capped inverted lists, and the (small) decoded
    overflow pool — M + 4 bytes/item instead of 4·D. Residual coding makes
    the PQ codebooks model the within-cluster distribution, so distortion
    is far lower than plain PQ at equal code size (the classic IVFADC
    design, Jégou et al. 2011).

    TPU-native scoring: classic ADC walks a per-query [M, 256] lookup
    table with one gather per candidate per subspace — ~30 ns/element
    (CLAUDE.md perf notes) is hopeless. Here each probed list gathers
    candidate CODE rows ([Q, M_cap] rows of M bytes — the same fixed
    per-row gather cost as IVF-Flat's vector rows but 4·D/M x less HBM
    held) and scores them on the MXU: per-query LUTs lut = q_sub ·
    codebookᵀ (one [Q, M, 256] einsum per block) then a per-subspace
    one-hot(codes) · lut batched contraction under lax.scan. The q·c
    coarse term is reused from probing; for L2 the per-item ‖x̂‖² is
    precomputed at build. Recall caveats compose IVF's (clustered corpora
    probe well; isotropic ones don't) and PQ's (quantization distortion);
    the exact TpuSearcher still wins throughput at reference scales — this
    class exists for FAISS API parity and corpora beyond one chip's HBM.
    """

    # quantized decode-and-score math assumes the matmul family
    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: str = "cos", nlist: int = 1024,
                 nprobe: int = 8, num_subspaces: int = 8,
                 query_block: int = 256, cap_factor: float = 2.0,
                 kmeans_iters: int = 10, train_sample: int = 262144,
                 seed: int = 0):
        super().__init__(dim, metric, query_block=query_block)
        if dim % num_subspaces != 0:
            raise ValueError(f"dim {dim} not divisible by num_subspaces "
                             f"{num_subspaces}")
        self.nlist = nlist
        self.nprobe = nprobe
        self.num_subspaces = num_subspaces
        self.cap_factor = cap_factor
        self.kmeans_iters = kmeans_iters
        self.train_sample = train_sample
        self.seed = seed
        self._centroids = None     # [nlist, D] f32
        self._codebooks = None     # [M, 256, D/M] f32 (residual space)
        self._codes = None         # [N+1, M] uint8 on device (pad row N)
        self._assign = None        # [N] int32 host (list membership)
        self._lists = None         # [nlist, cap] int32, -1 pad
        self._overflow_idx = None  # [O] item indices
        self._overflow_dec = None  # [O, D] decoded overflow (scanned exactly)
        self._xhat_sq = None       # [N+1] ||x_hat||^2 (l2 only)

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
        m = self.num_subspaces

        # 1. coarse quantizer on a sample (one transient corpus upload —
        # raw vectors never persist on device)
        rng = np.random.RandomState(self.seed)
        padded = np.zeros((n + 1, self.dim), np.float32)
        padded[:n] = vectors
        dev = jnp.asarray(padded)
        if n <= self.train_sample:
            # jnp.take, not an eager slice: dev[:n] would copy the corpus
            sample = jnp.take(dev, jnp.arange(n), axis=0)
        else:
            sample = jnp.take(dev, jnp.asarray(
                rng.choice(n, self.train_sample, replace=False)), axis=0)
        self._centroids = kmeans(
            sample, self.nlist, iters=self.kmeans_iters, seed=self.seed,
            spherical=self.metric in ("cos", "ip"))
        self._assign = _assign_blocks(dev, self._centroids, n).astype(np.int32)
        del dev, sample

        # 2. residual PQ codebooks + encode
        resid = vectors - np.asarray(self._centroids)[self._assign]
        if n > self.train_sample:
            sample_r = resid[rng.choice(n, self.train_sample, replace=False)]
        else:
            sample_r = resid
        self._codebooks = _pq_train_codebooks(
            sample_r, m, self.kmeans_iters, self.seed)
        self._install(_pq_encode(resid, self._codebooks))
        return self

    def _install(self, codes: np.ndarray):
        """Build lists/overflow/derived stats from self._assign + codes and
        upload. Shared by train / add / load / unpickle."""
        n = self.num_items
        lists, ov = _build_capped_lists(
            self._assign.astype(np.int64), self.nlist, self.cap_factor)
        self._lists = jnp.asarray(lists)
        padded = np.zeros((n + 1, self.num_subspaces), np.uint8)
        padded[:n] = codes
        self._codes = jnp.asarray(padded)
        cb = np.asarray(self._codebooks)
        centroids = np.asarray(self._centroids)
        # decode ONLY what consumers need — a full-corpus host decode would
        # cost ~N·D·4 bytes (the very HBM this class exists to avoid)
        self._overflow_idx = ov
        self._overflow_dec = jnp.asarray(
            _pq_decode_np(codes[ov], cb) + centroids[self._assign[ov]]) \
            if len(ov) else jnp.zeros((0, self.dim), jnp.float32)
        if self.metric == "l2":
            xsq = np.zeros((n + 1,), np.float32)
            for s in range(0, n, 65536):       # blockwise: only sums persist
                dec = _pq_decode_np(codes[s:s + 65536], cb) \
                    + centroids[self._assign[s:s + 65536]]
                xsq[s:s + len(dec)] = (dec ** 2).sum(-1)
            self._xhat_sq = jnp.asarray(xsq)
        self._vecs = None
        self._search_fn = None

    def add(self, vectors, items=None):
        """Append: encode with the EXISTING quantizers (FAISS IVFPQ add
        semantics — train once, add many) and rebuild the static lists."""
        if self._codes is None:
            return self.train(vectors, items)
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {vectors.shape}")
        if self.metric == "cos":
            vectors = _l2_normalize(vectors)
        n_new = len(vectors)
        pad = np.zeros((n_new + 1, self.dim), np.float32)
        pad[:n_new] = vectors
        assign_new = _assign_blocks(
            jnp.asarray(pad), self._centroids, n_new).astype(np.int32)
        resid = vectors - np.asarray(self._centroids)[assign_new]
        codes_new = _pq_encode(resid, self._codebooks)
        old_codes = np.asarray(self._codes)[:self.num_items]
        new_items = np.asarray(items) if items is not None else \
            np.arange(self.num_items, self.num_items + n_new)
        self.items = np.concatenate([self.items, new_items])
        self._assign = np.concatenate([self._assign, assign_new])
        self.num_items += n_new
        self._install(np.concatenate([old_codes, codes_new]))
        return self

    # -------------------------------------------------------------- search
    def _is_empty(self) -> bool:
        return self._codes is None

    def _build_search(self, k: int):
        metric = self.metric
        nprobe = min(self.nprobe, self.nlist)
        num_items = self.num_items
        msub, ds = self.num_subspaces, self.dim // self.num_subspaces
        n_over = int(self._overflow_dec.shape[0])
        over_idx = jnp.asarray(self._overflow_idx.astype(np.int32)) \
            if n_over else jnp.zeros((0,), jnp.int32)
        cand_width = nprobe * int(self._lists.shape[1]) + n_over
        k_eff = min(k, cand_width)
        xhat_sq = self._xhat_sq if metric == "l2" \
            else jnp.zeros((1,), jnp.float32)

        def search_block(queries, centroids, lists, codes, codebooks,
                         over_dec, xsq):
            nq = queries.shape[0]
            qc = queries @ centroids.T                       # [Q, nlist]
            if metric == "l2":
                probe_s = 2.0 * qc - jnp.sum(
                    centroids * centroids, axis=1)[None, :]
            else:
                probe_s = qc
            _, probe = jax.lax.top_k(probe_s, nprobe)        # [Q, P]
            qct = jnp.take_along_axis(qc, probe, axis=1)     # [Q, P] q·c
            # per-query residual LUTs: q_sub · codebookᵀ, one einsum
            lut = jnp.einsum("qsd,skd->qsk",
                             queries.reshape(nq, msub, ds),
                             codebooks)                      # [Q, Msub, 256]
            lut_t = lut.transpose(1, 0, 2).astype(jnp.bfloat16)
            cand_pm = lists[probe]                           # [Q, P, M]

            def score_probe(_, inp):                         # per probed list
                ids, qc_p = inp                              # [Q, M], [Q]
                safe = jnp.where(ids >= 0, ids, num_items)
                cg = jnp.take(codes, safe, axis=0)           # [Q, M, Msub]

                def sub(acc, xs):                            # one subspace
                    c_s, l_s = xs                            # [Q, M], [Q, 256]
                    oh = jax.nn.one_hot(c_s.astype(jnp.int32), 256,
                                        dtype=jnp.bfloat16)
                    return acc + jnp.einsum(
                        "qmk,qk->qm", oh, l_s,
                        preferred_element_type=jnp.float32), None

                qr, _ = jax.lax.scan(
                    sub, jnp.zeros((nq, ids.shape[1]), jnp.float32),
                    (cg.transpose(2, 0, 1), lut_t))
                sp = qr + qc_p[:, None]                      # q·(c + r_hat)
                if metric == "l2":
                    sp = 2.0 * sp - jnp.take(xsq, safe, axis=0)
                return None, jnp.where(ids >= 0, sp, NEG)

            _, s_pm = jax.lax.scan(score_probe, None,
                                   (cand_pm.transpose(1, 0, 2), qct.T))
            s = s_pm.transpose(1, 0, 2).reshape(nq, -1)
            cand = cand_pm.reshape(nq, -1)
            if n_over:
                so = queries @ over_dec.T                    # exact pool
                if metric == "l2":
                    so = 2.0 * so - jnp.take(xsq, over_idx, axis=0)[None, :]
                s = jnp.concatenate([s, so], axis=1)
                cand = jnp.concatenate(
                    [cand, jnp.broadcast_to(over_idx[None, :], (nq, n_over))],
                    axis=1)
            top_scores, pos = jax.lax.top_k(s, k_eff)
            top_idx = jnp.maximum(jnp.take_along_axis(cand, pos, axis=1), 0)
            if k_eff < k:                 # pool smaller than k: NEG-pad tail
                padw = ((0, 0), (0, k - k_eff))
                top_scores = jnp.pad(top_scores, padw, constant_values=NEG)
                top_idx = jnp.pad(top_idx, padw)
            if metric == "l2":
                q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
                top_scores = jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))
            return top_scores, top_idx

        jitted = jax.jit(search_block)
        return lambda q, v, sq: jitted(
            q, self._centroids, self._lists, self._codes, self._codebooks,
            self._overflow_dec, xhat_sq)

    def reconstruct(self, indices: np.ndarray) -> np.ndarray:
        """centroid[assign] + decode(residual codes) — FAISS parity."""
        idx = np.atleast_1d(np.asarray(indices))
        codes = np.asarray(self._codes)[idx]
        return _pq_decode_np(codes, np.asarray(self._codebooks)) \
            + np.asarray(self._centroids)[self._assign[idx]]

    # ------------------------------------------------------------- persist
    def save(self, path: str):
        if self._codes is None:
            raise RuntimeError("nothing to save")
        np.savez_compressed(
            path, codes=np.asarray(self._codes)[:self.num_items],
            codebooks=np.asarray(self._codebooks),
            centroids=np.asarray(self._centroids), assign=self._assign,
            items=self.items, dim=self.dim, metric=self.metric, ivfpq=True,
            nlist=self.nlist, nprobe=self.nprobe,
            num_subspaces=self.num_subspaces, cap_factor=self.cap_factor,
            kmeans_iters=self.kmeans_iters, train_sample=self.train_sample,
            seed=self.seed, query_block=self.query_block)

    @classmethod
    def load(cls, path: str) -> "IvfPqSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        s = cls(int(data["dim"]), str(data["metric"]),
                nlist=int(data["nlist"]), nprobe=int(data["nprobe"]),
                num_subspaces=int(data["num_subspaces"]),
                cap_factor=float(data["cap_factor"]),
                kmeans_iters=int(data["kmeans_iters"]),
                train_sample=int(data["train_sample"]),
                seed=int(data["seed"]),
                query_block=int(data["query_block"]))
        s._centroids = jnp.asarray(data["centroids"])
        s._codebooks = jnp.asarray(data["codebooks"])
        s._assign = data["assign"].astype(np.int32)
        s.items = data["items"]
        s.num_items = len(s._assign)
        s._install(data["codes"])
        return s

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_codes"] = np.asarray(self._codes)[:self.num_items] \
            if self._codes is not None else None
        state["_centroids"] = np.asarray(self._centroids) \
            if self._centroids is not None else None
        state["_codebooks"] = np.asarray(self._codebooks) \
            if self._codebooks is not None else None
        for key in ("_vecs", "_sq_norms", "_search_fn", "_vecs_g", "_sqn_g",
                    "_lists", "_overflow_idx", "_overflow_dec", "_xhat_sq"):
            state[key] = None
        return state

    def __setstate__(self, state):
        codes = state.pop("_codes")
        self.__dict__.update(state)
        self._search_fn = None
        self._codes = None
        if codes is not None:
            self._centroids = jnp.asarray(state["_centroids"])
            self._codebooks = jnp.asarray(state["_codebooks"])
            self._install(codes)


class SqSearcher(TpuSearcher):
    """Scalar-quantized exact scan — FAISS 'SQ8' / 'SQfp16' parity
    (faiss_searcher.py:80-97 index_factory strings).

    qtype='sq8': per-dim affine uint8 codes (4x compression). The scan
    never dequantizes the corpus: with x̂ = vmin + scale ⊙ code,
    q·x̂ = q·vmin + (q ⊙ scale)·code — so each block costs ONE
    [Q, D] x [D, Bn] bf16 matmul over the uint8 codes cast in-register
    (bf16 represents integers <= 256 exactly, so the cast is lossless).

    qtype='bf16': stores bf16 codes directly — the TPU-native stand-in for
    FAISS SQfp16 (fp16 has no TPU hardware path; bf16 does, and TPU f32
    matmuls compute at bf16 input precision anyway — CLAUDE.md perf notes),
    2x compression at effectively exact recall.

    Unlike PQ there is no codebook training; like the exact searcher,
    recall is data-independent (SQ8's only loss is 8-bit rounding).
    """

    # quantized decode-and-score math assumes the matmul family
    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: str = "cos", qtype: str = "sq8",
                 item_block: int = 65536, query_block: int = 1024):
        super().__init__(dim, metric, query_block=query_block)
        if qtype not in ("sq8", "bf16"):
            raise ValueError(f"qtype must be sq8|bf16, got '{qtype}'")
        self.qtype = qtype
        self.item_block = item_block
        self._codes = None        # [N_pad, D] uint8 | bf16 on device
        self._vmin = None         # [D] f32 (sq8)
        self._scale = None        # [D] f32 (sq8)
        self._xhat_sq = None      # [N_pad] f32 (l2)
        self._codes_g = None      # [N_pad/G, G, D] grouped view (hier path)
        self._xsq_g = None        # [N_pad/G, G] grouped norms (hier l2)

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
        if self.qtype == "sq8":
            vmin = vectors.min(axis=0)
            vdiff = vectors.max(axis=0) - vmin
            scale = np.where(vdiff > 0, vdiff / 255.0, 1.0).astype(np.float32)
            self._vmin = jnp.asarray(vmin.astype(np.float32))
            self._scale = jnp.asarray(scale)
            self._restore_codes(self._encode(vectors))
        else:
            self._restore_codes(vectors)
        return self

    def _encode(self, vectors: np.ndarray) -> np.ndarray:
        """Quantize with the CURRENT per-dim ranges (out-of-range clips —
        FAISS SQ semantics: the quantizer is fit at train and frozen)."""
        vmin, scale = np.asarray(self._vmin), np.asarray(self._scale)
        return np.clip(np.rint((vectors - vmin) / scale), 0, 255) \
            .astype(np.uint8)

    def add(self, vectors, items=None):
        """Append, encoding with the EXISTING quantizer (FAISS SQ add
        semantics: ranges are fit at train() and frozen — re-encoding old
        codes onto a refit grid would compound rounding error across adds).
        Values outside the trained ranges clip; rebuild with train() when
        the distribution drifts."""
        if self._codes is None:
            return self.train(vectors, items)
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {vectors.shape}")
        if self.metric == "cos":
            vectors = _l2_normalize(vectors)
        old = np.asarray(self._codes)[:self.num_items]   # contiguous slice
        new_items = np.asarray(items) if items is not None else \
            np.arange(self.num_items, self.num_items + len(vectors))
        self.items = np.concatenate([self.items, new_items])
        self.num_items += len(vectors)
        if self.qtype == "sq8":
            self._restore_codes(np.concatenate([old, self._encode(vectors)]))
        else:
            self._restore_codes(np.concatenate(
                [old.astype(np.float32), vectors]))
        return self

    # -------------------------------------------------------------- search
    def _is_empty(self) -> bool:
        return self._codes is None

    def _build_search(self, k: int):
        metric = self.metric
        qtype = self.qtype
        num_items = self.num_items
        dim = self.dim
        bn = self.item_block
        n_pad = int(self._codes.shape[0])
        n_blocks = n_pad // bn
        k_eff = min(k, bn)
        xhat_sq = self._xhat_sq if metric == "l2" \
            else jnp.zeros((1,), jnp.float32)
        vmin = self._vmin if qtype == "sq8" else jnp.zeros((1,), jnp.float32)
        scale = self._scale if qtype == "sq8" else jnp.zeros((1,), jnp.float32)

        # ---- grouped-tournament path (the exact searcher's pruning, over
        # quantized codes): per-block [Q, n, G] scores reduce to group
        # maxima WITHOUT any wide top_k (lax.top_k over 65k-wide block rows
        # made the flat scan ~20x slower than Flat at 10M — measured
        # 254 vs 5761 qps, benchmarks/bench_quantized_search.py); the k
        # winning groups rescore from gathered code tiles dequantized via
        # the same affine identity. Group maxima compute in bf16 (f32
        # accum) while the rescore is f32 — a borderline group can in
        # principle differ in the last bf16 ulp, so recall is ~=1 rather
        # than provably 1 relative to the quantized scores (the codes are
        # already approximate vs the original vectors).
        G, G2 = _GROUP, _SUPERGROUP
        if (n_pad % (G * G2) == 0 and n_pad // (G * G2) > max(k, 64)
                and n_pad >= _HIER_MIN_ITEMS and bn % G == 0):
            if self._codes_g is None:
                self._codes_g = jax.jit(
                    lambda c: c.reshape(n_pad // G, G, dim))(self._codes)
                if metric == "l2":
                    self._xsq_g = jax.jit(
                        lambda s: s.reshape(n_pad // G, G))(self._xhat_sq)
            xsq_g = self._xsq_g if metric == "l2" \
                else jnp.zeros((1, G), jnp.float32)
            # both code dtypes ride the exact path's fused Pallas scan
            # (scores + group max with the [Q, N] matrix never touching
            # HBM) whenever the Mosaic shape constraints hold: bf16 codes
            # directly, sq8's uint8 codes via the kernel's in-VMEM cast
            # (integers <= 255 are exact in bf16, so the dequant-free
            # scoring identity q·x̂ = base + qs·codes still holds)
            use_kernel = (jax.default_backend() != "cpu"
                          and dim % 128 == 0 and n_pad % (128 * G) == 0)

            def search_hier(queries, codes2d, codes_g, vmin, scale, xsq_g):
                nq = queries.shape[0]
                if qtype == "sq8":
                    qs = queries * scale[None, :]
                    base = queries @ vmin                      # [Q]
                else:
                    qs = queries
                    base = jnp.zeros((nq,), jnp.float32)
                # f32 scan (not bf16): selection and rescore must agree —
                # TPU f32 matmuls compute at bf16 MXU precision anyway
                # (CLAUDE.md: bf16 scan output was bit-identical), so f32
                # costs nothing and keeps the tournament self-consistent
                gb = bn // G                                   # groups/block

                def one(gstart):
                    blk = jax.lax.dynamic_slice(
                        codes_g, (gstart, 0, 0), (gb, G, dim))
                    s = jnp.einsum("qd,ngd->qng", qs,
                                   blk.astype(jnp.float32),
                                   preferred_element_type=jnp.float32)
                    s = s + base[:, None, None]
                    item = ((gstart + jax.lax.broadcasted_iota(
                        jnp.int32, (1, gb, G), 1)) * G
                        + jax.lax.broadcasted_iota(jnp.int32, (1, gb, G), 2))
                    if metric == "l2":
                        s = 2.0 * s - jax.lax.dynamic_slice(
                            xsq_g, (gstart, 0), (gb, G))[None]
                    s = jnp.where(item < num_items, s, NEG)
                    return jnp.max(s, axis=-1)                 # [Q, gb]

                if use_kernel:
                    from recommendflow_tpu.ops.pallas.grouped_topk import (
                        grouped_score_max)
                    m1 = grouped_score_max(
                        qs, codes2d,
                        self._xhat_sq if metric == "l2" else None,
                        group=G, num_items=num_items).T
                else:
                    starts = jnp.arange(n_blocks) * gb
                    m1b = jax.lax.map(one, starts)             # [nb, Q, gb]
                    m1 = m1b.transpose(1, 0, 2).reshape(nq, n_pad // G)
                top_scores, top_idx = _tournament_select(
                    qs.astype(jnp.float32), m1, codes_g, xsq_g, k, k,
                    num_items, metric, base=base)
                if metric == "l2":
                    q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
                    top_scores = jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))
                return top_scores, top_idx

            jitted = jax.jit(search_hier)
            return lambda q, v, sq: jitted(q, self._codes, self._codes_g,
                                           vmin, scale, xsq_g)

        def search_block(queries, codes, vmin, scale, xsq):
            nq = queries.shape[0]
            if qtype == "sq8":
                qs = (queries * scale[None, :]).astype(jnp.bfloat16)
                base = queries @ vmin                        # [Q]
            else:
                qs = queries.astype(jnp.bfloat16)
                base = jnp.zeros((nq,), jnp.float32)

            def one(start):
                blk = jax.lax.dynamic_slice(codes, (start, 0), (bn, dim))
                s = jnp.einsum("qd,nd->qn", qs, blk.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                s = s + base[:, None]
                if metric == "l2":
                    s = 2.0 * s - jax.lax.dynamic_slice(
                        xsq, (start,), (bn,))[None, :]
                gidx = start + jax.lax.broadcasted_iota(
                    jnp.int32, (nq, bn), 1)
                s = jnp.where(gidx < num_items, s, NEG)
                bs, bp = jax.lax.top_k(s, k_eff)
                return bs, jnp.take_along_axis(gidx, bp, axis=1)

            starts = jnp.arange(n_blocks) * bn
            bs, bi = jax.lax.map(one, starts)                # [nb, Q, k_eff]
            all_s = bs.transpose(1, 0, 2).reshape(nq, -1)
            all_i = bi.transpose(1, 0, 2).reshape(nq, -1)
            # base search clamps k <= num_items <= n_blocks * k_eff
            top_scores, pos = jax.lax.top_k(all_s, k)
            top_idx = jnp.take_along_axis(all_i, pos, axis=1)
            if metric == "l2":
                q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
                top_scores = jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))
            return top_scores, top_idx

        jitted = jax.jit(search_block)
        return lambda q, v, sq: jitted(q, self._codes, vmin, scale, xhat_sq)

    def reconstruct(self, indices: np.ndarray) -> np.ndarray:
        """Dequantize items — FAISS Index.reconstruct parity."""
        idx = np.atleast_1d(np.asarray(indices))
        codes = np.asarray(self._codes)[idx]
        if self.qtype == "sq8":
            return np.asarray(self._vmin) + \
                np.asarray(self._scale) * codes.astype(np.float32)
        return codes.astype(np.float32)

    # ------------------------------------------------------------- persist
    def save(self, path: str):
        if self._codes is None:
            raise RuntimeError("nothing to save")
        extra = {}
        if self.qtype == "sq8":
            extra = {"vmin": np.asarray(self._vmin),
                     "scale": np.asarray(self._scale)}
        np.savez_compressed(
            path, codes=np.asarray(self._codes)[:self.num_items].astype(
                np.uint8 if self.qtype == "sq8" else np.float32),
            items=self.items, dim=self.dim, metric=self.metric, sq=True,
            qtype=self.qtype, item_block=self.item_block,
            query_block=self.query_block, **extra)

    @classmethod
    def load(cls, path: str) -> "SqSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        s = cls(int(data["dim"]), str(data["metric"]),
                qtype=str(data["qtype"]), item_block=int(data["item_block"]),
                query_block=int(data["query_block"]))
        s.items = data["items"]
        s.num_items = len(data["codes"])
        if s.qtype == "sq8":
            s._vmin = jnp.asarray(data["vmin"])
            s._scale = jnp.asarray(data["scale"])
            s._restore_codes(data["codes"])
        else:
            s._restore_codes(data["codes"].astype(np.float32))
        return s

    # padding/placement hooks — ShardedSqSearcher overrides these three to
    # shard the same restore logic over a mesh (sharded.py)
    def _pad_rows(self, n: int) -> int:
        return -(-n // self.item_block) * self.item_block

    def _put_codes(self, padded: np.ndarray):
        return jnp.asarray(padded)

    def _put_norms(self, xsq: np.ndarray):
        return jnp.asarray(xsq)

    def _restore_codes(self, codes: np.ndarray):
        """Pad (via _pad_rows) and upload (via _put_*); l2 additionally
        needs per-item ‖x̂‖² (computed blockwise — the f32 decode never
        fully materializes). Single home shared by train / add / load /
        unpickle, and by the sharded subclass via the placement hooks."""
        n = len(codes)
        n_pad = self._pad_rows(n)
        if self.qtype == "sq8":
            padded = np.zeros((n_pad, self.dim), np.uint8)
            padded[:n] = codes
        else:
            # allocate bf16 directly (2 B/elem host peak, not 6): blockwise
            # assignment casts f32 -> bf16 without a full-corpus temp
            padded = np.zeros((n_pad, self.dim), jnp.bfloat16)
            for s in range(0, n, 65536):
                blk = codes[s:s + 65536]
                padded[s:s + len(blk)] = blk
        self._codes = self._put_codes(padded)
        if self.metric == "l2":
            xsq = np.zeros((n_pad,), np.float32)
            for s in range(0, n, 65536):
                blk = codes[s:s + 65536]
                dec = (np.asarray(self._vmin) +
                       np.asarray(self._scale) * blk.astype(np.float32)) \
                    if self.qtype == "sq8" else \
                    blk.astype(jnp.bfloat16).astype(np.float32)
                xsq[s:s + len(blk)] = (dec ** 2).sum(-1)
            self._xhat_sq = self._put_norms(xsq)
        self._vecs = None
        self._search_fn = None
        self._codes_g = self._xsq_g = None  # grouped relayouts, built lazily

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_codes"] = np.asarray(self._codes)[:self.num_items] \
            if self._codes is not None else None
        state["_vmin"] = np.asarray(self._vmin) \
            if self._vmin is not None else None
        state["_scale"] = np.asarray(self._scale) \
            if self._scale is not None else None
        for key in ("_vecs", "_sq_norms", "_search_fn", "_vecs_g", "_sqn_g",
                    "_xhat_sq", "_codes_g", "_xsq_g"):
            state[key] = None
        return state

    def __setstate__(self, state):
        codes = state.pop("_codes")
        self.__dict__.update(state)
        self._search_fn = None
        self._codes = None
        if codes is not None:
            if self._vmin is not None:
                self._vmin = jnp.asarray(self._vmin)
                self._scale = jnp.asarray(self._scale)
            self._restore_codes(np.asarray(codes))


def index_factory(dim: int, index_param: str = "Flat",
                  metric: str = "cos", **kwargs) -> TpuSearcher:
    """FAISS index_factory-style constructor (parity:
    faiss_searcher.py:80-97): 'Flat' -> exact TpuSearcher;
    'IVF{n},Flat' / 'IVF{n}' -> IvfSearcher with n lists;
    'PQ{m}' / 'PQ{m}x8' -> PqSearcher with m subspaces (8-bit codes);
    'IVF{n},PQ{m}[x8]' -> IvfPqSearcher (residual PQ in probed lists);
    'SQ8' / 'SQfp16' / 'SQbf16' -> SqSearcher (scalar quantization; fp16
    maps to bf16 — the TPU-native half precision).

    Pass mesh=<jax.sharding.Mesh> to row-shard the corpus over devices
    (the reference's multi-GPU sharded-index option,
    faiss_searcher.py:119-130): 'Flat' -> ShardedSearcher, SQ* ->
    ShardedSqSearcher. IVF/PQ have no sharded variant (they lose to the
    sharded scans on TPU at every measured scale — COVERAGE.md §2.8)."""
    import re as _re
    spec = (index_param or "Flat").strip()
    mesh = kwargs.pop("mesh", None)
    m = _re.match(r"^SQ(8|fp16|bf16)$", spec, _re.IGNORECASE)
    if m:
        qtype = "sq8" if m.group(1) == "8" else "bf16"
        if mesh is not None:
            from recommendflow_tpu.retrieval.sharded import ShardedSqSearcher
            return ShardedSqSearcher(dim, metric, qtype=qtype, mesh=mesh,
                                     **kwargs)
        return SqSearcher(dim, metric, qtype=qtype, **kwargs)
    if mesh is not None:
        if spec.lower() != "flat":
            raise ValueError(
                f"mesh sharding supports Flat and SQ* indices, not '{spec}'")
        from recommendflow_tpu.retrieval.sharded import ShardedSearcher
        return ShardedSearcher(dim, metric, mesh=mesh, **kwargs)
    m = _re.match(r"^IVF(\d+),PQ(\d+)(x8)?$", spec, _re.IGNORECASE)
    if m:
        return IvfPqSearcher(dim, metric, nlist=int(m.group(1)),
                             num_subspaces=int(m.group(2)), **kwargs)
    m = _re.match(r"^IVF(\d+)(,Flat)?$", spec, _re.IGNORECASE)
    if m:
        return IvfSearcher(dim, metric, nlist=int(m.group(1)), **kwargs)
    m = _re.match(r"^PQ(\d+)(x8)?$", spec, _re.IGNORECASE)
    if m:
        return PqSearcher(dim, metric, num_subspaces=int(m.group(1)), **kwargs)
    if spec.lower() == "flat":
        return TpuSearcher(dim, metric, **kwargs)
    raise ValueError(f"unsupported index_param '{index_param}' "
                     "(supported: Flat, IVF{n}[,Flat], PQ{m}[x8], "
                     "IVF{n},PQ{m}[x8], SQ8, SQfp16/SQbf16)")
