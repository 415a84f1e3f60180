"""Host-RAM corpus tier: beyond-HBM search on a single chip.

FAISS is a CPU library whose indices are bounded by host RAM — tens of GB
(reference surface: backend/third_party_components/faiss_searcher.py:23-225,
index_factory strings :108-130). The device-resident searchers here cap at
one chip's HBM (~10M x 128 f32, ~40M at SQ8). This module closes that
asymmetry the TPU way: the corpus (scalar-quantized codes, or raw f32 for
the exact tier) lives in HOST numpy, and search() streams it through the
device in double-buffered blocks — device_put of block i+1 is in flight
while the MXU scans block i, so the scan rides the host->device link at
full bandwidth. Each block is reduced on device to its local top-k by the
same grouped-tournament used by the HBM-resident searchers
(_kernels._tournament_select; Pallas fused m1 scan when Mosaic shapes
allow), then a final [Q, n_blocks*k] top-k merges the per-block winners —
exact over the quantized scores by the same argument as the sharded merge
(a global top-k item is a local top-k item of its block).

Cost model: every search() streams the whole code matrix over PCIe/ICI
once per query block, so throughput is transfer-bound at
(link GB/s) / (bytes per row) rows/s, independent of Q up to compute
saturation — batch queries as large as possible (query_block=2048
default). That is the honest price of beyond-HBM capacity; an IVF-style
host tier that transfers only probed lists wins at SMALL query batches but
re-transfers overlapping lists at large ones (see CLAUDE.md "IVF future
lever" — revisit if online low-latency host-scale serving matters more
than bulk throughput).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from recommendflow_tpu.retrieval import _kernels
from recommendflow_tpu.retrieval._kernels import (
    NEG, _GROUP, _SUPERGROUP, _l2_normalize, _tournament_select,
    resolve_metric,
)

try:  # host-side bf16 storage (2x compression) — ships with jax
    import ml_dtypes
    _BF16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover - ml_dtypes is a jax dependency
    _BF16 = np.dtype(np.float32)


class StreamingSqSearcher:
    """Host-resident (streamed) scalar-quantized / exact searcher.

    qtype: 'bf16' (2x, recall ~= 1), 'sq8' (4x, recall ~0.97 at 10M
    clustered — regime table in COVERAGE.md §2.8), or 'f32' (exact host
    Flat tier — FAISS CPU 'Flat' parity at host-RAM scale).

    train() accepts one [N, D] array OR a sequence of [n_i, D] blocks
    (so a 25 GB corpus can arrive from memory-mapped files without an
    extra resident copy; sq8 needs two passes, so a generator must be
    materialized into a list of blocks first).
    """

    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: Union[str, int] = "cos",
                 qtype: str = "bf16", block_items: int = 1 << 20,
                 query_block: int = 2048):
        metric = resolve_metric(metric)
        if metric not in self.SUPPORTED_METRICS:
            raise ValueError(
                f"metric '{metric}' not in {self.SUPPORTED_METRICS}")
        if qtype not in ("bf16", "sq8", "f32"):
            raise ValueError(f"qtype must be bf16|sq8|f32, got '{qtype}'")
        G, G2 = _GROUP, _SUPERGROUP
        if block_items % (G * G2):
            raise ValueError(f"block_items must be a multiple of {G * G2}")
        self.dim = dim
        self.metric = metric
        self.qtype = qtype
        self.block_items = int(block_items)
        self.query_block = int(query_block)
        self.items: Optional[np.ndarray] = None
        self.num_items = 0
        self._codes: Optional[np.ndarray] = None    # [N, D] HOST bf16|u8|f32
        self._xsq: Optional[np.ndarray] = None      # [N] f32 host (l2)
        self._vmin = None                           # [D] f32 (sq8)
        self._scale = None
        self._search_fns = {}

    # --------------------------------------------------------------- build
    @staticmethod
    def _as_blocks(vectors) -> Sequence[np.ndarray]:
        if isinstance(vectors, np.ndarray):
            return [vectors]
        return list(vectors)

    def _host_dtype(self):
        return {"bf16": _BF16, "sq8": np.uint8,
                "f32": np.dtype(np.float32)}[self.qtype]

    def train(self, vectors, items: Optional[Sequence[Any]] = None):
        blocks = self._as_blocks(vectors)
        n = sum(len(b) for b in blocks)
        if any(b.ndim != 2 or b.shape[1] != self.dim for b in blocks):
            raise ValueError(f"expected [*, {self.dim}] blocks")
        if self.qtype == "sq8":
            # pass 1: global per-dim ranges (FAISS SQ semantics — the
            # quantizer is fit over the whole corpus, then frozen)
            vmin = np.full((self.dim,), np.inf, np.float32)
            vmax = np.full((self.dim,), -np.inf, np.float32)
            for b in blocks:
                v = b.astype(np.float32, copy=False)
                if self.metric == "cos":
                    v = _l2_normalize(v)
                np.minimum(vmin, v.min(axis=0), out=vmin)
                np.maximum(vmax, v.max(axis=0), out=vmax)
            diff = vmax - vmin
            self._vmin = vmin
            self._scale = np.where(diff > 0, diff / 255.0, 1.0) \
                .astype(np.float32)
        self._codes = np.empty((n, self.dim), self._host_dtype())
        self._xsq = np.empty((n,), np.float32) if self.metric == "l2" \
            else None
        pos = 0
        for b in blocks:
            pos = self._encode_into(b, pos)
        self.num_items = n
        self.items = np.asarray(items) if items is not None \
            else np.arange(n)
        self._search_fns = {}
        return self

    def _encode_into(self, block: np.ndarray, pos: int) -> int:
        v = block.astype(np.float32, copy=False)
        if self.metric == "cos":
            v = _l2_normalize(v)
        e = pos + len(v)
        if self.qtype == "sq8":
            self._codes[pos:e] = np.clip(
                np.rint((v - self._vmin) / self._scale), 0, 255)
            if self._xsq is not None:
                xhat = self._vmin + self._scale * self._codes[pos:e]
                self._xsq[pos:e] = (xhat ** 2).sum(-1)
        else:
            self._codes[pos:e] = v      # bf16 rounds here; f32 exact
            if self._xsq is not None:
                xhat = self._codes[pos:e].astype(np.float32)
                self._xsq[pos:e] = (xhat ** 2).sum(-1)
        return e

    def add(self, vectors, items=None):
        """Append with the frozen quantizer (FAISS SQ add semantics)."""
        if self._codes is None:
            return self.train(vectors, items)
        blocks = self._as_blocks(vectors)
        n_new = sum(len(b) for b in blocks)
        old_n = self.num_items
        self._codes = np.concatenate(
            [self._codes, np.empty((n_new, self.dim), self._host_dtype())])
        if self._xsq is not None:
            self._xsq = np.concatenate(
                [self._xsq, np.empty((n_new,), np.float32)])
        pos = old_n
        for b in blocks:
            pos = self._encode_into(b, pos)
        new_items = np.asarray(items) if items is not None else \
            np.arange(old_n, old_n + n_new)
        self.items = np.concatenate([self.items, new_items])
        self.num_items += n_new
        self._search_fns = {}
        return self

    # -------------------------------------------------------------- search
    def _block_fn(self, k: int, bn: int, valid: int):
        """Jitted per-block local top-k: (queries_scaled [Q, D] f32,
        codes [bn, D], xsq [bn]) -> (surrogate scores [Q, k], local idx).

        Scores omit the per-query sq8 affine base (rank-preserving within a
        query, hence across this query's blocks too); search() adds the
        base / l2 finish after the cross-block merge.
        """
        metric, qtype, dim = self.metric, self.qtype, self.dim
        G, G2 = _GROUP, _SUPERGROUP
        key = (k, bn, valid)
        if key in self._search_fns:
            return self._search_fns[key]
        use_kernel = (jax.default_backend() != "cpu"
                      and dim % 128 == 0 and bn % (128 * G) == 0)
        hier = bn // (G * G2) >= max(k, 2)

        def fn(qs, codes, xsq):
            nq = qs.shape[0]
            if hier:
                if use_kernel:
                    from recommendflow_tpu.ops.pallas.grouped_topk import (
                        grouped_score_max)
                    m1 = grouped_score_max(
                        qs, codes, xsq if metric == "l2" else None,
                        group=G, num_items=valid).T
                else:
                    # compute the dot TRANSPOSED so groups lie on sublanes
                    # (Mosaic rejects lane-splitting casts; same trick as
                    # the HBM-resident SQ scan)
                    s = jnp.einsum("nd,qd->nq", codes.astype(jnp.float32),
                                   qs, preferred_element_type=jnp.float32)
                    if metric == "l2":
                        s = 2.0 * s - xsq[:, None]
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (bn, 1), 0)
                    s = jnp.where(row < valid, s, NEG)
                    m1 = jnp.max(s.reshape(bn // G, G, nq), axis=1).T
                codes_g = codes.reshape(bn // G, G, dim)
                xsq_g = xsq.reshape(bn // G, G) if metric == "l2" \
                    else jnp.zeros((1, G), jnp.float32)
                return _tournament_select(
                    qs, m1, codes_g, xsq_g, k, min(k, bn // (G * G2)),
                    valid, metric)
            # tiny-block fallback: full scores + top_k (test regime)
            s = jnp.einsum("qd,nd->qn", qs, codes.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            if metric == "l2":
                s = 2.0 * s - xsq[None, :]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, bn), 1)
            s = jnp.where(col < valid, s, NEG)
            return jax.lax.top_k(s, k)

        jitted = jax.jit(fn)
        self._search_fns[key] = jitted
        return jitted

    def search(self, queries: np.ndarray,
               topk: Union[int, Sequence[int]] = 10,
               return_items: bool = True):
        """Same surface as TpuSearcher.search (items, scores, idx / per-k
        dict slicing for list topk)."""
        if self._codes is None:
            raise RuntimeError("searcher is empty — call train() first")
        ks = sorted({int(k) for k in
                     (topk if isinstance(topk, (list, tuple)) else [topk])})
        k_max = min(max(ks), self.num_items)
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.metric == "cos":
            queries = _l2_normalize(queries)

        out_scores, out_idx = [], []
        for qstart in range(0, len(queries), self.query_block):
            qblk = queries[qstart:qstart + self.query_block]
            s, i = self._search_impl(qblk, k_max)
            out_scores.append(s)
            out_idx.append(i)
        scores = np.concatenate(out_scores, axis=0)
        idx = np.concatenate(out_idx, axis=0)

        def slice_k(arr):
            return arr if len(ks) == 1 else {k: arr[:, :k] for k in ks}

        if return_items and self.items is not None:
            return slice_k(self.items[idx]), slice_k(scores), slice_k(idx)
        return slice_k(scores), slice_k(idx)

    def _search_impl(self, queries: np.ndarray, k: int):
        """Per-query-block search body; HostIvfSearcher overrides this to
        score only the probed-cluster union (search() stays shared)."""
        return self._search_block_of_queries(queries, k)

    def _search_block_of_queries(self, queries: np.ndarray, k: int):
        n, bn = self.num_items, self.block_items
        n_blocks = -(-n // bn)
        if self.qtype == "sq8":
            qs = queries * self._scale[None, :]
            base = queries @ self._vmin                      # [Q]
        else:
            qs, base = queries, None
        qs_dev = jnp.asarray(qs, jnp.float32)

        def put(i):
            """Host block -> device, zero-padding the tail block (a host
            copy of at most one block). device_put is async — issued for
            block i+1 before block i's compute is dispatched below."""
            s, e = i * bn, min((i + 1) * bn, n)
            cb = self._codes[s:e]
            xb = self._xsq[s:e] if self._xsq is not None else None
            if e - s < bn:
                pad = np.zeros((bn, self.dim), self._codes.dtype)
                pad[:e - s] = cb
                cb = pad
                if xb is not None:
                    xpad = np.full((bn,), np.inf, np.float32)
                    xpad[:e - s] = xb
                    xb = xpad
            return (jax.device_put(cb),
                    jax.device_put(xb) if xb is not None
                    else jnp.zeros((bn,), jnp.float32))

        results = []
        nxt = put(0)
        for i in range(n_blocks):
            cur, nxt = nxt, (put(i + 1) if i + 1 < n_blocks else None)
            valid = min(n - i * bn, bn)
            fn = self._block_fn(min(k, valid), bn, valid)
            s, li = fn(qs_dev, *cur)
            if s.shape[1] < k:      # tail block smaller than k: pad NEG
                padw = k - s.shape[1]
                s = jnp.pad(s, ((0, 0), (0, padw)), constant_values=NEG)
                li = jnp.pad(li, ((0, 0), (0, padw)))
            results.append((s, li + i * bn))

        cat_s = jnp.concatenate([s for s, _ in results], axis=1)
        cat_i = jnp.concatenate([i for _, i in results], axis=1)
        top_s, pos = jax.lax.top_k(cat_s, k)                  # [Q, k]
        top_i = jnp.take_along_axis(cat_i, pos, axis=1)
        top_s = np.asarray(top_s)
        top_i = np.asarray(top_i)
        # deferred per-query corrections (rank-preserving, so applied after
        # selection): the sq8 affine base, and the l2 surrogate -> distance
        if self.metric == "l2":
            q_sq = (queries ** 2).sum(-1, keepdims=True)
            surr = top_s + (2.0 * base[:, None] if base is not None else 0.0)
            top_s = np.sqrt(np.maximum(q_sq - surr, 0.0))
        elif base is not None:
            top_s = top_s + base[:, None]
        return top_s, top_i

    # ------------------------------------------------------------- persist
    def _dequant_stored(self, lo: int, hi: int) -> np.ndarray:
        """Dequantize codes[lo:hi] in STORED order (for HostIvfSearcher
        storage is cluster-sorted; reconstruct() maps original ids)."""
        codes = self._codes[lo:hi]
        if self.qtype == "sq8":
            return self._vmin + self._scale * codes.astype(np.float32)
        return codes.astype(np.float32)

    def reconstruct(self, indices: np.ndarray) -> np.ndarray:
        idx = np.asarray(indices)
        codes = self._codes[idx]
        if self.qtype == "sq8":
            return self._vmin + self._scale * codes.astype(np.float32)
        return codes.astype(np.float32)

    def _save_extra(self) -> dict:
        """Subclass hook: extra arrays to persist alongside the codes."""
        return {}

    def save(self, path: str):
        if self._codes is None:
            raise RuntimeError("nothing to save")
        extra = self._save_extra()
        if self.qtype == "sq8":
            extra.update(vmin=self._vmin, scale=self._scale)
        if self._xsq is not None:
            extra["xsq"] = self._xsq          # 4 B/row beats a reload pass
        np.savez(path, codes=self._codes.view(
                     np.uint16 if self._codes.dtype == _BF16
                     and _BF16 != np.float32 else self._codes.dtype),
                 qtype=self.qtype, items=self.items, dim=self.dim,
                 metric=self.metric, block_items=self.block_items,
                 query_block=self.query_block, host=True, **extra)

    @classmethod
    def load(cls, path: str) -> "StreamingSqSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        if "host_ivf" in getattr(data, "files", ()) \
                and cls is StreamingSqSearcher:
            # a HostIvf file's codes are cluster-permuted — loading it as
            # the streaming tier would silently return wrong item ids
            return HostIvfSearcher.load(path)
        s = cls(int(data["dim"]), str(data["metric"]),
                qtype=str(data["qtype"]),
                block_items=int(data["block_items"]),
                query_block=int(data["query_block"]))
        s._load_common(data)
        return s

    def _load_common(self, data):
        codes = data["codes"]
        if self.qtype == "bf16" and codes.dtype == np.uint16:
            codes = codes.view(_BF16)
        self._codes = codes
        self.num_items = len(codes)
        self.items = data["items"]
        if self.qtype == "sq8":
            self._vmin = np.asarray(data["vmin"])
            self._scale = np.asarray(data["scale"])
        if self.metric == "l2":
            if "xsq" in getattr(data, "files", ()):
                self._xsq = np.asarray(data["xsq"], np.float32)
            else:  # pre-sidecar file: one host pass over the stored codes
                self._xsq = np.empty((self.num_items,), np.float32)
                for st in range(0, self.num_items, self.block_items):
                    e = min(st + self.block_items, self.num_items)
                    xhat = self._dequant_stored(st, e)
                    self._xsq[st:e] = (xhat ** 2).sum(-1)


class HostIvfSearcher(StreamingSqSearcher):
    """Host-resident IVF: cluster-contiguous inverted lists in host RAM,
    search transfers ONLY the probed clusters.

    The complement of StreamingSqSearcher's bulk-throughput regime: instead
    of streaming the whole corpus once per query block, train() reorders
    the (quantized) corpus so each k-means cluster is one CONTIGUOUS host
    slice (the measured 2.3x contiguous-read layout, CLAUDE.md "IVF future
    lever"), and search() ships just the union of the probed clusters to
    the device. At nlist=4096/nprobe=16 a single query touches ~0.4% of the
    corpus — ~250x less transfer than a full stream — which is the regime
    that matters for ONLINE host-scale serving (a few queries at a time,
    latency-bound). For bulk query batches the probe union approaches the
    whole corpus and the streaming scan wins; pick by workload. Recall is
    IVF-approximate (probe misses), quantization per StreamingSqSearcher.

    Scoring is exact over the shipped union: every query in the block is
    scored against the WHOLE union (a superset of its own probed lists —
    extra candidates only raise recall; the MXU flops are negligible next
    to the transfer). Packed sizes are bucketed to {1, 1.5}x powers of two
    so jit recompiles stay logarithmic while shipped zero-padding stays
    <= 33%.

    Parity surface: FAISS host-RAM 'IVF{n},SQ8'-style indices
    (faiss_searcher.py:108-130).
    """

    def __init__(self, dim: int, metric: Union[str, int] = "cos",
                 qtype: str = "sq8", nlist: int = 4096, nprobe: int = 16,
                 block_items: int = 1 << 20, query_block: int = 64,
                 train_sample: int = 1 << 20, kmeans_iters: int = 10,
                 seed: int = 0):
        super().__init__(dim, metric, qtype=qtype, block_items=block_items,
                         query_block=query_block)
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.train_sample = int(train_sample)
        self.kmeans_iters = int(kmeans_iters)
        self.seed = int(seed)
        self._centroids = None     # [nlist, D] f32 device
        self._offsets = None       # [nlist+1] int64 host
        self._order = None         # [N] int64: original index per stored pos
        self._score_fns = {}
        self._probe_fn = None
        self._c_sq = None

    # --------------------------------------------------------------- build
    def train(self, vectors, items: Optional[Sequence[Any]] = None):
        blocks = self._as_blocks(vectors)
        n = sum(len(b) for b in blocks)
        if n < max(self.nlist, 1):
            raise ValueError(f"corpus size {n} < nlist={self.nlist}")
        if min(self.train_sample, n) < self.nlist:
            # kmeans would init with replacement -> silent duplicate
            # centroids, empty clusters, degraded recall
            raise ValueError(
                f"train_sample={self.train_sample} < nlist={self.nlist}: "
                "raise train_sample (kmeans needs >= nlist sample rows)")
        # a previous train()'s permutation must not leak into the
        # original-order reconstruct calls below
        self._order = None
        self._inv_order = None
        # 1) fit the scalar quantizer + encode in ORIGINAL order (parent)
        super().train(blocks, items=items)
        # 2) k-means centroids from a host sample (device Lloyd's); the
        # sample sees the same normalization the codes got
        rng = np.random.RandomState(self.seed)
        take = min(self.train_sample, n)
        sample_idx = np.sort(rng.choice(n, size=take, replace=False))
        # ship QUANTIZED codes and dequantize on device — 2x (bf16) / 4x
        # (sq8) less host->device traffic than reconstructing to f32 on
        # host (the link is the build bottleneck: 0.04 GB/s on the dev
        # tunnel, PCIe-bound on co-located hosts)
        if self.qtype == "sq8":
            vmin_d = jnp.asarray(self._vmin)
            scale_d = jnp.asarray(self._scale)

            def _dequant(cb):
                return vmin_d + scale_d * cb.astype(jnp.float32)
        else:
            def _dequant(cb):
                return cb.astype(jnp.float32)

        sample = _dequant(jax.device_put(self._codes[sample_idx]))
        from recommendflow_tpu.retrieval._kernels import kmeans
        cents = kmeans(sample, self.nlist,
                       iters=self.kmeans_iters, seed=self.seed,
                       spherical=self.metric == "cos")
        self._centroids = cents
        # 3) assign every row to its nearest centroid, streaming the code
        # blocks through the device once (double-buffered: block i+1's
        # device_put is in flight while block i computes)
        assign = np.empty((n,), np.int64)
        c_sq = jnp.sum(cents * cents, axis=1)

        @jax.jit
        def assign_block(cb, c, csq):
            x = _dequant(cb)
            return jnp.argmax(2.0 * (x @ c.T) - csq[None, :], axis=1)

        starts = list(range(0, n, self.block_items))

        def put(s):
            return jax.device_put(
                self._codes[s:min(s + self.block_items, n)])

        nxt = put(starts[0])
        for bi, s in enumerate(starts):
            cur = nxt
            nxt = put(starts[bi + 1]) if bi + 1 < len(starts) else None
            e = min(s + self.block_items, n)
            assign[s:e] = np.asarray(assign_block(cur, cents, c_sq))
        # 4) reorder codes so each cluster is one contiguous host slice
        order = np.argsort(assign, kind="stable")
        self._order = order
        self._inv_order = None
        self._codes = np.ascontiguousarray(self._codes[order])
        if self._xsq is not None:
            self._xsq = np.ascontiguousarray(self._xsq[order])
        counts = np.bincount(assign, minlength=self.nlist)
        self._offsets = np.concatenate([[0], np.cumsum(counts)]).astype(
            np.int64)
        self._search_fns = {}
        self._score_fns = {}
        self._probe_fn = None
        return self

    def add(self, vectors, items=None):
        raise NotImplementedError(
            "HostIvfSearcher rebuilds its contiguous cluster layout on "
            "train(); append-then-retrain, or use StreamingSqSearcher for "
            "incremental host-scale corpora")

    def reconstruct(self, indices: np.ndarray) -> np.ndarray:
        idx = np.asarray(indices)
        if self._order is not None:
            # codes are stored cluster-sorted: map original -> stored pos
            if not hasattr(self, "_inv_order") or self._inv_order is None:
                inv = np.empty_like(self._order)
                inv[self._order] = np.arange(len(self._order))
                self._inv_order = inv
            idx = self._inv_order[idx]
        codes = self._codes[idx]
        if self.qtype == "sq8":
            return self._vmin + self._scale * codes.astype(np.float32)
        return codes.astype(np.float32)

    # -------------------------------------------------------------- search
    def _score_fn(self, k: int, m_pad: int):
        """Jitted union scorer: (qs [Q,D], codes [m_pad,D], xsq [m_pad],
        valid) -> (scores [Q,k], positions [Q,k]).

        Large unions go through the same two-level grouped tournament as
        the block scans (lax.top_k cost is ~linear in row width — never
        top_k wide rows, CLAUDE.md); m1 is built by a chunked TRANSPOSED
        dot so groups lie on sublanes. `valid` is traced, so the
        power-of-two bucket is the only compile axis."""
        key = (k, m_pad)
        if key in self._score_fns:
            return self._score_fns[key]
        metric, dim = self.metric, self.dim
        G, G2 = _GROUP, _SUPERGROUP

        def chunk_size(limit):
            # largest chunk <= limit that DIVIDES m_pad (buckets are
            # {1, 1.5} x powers of two, so limit or limit/2 always works)
            if m_pad <= limit:
                return m_pad
            return limit if m_pad % limit == 0 else limit // 2

        bs = chunk_size(1 << 16)
        hier = m_pad // (G * G2) >= max(k, 2)

        def fn(qs, codes, xsq, valid):
            nq = qs.shape[0]
            if hier:
                def group_max(start):
                    blk = jax.lax.dynamic_slice(codes, (start, 0),
                                                (bs, dim))
                    s = jnp.einsum("nd,qd->nq", blk.astype(jnp.float32),
                                   qs, preferred_element_type=jnp.float32)
                    if metric == "l2":
                        s = 2.0 * s - jax.lax.dynamic_slice(
                            xsq, (start,), (bs,))[:, None]
                    row = start + jax.lax.broadcasted_iota(
                        jnp.int32, (bs, 1), 0)
                    s = jnp.where(row < valid, s, NEG)
                    return jnp.max(s.reshape(bs // G, G, nq), axis=1)

                starts = jnp.arange(m_pad // bs) * bs
                m1 = jax.lax.map(group_max, starts) \
                    .reshape(m_pad // G, nq).T          # [Q, m_pad/G]
                codes_g = codes.reshape(m_pad // G, G, dim)
                xsq_g = xsq.reshape(m_pad // G, G) if metric == "l2" \
                    else jnp.zeros((1, G), jnp.float32)
                return _tournament_select(
                    qs, m1, codes_g, xsq_g, k,
                    min(k, m_pad // (G * G2)), valid, metric)

            # small-union fallback: chunked top_k + merge (keeps every
            # lax.top_k row <= 32k wide even when k is large — hier only
            # engages at m_pad >= 256*k, so m_pad here can reach 256*k/2)
            bs_fb = chunk_size(1 << 15)

            def chunk_topk(start):
                blk = jax.lax.dynamic_slice(codes, (start, 0), (bs_fb, dim))
                s = jnp.einsum("nd,qd->nq", blk.astype(jnp.float32), qs,
                               preferred_element_type=jnp.float32)
                if metric == "l2":
                    s = 2.0 * s - jax.lax.dynamic_slice(
                        xsq, (start,), (bs_fb,))[:, None]
                row = start + jax.lax.broadcasted_iota(
                    jnp.int32, (bs_fb, 1), 0)
                s = jnp.where(row < valid, s, NEG).T        # [Q, bs_fb]
                ts, ti = jax.lax.top_k(s, min(k, bs_fb))
                return ts, ti + start

            starts = jnp.arange(m_pad // bs_fb) * bs_fb
            ts, ti = jax.lax.map(chunk_topk, starts)        # [nb, Q, k]
            ts = jnp.swapaxes(ts, 0, 1).reshape(nq, -1)
            ti = jnp.swapaxes(ti, 0, 1).reshape(nq, -1)
            top, pos = jax.lax.top_k(ts, k)
            return top, jnp.take_along_axis(ti, pos, axis=1)

        jitted = jax.jit(fn)
        self._score_fns[key] = jitted
        return jitted

    def _probe(self, queries: np.ndarray) -> np.ndarray:
        """[Q, nprobe] cluster ids by centroid score (jitted + cached —
        this sits on the latency-critical online path; eager dispatch over
        the dev tunnel costs ~0.3 s per op)."""
        if self._probe_fn is None:
            metric = self.metric
            np_k = min(self.nprobe, self.nlist)
            self._c_sq = jnp.sum(self._centroids * self._centroids, axis=1)

            @jax.jit
            def probe(qs, c, csq):
                s = 2.0 * (qs @ c.T) - csq[None, :] if metric == "l2" \
                    else qs @ c.T
                return jax.lax.top_k(s, np_k)[1]

            self._probe_fn = probe
        return np.asarray(self._probe_fn(
            jnp.asarray(queries, jnp.float32), self._centroids, self._c_sq))

    def _search_impl(self, queries: np.ndarray, k: int):
        return self._search_probed(queries, k)

    def _search_probed(self, queries: np.ndarray, k: int):
        probes = self._probe(queries)                     # [Q, P]
        clusters = np.unique(probes)
        off = self._offsets
        sizes = off[clusters + 1] - off[clusters]
        m = int(sizes.sum())
        if m == 0:  # all probed clusters empty: worst score, not a
            # phantom 0.0 (a perfect l2 match); f32 like every other block
            fill = np.float32(np.inf if self.metric == "l2" else NEG)
            return (np.full((len(queries), k), fill, np.float32),
                    np.zeros((len(queries), k), np.int64))
        # pack the probed clusters' contiguous slices (host memcpy of only
        # the rows that will travel) + the stored->original id map
        packed = np.empty((m, self.dim), self._codes.dtype)
        ids = np.empty((m,), np.int64)
        xsq = np.empty((m,), np.float32) if self._xsq is not None else None
        pos = 0
        for c, sz in zip(clusters, sizes):
            s, e = off[c], off[c + 1]
            packed[pos:pos + sz] = self._codes[s:e]
            ids[pos:pos + sz] = self._order[s:e]
            if xsq is not None:
                xsq[pos:pos + sz] = self._xsq[s:e]
            pos += sz
        # bucket to {1, 1.5}x powers of two (>=512, multiples of 256 so
        # the group reshapes hold): distinct jit shapes stay logarithmic
        # in corpus size while the zero rows shipped over the link — the
        # stated bottleneck — stay <= 33% instead of <= 100%
        p = max(512, 1 << int(np.ceil(np.log2(m))))
        m_pad = p if (p < 1024 or m > (p * 3) // 4) else (p * 3) // 4
        if m_pad > m:
            pad = np.zeros((m_pad - m, self.dim), packed.dtype)
            packed = np.concatenate([packed, pad])
            if xsq is not None:
                xsq = np.concatenate(
                    [xsq, np.full((m_pad - m,), np.inf, np.float32)])
        k_eff = min(k, m)
        if self.qtype == "sq8":
            qs = queries * self._scale[None, :]
            base = queries @ self._vmin
        else:
            qs, base = queries, None
        fn = self._score_fn(k_eff, m_pad)
        top_s, top_pos = fn(jnp.asarray(qs, jnp.float32),
                            jax.device_put(packed),
                            jax.device_put(xsq) if xsq is not None
                            else jnp.zeros((m_pad,), jnp.float32),
                            jnp.int32(m))
        top_s = np.asarray(top_s)
        top_i = ids[np.asarray(top_pos)]
        if top_s.shape[1] < k:                            # union smaller than k
            padw = k - top_s.shape[1]
            top_s = np.pad(top_s, ((0, 0), (0, padw)),
                           constant_values=NEG)
            top_i = np.pad(top_i, ((0, 0), (0, padw)))
        if self.metric == "l2":
            q_sq = (queries ** 2).sum(-1, keepdims=True)
            surr = top_s + (2.0 * base[:, None] if base is not None else 0.0)
            top_s = np.sqrt(np.maximum(q_sq - surr, 0.0))
        elif base is not None:
            top_s = top_s + base[:, None]
        return top_s, top_i

    # ------------------------------------------------------------- persist
    def _save_extra(self) -> dict:
        return {"host_ivf": True, "nlist": self.nlist,
                "nprobe": self.nprobe,
                "centroids": np.asarray(self._centroids),
                "offsets": self._offsets, "order": self._order}

    @classmethod
    def load(cls, path: str) -> "HostIvfSearcher":
        data = np.load(path if path.endswith(".npz") else path + ".npz",
                       allow_pickle=True)
        if "host_ivf" not in getattr(data, "files", ()):
            raise ValueError(
                "not a HostIvfSearcher file (no cluster layout) — load it "
                "with StreamingSqSearcher.load")
        s = cls(int(data["dim"]), str(data["metric"]),
                qtype=str(data["qtype"]), nlist=int(data["nlist"]),
                nprobe=int(data["nprobe"]),
                block_items=int(data["block_items"]),
                query_block=int(data["query_block"]))
        s._centroids = jnp.asarray(data["centroids"])
        s._offsets = np.asarray(data["offsets"])
        s._order = np.asarray(data["order"])
        # parent _load_common reads xsq from the sidecar (stored order) or
        # recomputes from the stored-order codes via _dequant_stored —
        # correct for the cluster-sorted layout too
        s._load_common(data)
        return s
