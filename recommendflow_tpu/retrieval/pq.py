"""Product-quantized searchers (FAISS PQ{m} / IVF{n},PQ{m} parity) —
the memory-tier regime; see class docs and CLAUDE.md regime table."""
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

