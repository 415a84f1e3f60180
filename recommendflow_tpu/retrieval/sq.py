"""Scalar-quantized exact scan (FAISS SQ8/SQfp16 parity) — the default
compressed tier; see class doc and CLAUDE.md regime table."""
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
from recommendflow_tpu.retrieval.flat import TpuSearcher


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
        old = _to_host(self._codes)[:self.num_items]   # contiguous slice
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
                and n_pad >= _kernels._HIER_MIN_ITEMS and bn % G == 0):
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
        codes = _to_host(self._codes)[idx]
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
            path, codes=_to_host(self._codes)[:self.num_items].astype(
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
        state["_codes"] = _to_host(self._codes)[:self.num_items] \
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


