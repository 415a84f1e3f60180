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


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class TpuSearcher:
    """Exact top-k searcher over an item embedding matrix.

    Parameters
    ----------
    metric : 'ip' | 'cos' | 'l2'  (faiss_searcher.py:80-97 metric surface)
    items  : optional identifier array aligned with vectors (ids returned
             from search like the reference's joined DataFrame output)
    """

    SUPPORTED_METRICS = ("ip", "cos", "l2")

    def __init__(self, dim: int, metric: str = "cos",
                 query_block: int = 4096, pad_multiple: int = 512):
        if metric not in self.SUPPORTED_METRICS:
            raise ValueError(f"metric '{metric}' not in {self.SUPPORTED_METRICS}")
        self.dim = dim
        self.metric = metric
        self.query_block = query_block
        self.pad_multiple = pad_multiple
        self.items: Optional[np.ndarray] = None          # identifiers
        self._vecs: Optional[jnp.ndarray] = None          # [N_pad, D] device
        self._sq_norms: Optional[jnp.ndarray] = None      # for l2
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
    def _build_search(self, k: int):
        metric = self.metric
        num_items = self.num_items

        def search_block(queries: jnp.ndarray, vecs: jnp.ndarray,
                         sq_norms: Optional[jnp.ndarray]):
            if metric == "l2":
                # argmin ||q - v||^2 == argmax 2 q·v - ||v||^2
                scores = 2.0 * (queries @ vecs.T) - sq_norms[None, :]
            else:
                scores = queries @ vecs.T
            # mask padded rows
            n_pad = vecs.shape[0]
            col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
            scores = jnp.where(col < num_items, scores, NEG)
            # group-max pruned top-k: lax.top_k over millions of columns is
            # the bottleneck, so first max-pool the item axis in groups of G
            # and top-k the group maxima. EXACT for the same reason a
            # tournament is: at most k groups can contain a top-k element,
            # and each such group's max is itself >= the k-th best score, so
            # the top-k groups-by-max cover every top-k element. Then gather
            # those groups' members and finish with a small top-k.
            G = 16
            nq = scores.shape[0]
            if n_pad % G == 0 and n_pad // G > 4 * k and n_pad > 262144:
                gmax = jnp.max(scores.reshape(nq, n_pad // G, G), axis=-1)
                _, gidx = jax.lax.top_k(gmax, k)              # [Q, k] group ids
                member = gidx[:, :, None] * G + jnp.arange(G)[None, None, :]
                cand_idx = member.reshape(nq, k * G)          # [Q, k*G]
                cand_s = jnp.take_along_axis(scores, cand_idx, axis=1)
                top_scores, pos = jax.lax.top_k(cand_s, k)
                top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            else:
                top_scores, top_idx = jax.lax.top_k(scores, k)
            if metric == "l2":
                # convert back to true (negated) squared distance ordering:
                # report actual L2 distance
                q_sq = jnp.sum(queries ** 2, axis=-1, keepdims=True)
                top_scores = jnp.sqrt(jnp.maximum(q_sq - top_scores, 0.0))
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
        if self._vecs is None:
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

        scores_out, idx_out = [], []
        for start in range(0, len(queries), self.query_block):
            q = jnp.asarray(queries[start:start + self.query_block])
            s, i = fn(q, self._vecs, self._sq_norms)
            scores_out.append(np.asarray(s))
            idx_out.append(np.asarray(i))
        scores = np.concatenate(scores_out, axis=0)
        idx = np.concatenate(idx_out, axis=0)

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
        state["_sq_norms"] = None
        state["_search_fn"] = None
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
