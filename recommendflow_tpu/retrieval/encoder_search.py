"""Encoder-attached search: raw text in, joined DataFrames out.

Capability parity with the reference FaissSearcher's encoder workflow
(backend/third_party_components/faiss_searcher.py:23-225): construct with an
encoder (anything exposing `.encode(list_of_texts) -> [N, D]`, e.g.
TextEncoderService) and an items DataFrame whose FIRST column holds the text
to encode; `train()` encodes + indexes the items; `search(texts, topK,
keep_rank_no=...)` returns the exploded join
[source_item, sim_val, (rank_no), sim_item, *extra item columns] — or, with
no encoder, (items, sims[, indices]) array tuples. topK may be a list
(per-k dict results, rank_no-filtered like faiss_searcher.py:184-202).

The ANN engine underneath is index_factory (searcher.py): exact TpuSearcher
or the IVF/PQ/SQ family, any supported metric including the distance surface.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from recommendflow_tpu.retrieval.searcher import (
    _l2_normalize, index_factory, resolve_metric)


class EncoderSearcher:
    def __init__(self,
                 encoder: Any = None,
                 items: Any = None,          # DataFrame (encoder) or ndarray
                 item_list: Optional[Sequence[Any]] = None,
                 index_param: str = "Flat",
                 measurement: Union[str, int] = "cos",
                 norm_vec: bool = False,
                 **kwargs):
        if encoder is not None and not hasattr(encoder, "encode"):
            raise AttributeError(
                "encoder must expose an encode(texts) -> [N, D] method "
                "(faiss_searcher.py:48-50 contract)")
        self.encoder = encoder
        if items is None:
            raise ValueError("items must be given")
        if encoder is None and not isinstance(items, np.ndarray):
            raise TypeError(
                "without an encoder, items must be a [N, D] ndarray "
                "(faiss_searcher.py:40-44 contract)")
        if encoder is not None and not hasattr(items, "columns"):
            raise TypeError(
                "with an encoder, items must be a DataFrame whose first "
                "column holds the text to encode")
        if item_list is not None and len(item_list) != len(items):
            raise ValueError(
                f"len(item_list)={len(item_list)} != len(items)={len(items)}")
        self.items = items
        self.item_list = np.asarray(item_list) if item_list is not None else None
        self.index_param = index_param
        self.measurement = resolve_metric(measurement)
        # cos always normalizes; norm_vec forces it for other metrics
        # (faiss_searcher.py:57)
        self.norm_vec = True if self.measurement == "cos" else bool(norm_vec)
        self.kwargs = kwargs
        self.index = None
        self.vecs: Optional[np.ndarray] = None

    # --------------------------------------------------------------- build
    def _item_texts(self) -> List[str]:
        first_col = self.items.columns[0]
        return list(self.items[first_col])

    def get_vecs(self, items) -> np.ndarray:
        if self.encoder is not None:
            vecs = np.asarray(self.encoder.encode(list(items)), np.float32)
        else:
            vecs = np.asarray(items, np.float32)
            if vecs.ndim != 2:
                raise ValueError(f"expected [N, D] vectors, got {vecs.shape}")
        return _l2_normalize(vecs) if self.norm_vec else vecs

    def train(self) -> "EncoderSearcher":
        src = self._item_texts() if self.encoder is not None else self.items
        self.vecs = self.get_vecs(src)
        # the index normalizes again under metric='cos' (idempotent)
        self.index = index_factory(self.vecs.shape[1], self.index_param,
                                   self.measurement, **self.kwargs)
        self.index.train(self.vecs)
        return self

    # -------------------------------------------------------------- search
    def _join(self, target: Sequence[str], indexes: np.ndarray,
              sims: np.ndarray, keep_rank_no: bool):
        """Explode per-query hits into the reference's joined DataFrame
        (faiss_searcher.py:152-176 search_items)."""
        if self.encoder is None:
            ids = (self.item_list[indexes] if self.item_list is not None
                   else indexes)
            return (ids, sims, indexes) if keep_rank_no else (ids, sims)
        import pandas as pd
        q, k = indexes.shape
        out = pd.DataFrame({
            "source_item": np.repeat(np.asarray(target, object), k),
            "sim_val": sims.reshape(-1).astype(np.float32),
            "rank_no": np.tile(np.arange(k), q),
        })
        sim_item = self.items.iloc[indexes.reshape(-1)].reset_index(drop=True)
        sim_item.columns = ["sim_item"] + list(sim_item.columns[1:])
        clash = {"source_item", "sim_val", "rank_no"} & set(sim_item.columns)
        if clash:
            raise ValueError(
                f"items DataFrame columns {sorted(clash)} clash with the "
                "join's output columns — rename them before searching "
                "(duplicate labels would silently corrupt the result)")
        res = pd.concat([out, sim_item], axis=1)
        if not keep_rank_no:
            res = res.drop(columns=["rank_no"])
        # column order parity: source_item, sim_item, sim_val, (rank_no), ...
        lead = ["source_item", "sim_item", "sim_val"] + (
            ["rank_no"] if keep_rank_no else [])
        rest = [c for c in res.columns if c not in lead]
        return res[lead + rest].reset_index(drop=True)

    def search(self, target: Union[Sequence[str], np.ndarray],
               topK: Union[int, List[int]] = 10, keep_rank_no: bool = False):
        if self.index is None:
            raise RuntimeError(
                "searcher not trained — call train() before search "
                "(faiss_searcher.py:179 parity)")
        if isinstance(target, str):
            # a bare string would iterate character-by-character
            target = [target]
        qvecs = self.get_vecs(target)
        if isinstance(topK, int):
            sims, idx = self.index.search(qvecs, topK, return_items=False)
            return self._join(target, np.asarray(idx), np.asarray(sims),
                              keep_rank_no)
        if isinstance(topK, (list, tuple)):
            sims, idx = self.index.search(qvecs, max(topK), return_items=False)
            sims, idx = np.asarray(sims), np.asarray(idx)
            res: Dict[int, Any] = {}
            if self.encoder is not None:
                full = self._join(target, idx, sims, keep_rank_no=True)
                for k in topK:
                    sub = full.query(f"rank_no < {k}").reset_index(drop=True)
                    res[k] = sub if keep_rank_no else sub.drop(
                        columns=["rank_no"])
            else:
                for k in topK:
                    ids = (self.item_list[idx[:, :k]]
                           if self.item_list is not None else idx[:, :k])
                    res[k] = ((ids, sims[:, :k], idx[:, :k]) if keep_rank_no
                              else (ids, sims[:, :k]))
            return res
        raise TypeError(f"topK does not support type: {type(topK)}")

    def cal_sim(self, item1: str, items2: List[str]):
        """Pairwise similarity of one item vs a list, ranked CONSISTENTLY
        with this searcher's metric: dot descending for ip/cos, distance
        ascending for l2 and the distance metrics. (The reference scores a
        raw dot product regardless of the index metric,
        faiss_searcher.py:209-215 — its cal_sim ranking contradicts its own
        l2 searches; implemented by intent.)"""
        import pandas as pd
        v1 = self.get_vecs([item1])
        v2 = self.get_vecs(items2)
        m = self.measurement
        if m in ("ip", "cos"):
            score, ascending = (v1 @ v2.T)[0], False
        elif m == "l2":
            score, ascending = np.linalg.norm(v2 - v1, axis=1), True
        else:
            import jax.numpy as jnp

            from recommendflow_tpu.retrieval.searcher import (
                _make_pairwise_distance)
            dist = _make_pairwise_distance(
                m, float(self.kwargs.get("metric_arg", 3.0)))
            score = np.asarray(dist(jnp.asarray(v1), jnp.asarray(v2)))[0]
            ascending = True
        df = pd.DataFrame({"item": items2, "score": score})
        return df.sort_values(
            "score", ascending=ascending).reset_index(drop=True)

    # ------------------------------------------------------------- persist
    def save_searcher(self, path: str):
        """Whole-searcher pickle. An encoder that cannot pickle is dropped
        with a warning (vector search keeps working on reload; text queries
        then need a fresh encoder attached)."""
        try:
            blob = pickle.dumps(self)
        except Exception:
            encoder, self.encoder = self.encoder, None
            try:
                blob = pickle.dumps(self)
            finally:
                self.encoder = encoder
            import warnings
            warnings.warn("EncoderSearcher: encoder is not picklable and "
                          "was omitted from the saved searcher")
        with open(path, "wb") as f:
            f.write(blob)

    @staticmethod
    def load_searcher(path: str) -> "EncoderSearcher":
        with open(path, "rb") as f:
            return pickle.load(f)

