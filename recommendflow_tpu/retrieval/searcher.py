"""Compatibility facade: the searcher families live in
retrieval/{flat,ivf,pq,sq}.py with shared kernels in _kernels.py
(split by family per round-2 review); every public and test-visible
name keeps importing from here."""
from recommendflow_tpu.retrieval._kernels import (  # noqa: F401
    NEG, _DISTANCE_METRICS, _FAISS_METRIC_INTS, _GROUP,
    _HIER_MIN_ITEMS, _SUPERGROUP, _assign_blocks, _build_capped_lists,
    _l2_normalize, _make_pairwise_distance, _pq_decode_np, _pq_encode,
    _pq_train_codebooks, _tournament_select, kmeans, resolve_metric,
)
from recommendflow_tpu.retrieval.flat import TpuSearcher  # noqa: F401
from recommendflow_tpu.retrieval.ivf import IvfSearcher  # noqa: F401
from recommendflow_tpu.retrieval.pq import (  # noqa: F401
    IvfPqSearcher, PqSearcher,
)
from recommendflow_tpu.retrieval.sq import SqSearcher  # noqa: F401
from recommendflow_tpu.retrieval.factory import index_factory  # noqa: F401
