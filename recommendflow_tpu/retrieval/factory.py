"""index_factory: FAISS-style index-string constructor over the
searcher families."""
from __future__ import annotations

from recommendflow_tpu.retrieval.flat import TpuSearcher
from recommendflow_tpu.retrieval.ivf import IvfSearcher
from recommendflow_tpu.retrieval.pq import IvfPqSearcher, PqSearcher
from recommendflow_tpu.retrieval.sq import SqSearcher


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
    # host-RAM tier: corpus beyond one chip's HBM, streamed from host numpy
    # (FAISS's host-scale regime, faiss_searcher.py:108-130) — 'Host' prefix
    # on the SQ/Flat strings
    m = _re.match(r"^Host(Flat|SQ8|SQfp16|SQbf16)$", spec, _re.IGNORECASE)
    if m:
        from recommendflow_tpu.retrieval.host_tier import StreamingSqSearcher
        sub = m.group(1).lower()
        qtype = {"flat": "f32", "sq8": "sq8",
                 "sqfp16": "bf16", "sqbf16": "bf16"}[sub]
        if mesh is not None:
            raise ValueError("the host tier streams from one host — use "
                             "Sharded* (device-resident) for mesh scaling")
        return StreamingSqSearcher(dim, metric, qtype=qtype, **kwargs)
    # host-RAM IVF: contiguous inverted lists on host, probed-cluster-only
    # transfer — the online/low-latency host-scale tier
    m = _re.match(r"^HostIVF(\d+)(?:,(Flat|SQ8|SQfp16|SQbf16))?$", spec,
                  _re.IGNORECASE)
    if m:
        from recommendflow_tpu.retrieval.host_tier import HostIvfSearcher
        if mesh is not None:
            raise ValueError("the host tier streams from one host — use "
                             "Sharded* (device-resident) for mesh scaling")
        sub = (m.group(2) or "SQ8").lower()
        qtype = {"flat": "f32", "sq8": "sq8",
                 "sqfp16": "bf16", "sqbf16": "bf16"}[sub]
        return HostIvfSearcher(dim, metric, qtype=qtype,
                               nlist=int(m.group(1)), **kwargs)
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
