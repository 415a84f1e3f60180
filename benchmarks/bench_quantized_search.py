"""Quantized-searcher regime benchmark on the real chip (VERDICT r1 item 3).

Measures the whole index_factory family — Flat (exact), SQ8/SQbf16,
IVF{nlist} at several nprobe, PQ{m}, IVF{nlist},PQ{m} — at a beyond-exact
corpus scale, reporting build time, end-to-end search qps (host-timed; the
returned numpy arrays force full sync), and recall@100 vs the exact Flat
ground truth. One process, per-searcher sequential timing (device memory at
10M x 128 cannot hold all indices at once; tunnel drift caveat per
CLAUDE.md — compare ratios, not absolute qps across runs).

Corpus: a 1024-cluster gaussian mixture by default (realistic for learned
embeddings; isotropic gaussians are IVF's worst case — use --isotropic to
measure that regime too).

Usage: python benchmarks/bench_quantized_search.py [--n 10000000] [--q 2048]
"""
from __future__ import annotations

import argparse
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_corpus(n: int, dim: int, clustered: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    if not clustered:
        out = np.empty((n, dim), np.float32)
        for s in range(0, n, 1 << 20):
            e = min(n, s + (1 << 20))
            out[s:e] = rng.standard_normal((e - s, dim), np.float32)
        return out
    centers = rng.standard_normal((1024, dim), np.float32)
    out = np.empty((n, dim), np.float32)
    for s in range(0, n, 1 << 20):
        e = min(n, s + (1 << 20))
        cid = rng.integers(0, len(centers), e - s)
        out[s:e] = centers[cid] + 0.35 * rng.standard_normal(
            (e - s, dim), np.float32)
    return out


def recall_at_k(got: np.ndarray, gt: np.ndarray) -> float:
    k = gt.shape[1]
    hits = sum(len(set(got[i, :k]) & set(gt[i])) for i in range(len(gt)))
    return hits / (len(gt) * k)


def bench_one(name, make_searcher, corpus, queries, k, reps, gt=None):
    t0 = time.perf_counter()
    s = make_searcher()
    s.train(corpus)
    build_s = time.perf_counter() - t0
    if not name.startswith("Host"):
        # warm (compile). Host-tier searchers skip this: ANY search streams
        # the whole corpus from host RAM, so a warm-up pass would double the
        # wall time for a few seconds of compile amortization
        _, idx = s.search(queries[:64], topk=k, return_items=False)
    times = []
    idx = None
    for _ in range(reps):
        t0 = time.perf_counter()
        _, idx = s.search(queries, topk=k, return_items=False)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    rec = recall_at_k(np.asarray(idx), gt) if gt is not None else 1.0
    row = {"searcher": name, "build_s": round(build_s, 2),
           "qps": round(len(queries) / med, 1),
           "search_ms": round(med * 1e3, 2), "recall@100": round(rec, 4)}
    print(json.dumps(row))
    del s
    gc.collect()
    return row, np.asarray(idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--isotropic", action="store_true")
    ap.add_argument("--metric", default="ip")
    ap.add_argument("--only", default=None,
                    help="regex filter over searcher names")
    ap.add_argument("--gt", default=None,
                    help="ground-truth cache .npz: reuse the exact results "
                    "across per-searcher processes (10M indices + all "
                    "quantized structures exceed one chip's HBM together)")
    ap.add_argument("--qb", type=int, default=None,
                    help="query_block override (default 512 at >=4M items; "
                    "SQ scans sustain 2048 — m1 is [Q, N/16] f32, 5 GB at "
                    "qb=2048/10M, the ceiling)")
    args = ap.parse_args()

    from recommendflow_tpu.retrieval import (
        HostIvfSearcher, IvfPqSearcher, IvfSearcher, PqSearcher, SqSearcher,
        StreamingSqSearcher, TpuSearcher)

    print(f"# corpus {args.n} x {args.dim} "
          f"({'isotropic' if args.isotropic else 'clustered'}), "
          f"Q={args.q}, k={args.k}", file=sys.stderr)
    corpus = make_corpus(args.n, args.dim, clustered=not args.isotropic)
    rng = np.random.default_rng(7)
    qidx = rng.integers(0, args.n, args.q)
    queries = corpus[qidx] + 0.15 * rng.standard_normal(
        (args.q, args.dim), np.float32)

    qb = args.qb or (512 if args.n >= 4_000_000 else 4096)
    rows = []

    import os
    import re
    gt = None
    if args.gt and os.path.exists(args.gt):
        gt = np.load(args.gt)["gt"]
    # beyond-HBM corpora can't host a device-resident Flat index: compute
    # the exact ground truth with the host-streaming f32 tier instead
    # (identical results, transfer-bound speed)
    beyond_hbm = args.n * args.dim * 4 > 10e9
    if gt is None:
        if beyond_hbm:
            row, gt = bench_one(
                "HostFlat", lambda: StreamingSqSearcher(
                    args.dim, args.metric, qtype="f32",
                    query_block=max(qb, 2048)),
                corpus, queries, args.k, max(1, args.reps // 2))
        else:
            row, gt = bench_one(
                "Flat", lambda: TpuSearcher(args.dim, args.metric,
                                            query_block=qb),
                corpus, queries, args.k, args.reps)
        rows.append(row)
        if args.gt:
            np.savez(args.gt, gt=gt)

    configs = [
        # host-RAM tier (beyond-HBM corpus streamed from host numpy):
        # measured here so the qps/recall regime table covers the one FAISS
        # capability the HBM-resident families can't reach
        # host tier streams the WHOLE corpus once per query block — use the
        # largest block the m1 buffers allow so the stream amortizes
        ("HostSQbf16", lambda: StreamingSqSearcher(
            args.dim, args.metric, qtype="bf16",
            query_block=max(qb, 2048))),
        ("HostSQ8", lambda: StreamingSqSearcher(
            args.dim, args.metric, qtype="sq8",
            query_block=max(qb, 2048))),
        ("SQ8", lambda: SqSearcher(args.dim, args.metric, qtype="sq8",
                                   query_block=qb)),
        ("SQbf16", lambda: SqSearcher(args.dim, args.metric, qtype="bf16",
                                      query_block=qb)),
    ]
    for nprobe in (8, 32, 64):
        configs.append((f"IVF4096,np{nprobe}",
                        lambda np_=nprobe: IvfSearcher(
                            args.dim, args.metric, nlist=4096, nprobe=np_)))
    configs.append(("PQ16", lambda: PqSearcher(args.dim, args.metric,
                                               num_subspaces=16,
                                               query_block=qb)))
    for nprobe in (8, 32, 64):
        configs.append((f"IVF4096,PQ16,np{nprobe}",
                        lambda np_=nprobe: IvfPqSearcher(
                            args.dim, args.metric, nlist=4096,
                            num_subspaces=16, nprobe=np_)))

    # host-IVF online-latency regime: transfers only the probed clusters,
    # so its sweet spot is SMALL query batches (online serving) — measure
    # at Q=64 so the probe-union stays a small corpus fraction; recall is
    # vs the same exact ground truth (row-aligned subset)
    host_ivf_q = min(64, args.q)
    for nprobe in (8, 32):
        for hq, hq_qtype in (("SQbf16", "bf16"), ("SQ8", "sq8")):
            configs.append((
                f"HostIVF4096,{hq},np{nprobe}@q{host_ivf_q}",
                lambda np_=nprobe, qt_=hq_qtype: HostIvfSearcher(
                    args.dim, args.metric, qtype=qt_,
                    nlist=4096, nprobe=np_, query_block=host_ivf_q)))

    for name, maker in configs:
        if args.only and not re.search(args.only, name):
            continue
        if beyond_hbm and not name.startswith("Host"):
            # a 10+ GB f32 corpus cannot be device-resident; don't stream
            # gigabytes into a guaranteed OOM
            print(json.dumps({"searcher": name,
                              "skipped": "corpus exceeds device HBM"}))
            continue
        q_use, gt_use = queries, gt
        if "@q" in name:  # latency-regime entry: row-aligned query subset
            nq = int(name.rsplit("@q", 1)[1])
            q_use = queries[:nq]
            gt_use = gt[:nq] if gt is not None else None
        try:
            row, _ = bench_one(name, maker, corpus, q_use, args.k,
                               args.reps, gt=gt_use)
            rows.append(row)
        except Exception as e:  # record OOM/unsupported rather than abort
            print(json.dumps({"searcher": name, "error": str(e)[:200]}))

    hdr = f"{'searcher':<22}{'build_s':>9}{'qps':>10}{'ms':>9}{'recall@100':>12}"
    print("\n" + hdr, file=sys.stderr)
    for r in rows:
        print(f"{r['searcher']:<22}{r['build_s']:>9}{r['qps']:>10}"
              f"{r['search_ms']:>9}{r['recall@100']:>12}", file=sys.stderr)


if __name__ == "__main__":
    main()
