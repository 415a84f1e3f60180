"""Microbench: split_table_update strategy A/B — sorted scatter-ADD vs
sorted+unique scatter-SET (train/optimizers.py:split_table_update).

Hypothesis (PERF.md §4): the ranking step's 11.5 ms per-row-bound table
scatter-ADD (80–108 ns/row) can drop to ~75 ns/row via gather (12 ns/row)
+ scatter-SET with sorted UNIQUE indices (63 ns/row measured in
benchmarks/micro_scatter.py); padding segments route out-of-bounds and are
dropped, preserving sortedness+uniqueness.

Shapes mimic bench_ranking: 2.5 GB bf16 physical table [9.75M, 128]
(26 branches x 2 x 750k buckets, dim 32, pack P=4), 106k grad rows/step.

Method per CLAUDE.md: ONE process, interleaved trials, scan-K inner loop,
scalar fetch for sync.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from recommendflow_tpu.train.optimizers import split_table_update

R, W = 9_750_000, 128          # 2.5 GB bf16
N = 106_496
K = 20
TRIALS = 4


def make_fn(strategy):
    @jax.jit
    def run(p, acc, ids, g):
        def body(c, _):
            p, acc = c
            p, acc = split_table_update(p, acc, ids, g, lr=0.05,
                                        strategy=strategy)
            return (p, acc), acc[0, 0]
        (p, acc), outs = lax.scan(body, (p, acc), None, length=K)
        return outs.sum() + p[0, 0].astype(jnp.float32)
    return run


def main():
    rng = np.random.default_rng(0)
    p = jnp.zeros((R, W), jnp.bfloat16)
    acc = jnp.full((R, 1), 0.1, jnp.float32)
    ids = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    g = jnp.asarray(rng.standard_normal((N, W)) * 1e-3, jnp.float32)

    fns = {s: make_fn(s) for s in ("sparse", "sparse_set")}
    # warm both compiles
    for s, fn in fns.items():
        t0 = time.perf_counter()
        _ = float(fn(p, acc, ids, g))
        print(f"compile+first {s}: {time.perf_counter()-t0:.1f}s", flush=True)

    times = {s: [] for s in fns}
    for t in range(TRIALS):
        for s, fn in fns.items():
            t0 = time.perf_counter()
            _ = float(fn(p, acc, ids, g))
            ms = (time.perf_counter() - t0) / K * 1e3
            times[s].append(ms)
            print(f"trial {t} {s}: {ms:.2f} ms/iter", flush=True)
    for s, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{s}: median {med:.2f} ms/iter  ({med/N*1e6:.0f} ns/row)")


if __name__ == "__main__":
    main()
