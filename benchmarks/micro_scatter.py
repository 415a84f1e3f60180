"""Microbench: scatter variant costs on v5e — the embedding-table backward
is scatter-bound (~103 ns/row scatter-add vs ~12 ns/row gather), so which
scatter modes are cheap determines the whole table-update design.

Variants over a [1.5M, 256] bf16 buffer, 87k scattered rows:
  A. add, sorted ids, indices_are_sorted=True        (current backward)
  B. add, sorted ids, + unique_indices=True          (pretend-dedup upper bound)
  C. SET, sorted unique ids, both flags              (no read-modify-write)
  D. SET, unique unsorted ids, unique only           (cumsum-dedup layout)
  E. argsort+permute cost alone                      (already paid today)
  F. cumsum over [N, W] rows                         (segment-dedup building block)

One process, interleaved trials, value-fetch sync (axon tunnel rule).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ROWS = 1_572_864
N = 87_040
W = 256
DT = jnp.bfloat16
K = 30


def timed(fn, *args):
    out = fn(*args)                # compile + warmup
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / K * 1e3


def scan_over(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            out = body(c, *args)
            return (c + 1) % 8, out
        _, outs = lax.scan(step, jnp.int32(0), None, length=K)
        return outs.sum()
    return run


def main():
    rng = np.random.default_rng(0)
    ids_sorted = np.sort(rng.integers(8, ROWS - 8, N))
    uniq = np.unique(ids_sorted)
    # pad unique list back to static N with fresh unused ids (keeps it unique)
    pad = np.setdiff1d(np.arange(N + len(uniq)), uniq)[: N - len(uniq)]
    ids_uniq_sorted = np.sort(np.concatenate([uniq, pad]))
    ids_uniq_shuf = rng.permutation(ids_uniq_sorted)
    print(f"N={N} unique={len(uniq)} dup_ratio={1 - len(uniq) / N:.3f}")

    sidx = jnp.asarray(ids_sorted, jnp.int32)
    usidx = jnp.asarray(ids_uniq_sorted, jnp.int32)
    uidx = jnp.asarray(ids_uniq_shuf, jnp.int32)
    g = jnp.ones((N, W), DT)

    def v_add_sorted(c, ids, g):
        d = jnp.zeros((ROWS, W), DT).at[ids + c].add(g, indices_are_sorted=True)
        return d[0, 0].astype(jnp.float32)

    def v_add_sorted_uniq(c, ids, g):
        d = jnp.zeros((ROWS, W), DT).at[ids + c].add(
            g, indices_are_sorted=True, unique_indices=True)
        return d[0, 0].astype(jnp.float32)

    def v_set_sorted_uniq(c, ids, g):
        d = jnp.zeros((ROWS, W), DT).at[ids + c].set(
            g, indices_are_sorted=True, unique_indices=True)
        return d[0, 0].astype(jnp.float32)

    def v_set_uniq(c, ids, g):
        d = jnp.zeros((ROWS, W), DT).at[ids + c].set(g, unique_indices=True)
        return d[0, 0].astype(jnp.float32)

    def v_argsort_permute(c, ids, g):
        order = jnp.argsort(ids + c)
        return (ids[order[0]] + g[order[0], 0].astype(jnp.int32)).astype(jnp.float32) + \
            g[order][0, 1].astype(jnp.float32)

    def v_cumsum(c, ids, g):
        cs = jnp.cumsum(g.astype(jnp.float32) + c, axis=0)
        return cs[-1, 0]

    benches = [
        ("A add sorted", scan_over(v_add_sorted), (sidx, g)),
        ("B add sorted+uniqflag", scan_over(v_add_sorted_uniq), (sidx, g)),
        ("C set sorted uniq", scan_over(v_set_sorted_uniq), (usidx, g)),
        ("D set unsorted uniq", scan_over(v_set_uniq), (uidx, g)),
        ("E argsort+permute", scan_over(v_argsort_permute), (sidx, g)),
        ("F cumsum rows", scan_over(v_cumsum), (sidx, g)),
    ]
    for trial in range(4):
        parts = []
        for name, fn, args in benches:
            ms = timed(fn, *args)
            parts.append(f"{name}={ms:.2f}ms({ms / N * 1e6:.0f}ns/r)")
        print(f"trial {trial}: " + "  ".join(parts), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
