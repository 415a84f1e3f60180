"""Microbench: Pallas DMA-pipelined row RMW vs XLA scatter-add at 512-byte
packed rows — decides whether the table backward/optimizer can move off
XLA's ~80 ns/row scatter.

Variants over a [1.5M, 256] bf16 table (768 MB), 87k rows:
  A. XLA add, sorted ids                          (current backward)
  B. Pallas scatter_add_rows, sorted unique ids   (DMA RMW pipeline)
  C. Pallas gather_rows, sorted ids               (per-row DMA floor)
  D. XLA take, sorted ids                         (gather reference)

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
K = 20


def timed(fn, *args):
    out = fn(*args)                # compile + warmup
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / K * 1e3


def main():
    from recommendflow_tpu.ops.pallas.embedding_bag import (
        gather_rows, scatter_add_rows)

    rng = np.random.default_rng(0)
    ids_sorted = np.sort(rng.integers(8, ROWS - 8, N))
    uniq = np.unique(ids_sorted)
    pad = np.setdiff1d(np.arange(N + len(uniq)), uniq)[: N - len(uniq)]
    ids_uniq_sorted = np.sort(np.concatenate([uniq, pad]))
    print(f"N={N} unique={len(uniq)} dup_ratio={1 - len(uniq) / N:.3f}")

    sidx = jnp.asarray(ids_sorted, jnp.int32)
    usidx = jnp.asarray(ids_uniq_sorted, jnp.int32)
    g = jnp.ones((N, W), DT)
    table = jnp.zeros((ROWS, W), DT)

    @jax.jit
    def xla_add(ids, g):
        def step(c, _):
            d = jnp.zeros((ROWS, W), DT).at[ids + c].add(
                g, indices_are_sorted=True)
            return (c + 1) % 8, d[0, 0].astype(jnp.float32)
        _, outs = lax.scan(step, jnp.int32(0), None, length=K)
        return outs.sum()

    @jax.jit
    def pallas_add(ids, g, table):
        def step(carry, _):
            c, t = carry
            t = scatter_add_rows(ids + c, g, t)
            return ((c + 1) % 8, t), t[0, 0].astype(jnp.float32)
        (_, t), outs = lax.scan(step, (jnp.int32(0), table), None, length=K)
        return outs.sum() + t[1, 1].astype(jnp.float32)

    @jax.jit
    def pallas_gather(ids, table):
        def step(c, _):
            r = gather_rows(table, ids + c)
            return (c + 1) % 8, r[0, 0].astype(jnp.float32)
        _, outs = lax.scan(step, jnp.int32(0), None, length=K)
        return outs.sum()

    @jax.jit
    def xla_take(ids, table):
        def step(c, _):
            r = jnp.take(table, ids + c, axis=0)
            return (c + 1) % 8, r[0, 0].astype(jnp.float32)
        _, outs = lax.scan(step, jnp.int32(0), None, length=K)
        return outs.sum()

    benches = [
        ("A xla add sorted", xla_add, (sidx, g)),
        ("B pallas RMW uniq", pallas_add, (usidx, g, table)),
        ("C pallas gather", pallas_gather, (sidx, table)),
        ("D xla take", xla_take, (sidx, table)),
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
