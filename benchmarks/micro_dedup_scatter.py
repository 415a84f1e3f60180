"""Dedup lever A/B (VERDICT r1 item 6): is unique+segment-sum before the
gradient scatter worth it at Zipfian duplicate ratios?

The take_rows backward scatter-adds [N, W] gradient rows at SORTED ids;
duplicates serialize per row inside XLA's scatter. Real CTR ids are
Zipfian — hot ids repeat a lot — so pre-combining duplicates
(boundary mask -> segment ids -> segment_sum -> scatter-SET the unique
rows, tail dropped via OOB ids) trades one extra pass over the [N, W]
gradient for fewer serialized scatter rows.

Variants, interleaved in ONE process at the ranking-bench table shape
(stored [4.875M, 256] bf16 ~= 2.5 GB, N = 106,496 gathered rows of 64 B):
    add      argsort + permute + scatter-add sorted (production bwd today)
    dedup    argsort + permute + boundary/segsum + scatter-SET unique

Draws: uniform, zipf a=1.05, zipf a=1.3 (duplicate fraction printed).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ROWS = 4_875_000
WIDTH = 256            # bf16 -> 512 B/row stored; grads are f32 [N, W]
N_IDS = 106_496
REPS = 8


def draw(kind: str, rng: np.random.Generator) -> np.ndarray:
    if kind == "uniform":
        ids = rng.integers(0, ROWS, N_IDS)
    else:
        a = float(kind.split("zipf")[1])
        ids = (rng.zipf(a, N_IDS) - 1) % ROWS
    return ids.astype(np.int32)


def dup_frac(ids: np.ndarray) -> float:
    return 1.0 - len(np.unique(ids)) / len(ids)


@jax.jit
def scatter_add(table, ids, g):
    order = jnp.argsort(ids)
    return table.at[ids[order]].add(g[order].astype(table.dtype),
                                    indices_are_sorted=True)


@jax.jit
def scatter_dedup(table, ids, g):
    order = jnp.argsort(ids)
    sids = ids[order]
    gs = g[order]
    boundary = jnp.concatenate([jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    segids = jnp.cumsum(boundary) - 1                       # [N] 0..U-1
    summed = jax.ops.segment_sum(gs, segids, num_segments=N_IDS)
    # unique ids positioned at their segment slot; unused tail = ROWS (OOB,
    # dropped by the scatter) keeps the index vector sorted
    uids = jnp.full((N_IDS,), ROWS, jnp.int32).at[segids].set(
        sids, indices_are_sorted=True)
    # target rows are zeros (a cotangent): SET == ADD for unique ids, and
    # sorted-SET is the cheapest scatter variant (63 vs 80 ns/row measured)
    return table.at[uids].add(summed.astype(table.dtype),
                              indices_are_sorted=True, mode="drop")


def timed(fn, table, ids, g):
    out = fn(table, ids, g)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(table, ids, g)
    _ = float(out.ravel()[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    table = jnp.zeros((ROWS, WIDTH), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((N_IDS, WIDTH), np.float32))
    for kind in ("uniform", "zipf1.05", "zipf1.3"):
        ids_np = draw(kind, rng)
        ids = jnp.asarray(ids_np)
        # interleave the two variants
        t_add, t_dedup = [], []
        for _ in range(3):
            t_add.append(timed(scatter_add, table, ids, g))
            t_dedup.append(timed(scatter_dedup, table, ids, g))
        print(json.dumps({
            "draw": kind, "dup_frac": round(dup_frac(ids_np), 4),
            "scatter_add_ms": round(min(t_add), 3),
            "dedup_segsum_ms": round(min(t_dedup), 3)}))


if __name__ == "__main__":
    main()
