"""Per-op device cost of the split sparse_set update's sort/segment
machinery at the ranking-bench shapes (VERDICT r4 #4: the ~4.4 ms
sort/permute/segment slice is the last unattacked multi-ms budget item).

Shapes: table [4,875,008, 256] bf16 (2.5 GB), acc [R, 1] f32, 106,496
gradient rows f32. Components traced in isolation (jit-wrapped, device
trace, per-iter = device_total / iters):

  full            split_table_update(strategy='sparse_set') as shipped
  argsort         jnp.argsort(ids)
  permute         jnp.take(g, order, axis=0)
  seg_cumsum      first-occurrence mask + 1-D cumsum (shipped form)
  seg_cumsum2d    same via lane-parallel 2-level cumsum (candidate)
  segsum          jax.ops.segment_sum(gs, seg) sorted
  acc_chain       the acc [R,1] gather+set chain (shipped form)
  acc_chain_flat  same on a FLAT [R] accumulator (layout candidate)

Run on TPU: python benchmarks/micro_sort_machinery.py [--iters 8]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rows", type=int, default=4_875_008)
    ap.add_argument("--n", type=int, default=106_496)
    ap.add_argument("--width", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.train.optimizers import (segment_row_grads,
                                                    split_table_update)
    from recommendflow_tpu.utils.xplane import parse_trace

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    r, n, w = args.rows, args.n, args.width
    if not on_tpu:
        r, n, w = r // 64, n // 16, 64
    # device-side generation: pushing GBs of incompressible random data
    # through the compressing tunnel link costs minutes (bench.py docstring)
    rng = np.random.default_rng(0)
    k = jax.random.PRNGKey(0)
    p = jax.jit(lambda kk: 0.05 * jax.random.normal(kk, (r, w),
                                                    jnp.bfloat16))(k)
    acc = jax.jit(lambda kk: jax.random.uniform(
        kk, (r, 1), jnp.float32, 0.1, 1.0))(k)
    accf = acc[:, 0]
    ids = jnp.asarray(rng.integers(0, r, n), jnp.int32)
    g = jax.jit(lambda kk: 0.01 * jax.random.normal(kk, (n, w),
                                                    jnp.float32))(k)
    order = jnp.argsort(ids)
    s = ids[order]
    gs = jnp.take(g, order, axis=0)
    summed, uid, valid = segment_row_grads(s, gs, num_rows=r)
    d_acc = jnp.mean(summed * summed, axis=1, keepdims=True)
    jax.block_until_ready((p, acc, gs, uid, d_acc))

    def seg_cumsum(sorted_ids):
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 sorted_ids[1:] != sorted_ids[:-1]])
        return jnp.cumsum(first.astype(jnp.int32)) - 1

    def seg_cumsum2d(sorted_ids, cols=512):
        """Lane-parallel two-level cumsum: reshape [N] -> [N/cols, cols],
        cumsum rows (vectorizes across sublanes), add the exclusive prefix
        of row totals. Candidate for the serial 1-D cumsum."""
        first = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                 (sorted_ids[1:] != sorted_ids[:-1])
                                 .astype(jnp.int32)])
        m = first.reshape(-1, cols)
        row = jnp.cumsum(m, axis=1)
        tot = jnp.cumsum(row[:, -1])
        off = jnp.concatenate([jnp.zeros((1,), tot.dtype), tot[:-1]])
        return (row + off[:, None]).reshape(-1) - 1

    def acc_chain(a, u, d):
        new = jnp.take(a, u, axis=0, mode="clip") + d
        return a.at[u].set(new, indices_are_sorted=True,
                           unique_indices=True, mode="drop")

    def acc_chain_flat(a, u, d):
        new = jnp.take(a, u, mode="clip") + d[:, 0]
        return a.at[u].set(new, indices_are_sorted=True,
                           unique_indices=True, mode="drop")

    cases = {
        "full": (jax.jit(functools.partial(split_table_update, lr=0.05,
                                           strategy="sparse_set")),
                 (p, acc, ids, g)),
        "argsort": (jax.jit(jnp.argsort), (ids,)),
        "permute": (jax.jit(lambda gg, o: jnp.take(gg, o, axis=0)),
                    (g, order)),
        "seg_cumsum": (jax.jit(seg_cumsum), (s,)),
        "seg_cumsum2d": (jax.jit(seg_cumsum2d), (s,)),
        "segsum": (jax.jit(lambda a, b: segment_row_grads(a, b, num_rows=r)),
                   (s, gs)),
        "acc_chain": (jax.jit(acc_chain), (acc, uid, d_acc)),
        "acc_chain_flat": (jax.jit(acc_chain_flat), (accf, uid, d_acc)),
    }
    for name, (fn, a) in cases.items():
        out = fn(*a)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # real sync
        d = f"/tmp/recflow_prof/micro_sort_{name}"
        jax.profiler.start_trace(d)
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        jax.profiler.stop_trace()
        try:
            rep = parse_trace(d)
            ms = rep.device_total_ms / args.iters
        except Exception as e:
            ms = float("nan")
            print(f"  (trace parse failed for {name}: {e!r})",
                  file=sys.stderr)
        print(f"{name:16s} {ms:8.3f} ms/iter (device)", flush=True)
        if name in ("seg_cumsum", "seg_cumsum2d"):
            ref = seg_cumsum(s)
            got = cases[name][0](s)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


if __name__ == "__main__":
    main()
