"""Microbench: embedding-table HBM hot ops — gather/scatter row-width sweep
and optax-vs-fused rowwise-Adagrad table update.

Hypotheses (see CLAUDE.md perf facts):
  1. The table optimizer update costs ~5 full-table HBM passes through the
     optax multi_transform path (grad read, updates write+read, param
     read+write ~= 3.9 GB ~= 4.7 ms at v5e's ~819 GB/s). A hand-fused
     donated update (p, acc, g) -> (p', acc') should cost ~3 passes.
  2. Per-row fixed gather/scatter cost dropped 4x going 256->512 B physical
     rows; maybe it drops again at 1024/2048 B.

Method per CLAUDE.md: ONE process, interleaved A/B trials, scalar value
fetch for sync (block_until_ready lies on the axon tunnel). Each timed
region is a single jitted call that scans K inner iterations, so dispatch
overhead (~3 ms) and the ~30 ms fetch round-trip amortize out.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

TOTAL_BYTES = 768 * 1024 * 1024   # table footprint held constant
N_IDS = 87_040                    # gathered rows per step (bench workload)
K = 30                            # inner iterations per timed call
TRIALS = 5


def timed(fn, *args):
    out = fn(*args)
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out)                 # value fetch = real device sync
    return (time.perf_counter() - t0) / K * 1e3  # ms per inner iteration


def bench_gather(width_elems: int, dtype=jnp.bfloat16):
    rows = TOTAL_BYTES // (width_elems * jnp.dtype(dtype).itemsize)
    table = jnp.ones((rows, width_elems), dtype)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, rows, N_IDS), jnp.int32)

    @jax.jit
    def run(table, ids):
        def body(c, _):
            out = jnp.take(table, ids + c, axis=0)
            return c, out[0, 0].astype(jnp.float32)
        _, outs = lax.scan(body, jnp.int32(0), None, length=K)
        return outs.sum()

    return timed(run, table, ids), rows


def bench_scatter(width_elems: int, dtype=jnp.bfloat16):
    rows = TOTAL_BYTES // (width_elems * jnp.dtype(dtype).itemsize)
    ids = np.random.default_rng(0).integers(0, rows, N_IDS)
    sids = jnp.asarray(np.sort(ids), jnp.int32)
    g = jnp.ones((N_IDS, width_elems), dtype)

    @jax.jit
    def run(sids, g):
        def body(c, _):
            dt = jnp.zeros((rows, width_elems), dtype).at[sids + c].add(
                g, indices_are_sorted=True)
            return c, dt[0, 0].astype(jnp.float32)
        _, outs = lax.scan(body, jnp.int32(0), None, length=K)
        return outs.sum()

    return timed(run, sids, g), rows


def make_optax_update(lr=0.05):
    """The production path: inject_hyperparams(multi_transform(adam/rowwise))
    exactly as make_partitioned_optimizer builds it."""
    from recommendflow_tpu.train.optimizers import make_partitioned_optimizer
    tx = make_partitioned_optimizer(1e-3, table_learning_rate=lr)

    def step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    return tx, step


def bench_optax(width_elems: int, dtype=jnp.bfloat16):
    rows = TOTAL_BYTES // (width_elems * jnp.dtype(dtype).itemsize)
    params = {"dim64": jnp.ones((rows, width_elems), dtype)}
    grads = {"dim64": jnp.full((rows, width_elems), 1e-3, dtype)}
    tx, step = make_optax_update()
    opt_state = tx.init(params)

    @jax.jit
    def run(params, opt_state, grads):
        def body(carry, _):
            p, s = carry
            p, s = step(p, s, grads)
            return (p, s), p["dim64"][0, 0].astype(jnp.float32)
        (_, _), outs = lax.scan(body, (params, opt_state), None, length=K)
        return outs.sum()

    return timed(run, params, opt_state, grads)


def bench_fused(width_elems: int, dtype=jnp.bfloat16, lr=0.05, eps=1e-10):
    rows = TOTAL_BYTES // (width_elems * jnp.dtype(dtype).itemsize)
    p = jnp.ones((rows, width_elems), dtype)
    acc = jnp.full((rows, 1), 0.1, jnp.float32)
    g = jnp.full((rows, width_elems), 1e-3, dtype)

    @jax.jit
    def run(p, acc, g):
        def body(carry, _):
            p, acc = carry
            g32 = g.astype(jnp.float32)
            acc = acc + jnp.mean(g32 * g32, axis=1, keepdims=True)
            p = (p.astype(jnp.float32) - lr * g32 * lax.rsqrt(acc + eps)
                 ).astype(dtype)
            return (p, acc), p[0, 0].astype(jnp.float32)
        (_, _), outs = lax.scan(body, (p, acc), None, length=K)
        return outs.sum()

    return timed(run, p, acc, g)


def bench_pallas(width_elems: int, dtype=jnp.bfloat16, lr=0.05, eps=1e-10):
    from recommendflow_tpu.ops.pallas.table_update import rowwise_adagrad_update
    rows = TOTAL_BYTES // (width_elems * jnp.dtype(dtype).itemsize)
    p = jnp.ones((rows, width_elems), dtype)
    acc = jnp.full((rows, 1), 0.1, jnp.float32)
    g = jnp.full((rows, width_elems), 1e-3, dtype)

    @jax.jit
    def run(p, acc, g):
        def body(carry, _):
            p, acc = carry
            p, acc = rowwise_adagrad_update(p, acc, g, lr=lr, eps=eps)
            return (p, acc), p[0, 0].astype(jnp.float32)
        (_, _), outs = lax.scan(body, (p, acc), None, length=K)
        return outs.sum()

    return timed(run, p, acc, g)


def main(which=("sweep", "opt")):
    print(f"devices: {jax.devices()}")
    widths = [256, 512, 1024]  # bf16 elems -> 512/1024/2048 B rows
    if "sweep" in which:
        for trial in range(TRIALS):
            line = [f"trial {trial}:"]
            for w in widths:
                g_ms, rows = bench_gather(w)
                s_ms, _ = bench_scatter(w)
                line.append(f"w={w * 2}B gather={g_ms:.2f}ms"
                            f"({g_ms / N_IDS * 1e6:.0f}ns/row)"
                            f" scatter={s_ms:.2f}ms({s_ms / N_IDS * 1e6:.0f}ns/row)")
            print("  ".join(line), flush=True)
    if "opt" in which:
        for trial in range(TRIALS):
            o = bench_optax(256)
            f = bench_fused(256)
            print(f"trial {trial}: optax_update={o:.2f}ms  fused_update={f:.2f}ms",
                  flush=True)
    if "pallas" in which:
        # interleaved A/B: XLA fused jnp update vs the Pallas streaming kernel
        for trial in range(TRIALS):
            f = bench_fused(256)
            p = bench_pallas(256)
            print(f"trial {trial}: xla_fused={f:.2f}ms  pallas_fused={p:.2f}ms",
                  flush=True)


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("sweep", "opt"))
