"""Attribute fit()'s per-step overhead vs the isolated train_step loop.

BENCH_r03 showed the production fit() loop at 58.4k ex/s vs 71.9k isolated
(~3.3 ms/step of unexplained overhead on a prebuilt in-memory batch list).
Candidates, each isolated as a variant of the same 50-step loop, measured
INTERLEAVED in one process (tunnel drift makes separate processes
incomparable, CLAUDE.md):

  A  isolated loop            (bench.py segment: train_step + final fetch)
  B  A + eager metric accum   (running[k] = running[k] + v per step)
  C  A + prefetch iterator    (the background decode thread)
  D  full fit(epochs=1)       (everything fit does)
  E  A + list-append accum    (the candidate fix: no per-step dispatch,
                               one stack+sum at epoch end)

Usage: python benchmarks/micro_fit_overhead.py [--steps 50] [--rounds 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from recommendflow_tpu.data.pipeline import prefetch
    from __graft_entry__ import _synthetic_batch

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    conf_name = "bench_recall.yaml" if on_tpu else "demo_recall.yaml"
    batch_size = 1024 if on_tpu else 256
    conf = Configuration(os.path.join(here, "conf", conf_name))
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    schema = compile_schema(conf.features)
    batch = _synthetic_batch(schema, batch_size)

    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(trainer._put(batch))
    state, m = trainer.train_step(state, batch)
    _ = float(m["loss"])
    print("compiled; warm", file=sys.stderr, flush=True)

    S = args.steps

    def run_A(state):
        for _ in range(S):
            state, m = trainer.train_step(state, batch)
        _ = float(m["loss"])
        return state

    def run_B(state):
        running = {}
        for _ in range(S):
            state, m = trainer.train_step(state, batch)
            for k, v in m.items():
                running[k] = running[k] + v if k in running else v
        _ = {k: float(v) for k, v in running.items()}
        return state

    def run_C(state):
        for b in prefetch(iter([batch] * S)):
            state, m = trainer.train_step(state, b)
        _ = float(m["loss"])
        return state

    def run_D(state):
        out = trainer.fit([batch] * S, epochs=1, state=state,
                          resume_data=False, log_every=10 ** 9, verbose=False)
        return out["state"]

    def run_E(state):
        acc = {}
        for _ in range(S):
            state, m = trainer.train_step(state, batch)
            for k, v in m.items():
                acc.setdefault(k, []).append(v)
        sums = jax.jit(lambda xs: {k: jnp.sum(jnp.stack(v))
                                   for k, v in xs.items()})(acc)
        _ = {k: float(v) for k, v in sums.items()}
        return state

    variants = [("A isolated", run_A), ("B eager-accum", run_B),
                ("C prefetch", run_C), ("D fit()", run_D),
                ("E list-accum", run_E)]
    # warm every variant once (fit()'s own jit caches etc.)
    for name, fn in variants:
        state = fn(state)
    results = {name: [] for name, _ in variants}
    for r in range(args.rounds):
        for name, fn in variants:
            t0 = time.perf_counter()
            state = fn(state)
            dt = time.perf_counter() - t0
            eps = S * batch_size / dt
            ms = dt / S * 1e3
            results[name].append((eps, ms))
            print(f"round {r} {name:14s} {eps:9.0f} ex/s  {ms:6.2f} ms/step",
                  flush=True)
    print("\n-- medians --")
    base = None
    for name, _ in variants:
        eps = sorted(e for e, _ in results[name])[len(results[name]) // 2]
        ms = sorted(m for _, m in results[name])[len(results[name]) // 2]
        if base is None:
            base = ms
        print(f"{name:14s} {eps:9.0f} ex/s  {ms:6.2f} ms/step  "
              f"(+{ms - base:5.2f} vs A)")


if __name__ == "__main__":
    main()
