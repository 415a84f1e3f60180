"""Quantify scan-K dispatch vs single-step dispatch for the fit() hot loop.

Variants, interleaved in one process (tunnel drift rule):
  A   single-step loop (train_step x S)
  K8  train_steps over chunks of 8   (S/8 dispatches)
  K16 train_steps over chunks of 16
  K32 train_steps over chunks of 32

Usage: python benchmarks/micro_scan_fit.py [--steps 96] [--rounds 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
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
    S = args.steps

    def run_single(state):
        for _ in range(S):
            state, m = trainer.train_step(state, batch)
        _ = float(m["loss"])
        return state

    def make_run_k(k):
        def run(state):
            for _ in range(S // k):
                state, m = trainer.train_steps(state, [batch] * k)
            _ = float(m["loss"])
            return state
        return run

    variants = [("A single", run_single), ("K8", make_run_k(8)),
                ("K16", make_run_k(16)), ("K32", make_run_k(32))]
    for name, fn in variants:  # warm/compile
        t0 = time.perf_counter()
        state = fn(state)
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    results = {name: [] for name, _ in variants}
    for r in range(args.rounds):
        for name, fn in variants:
            t0 = time.perf_counter()
            state = fn(state)
            dt = time.perf_counter() - t0
            eps = S * batch_size / dt
            results[name].append(eps)
            print(f"round {r} {name:9s} {eps:9.0f} ex/s "
                  f"({dt / S * 1e3:6.2f} ms/step)", flush=True)
    print("\n-- medians --")
    for name, _ in variants:
        eps = sorted(results[name])[len(results[name]) // 2]
        print(f"{name:9s} {eps:9.0f} ex/s  ({batch_size / eps * 1e3:6.2f} ms/step)")


if __name__ == "__main__":
    main()
