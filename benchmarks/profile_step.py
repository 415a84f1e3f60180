"""Capture REAL device traces of the train steps and print per-op tables.

The first trustworthy roofline evidence for this chip (VERDICT r3 #2): all
prior "already at the ceiling" conclusions came from wall-clock fetch
timing over the axon tunnel; this uses jax.profiler device planes parsed by
utils/xplane.py.

Modes:
  --model recall|ranking   which flagship step to trace (default recall)
  --scan K                 additionally trace a scan-K dispatch to show the
                           dispatch-gap closure (default 8, 0 = skip)

Writes traces under /tmp/recflow_prof/<mode>/ and prints the reports.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_loop(tag, fn, n, sync, steps_per_dispatch: int = 1):
    """steps_per_dispatch: inner train steps per fn() call (scan-K
    dispatches run K steps each — without this the report divides device
    time by dispatches and labels it 'per-step')."""
    import jax
    d = f"/tmp/recflow_prof/{tag}"
    fn()  # warm outside the trace
    sync()
    jax.profiler.start_trace(d)
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    sync()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    from recommendflow_tpu.utils.xplane import format_report, parse_trace
    rep = parse_trace(d)
    total_steps = n * steps_per_dispatch
    print(f"\n===== {tag}: {n} dispatches x {steps_per_dispatch} steps, "
          f"wall {wall * 1e3:.1f} ms ({wall / n * 1e3:.2f} ms/dispatch) "
          f"=====")
    print(format_report(rep, steps=total_steps))
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="recall",
                    choices=["recall", "ranking"])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--scan", type=int, default=8)
    args = ap.parse_args()

    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from __graft_entry__ import _synthetic_batch

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if args.model == "recall":
        conf_name = "bench_recall.yaml" if on_tpu else "demo_recall.yaml"
        batch_size = 1024 if on_tpu else 256
        conf = Configuration(os.path.join(here, "conf", conf_name))
        model, _ = build_network(conf.networks["class"], {"conf": conf})
        schema = compile_schema(conf.features)
        batch = _synthetic_batch(schema, batch_size)
        trainer = Trainer(model, learning_rate=1e-3)
    else:
        sys.path.insert(0, os.path.join(here, "benchmarks"))
        from bench_ranking import _build  # type: ignore
        conf = Configuration(os.path.join(here, "conf", "bench_ranking.yaml"))
        trainer, state, batch = _build(
            conf, 2048 if on_tpu else 256, Trainer,
            vocab=None if on_tpu else 2000, table_update="auto")
    if args.model == "recall":
        state = trainer.init_state(trainer._put(batch))
    state_box = [state]
    m_box = [None]

    def step():
        state_box[0], m_box[0] = trainer.train_step(state_box[0], batch)

    def sync():
        _ = float(m_box[0]["loss"])

    trace_loop(f"{args.model}_single", step, args.steps, sync)

    if args.scan:
        def scan_step():
            state_box[0], m_box[0] = trainer.train_steps(
                state_box[0], [batch] * args.scan)

        trace_loop(f"{args.model}_scan{args.scan}", scan_step,
                   max(args.steps // 2, 2), sync,
                   steps_per_dispatch=args.scan)


if __name__ == "__main__":
    main()
