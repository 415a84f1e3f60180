"""Batch-size frontier of the recall train step, measured by DEVICE traces.

VERDICT r4 #2: ~4.4 ms of the 10.3 ms batch-1024 device step (table apply
3.38 + row-mean 1.02) is batch-INVARIANT table streaming, so larger
batches should amortize it — but the backward scatter's per-row cost and
the MLP FLOPs grow with batch. Wall-clock cannot answer this over the
axon tunnel (isolated dispatch loops are transfer-bound: the r5 bench's
batch-4096 wall segments read 3x BELOW batch-1024 while the device was
mostly idle); this sweeps {1024, 2048, 4096} with jax.profiler device
traces of the scan-K production dispatch and reports device-busy ms/step
and the implied device-sustained examples/s/chip.

Run on the tunneled TPU: python benchmarks/batch_sweep.py [--batches ...]
Each new batch size costs a fresh XLA compile (1024: ~20-40 s; 4096
measured 152 s on 2026-08-21) — budget ~10 min for the default sweep.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--scan", type=int, default=8,
                    help="scan-K chunk size (the production dispatch)")
    ap.add_argument("--reps", type=int, default=3,
                    help="traced scan-K dispatches per batch size")
    ap.add_argument("--top", type=int, default=6,
                    help="top ops to print per batch size")
    args = ap.parse_args()

    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from recommendflow_tpu.utils.xplane import parse_trace
    from __graft_entry__ import _synthetic_batch

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    conf_name = "bench_recall.yaml" if on_tpu else "demo_recall.yaml"
    conf = Configuration(os.path.join(here, "conf", conf_name))
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    schema = compile_schema(conf.features)
    trainer = Trainer(model, learning_rate=1e-3)

    results = []
    state = None
    for b in args.batches:
        batch = _synthetic_batch(schema, b if on_tpu else max(b // 16, 32))
        t0 = time.perf_counter()
        if state is None:
            state = trainer.init_state(trainer._put(batch))
        # compile + warm the scan-K dispatch for this batch size
        state, m = trainer.train_steps(state, [batch] * args.scan)
        _ = float(m["loss"])
        compile_s = time.perf_counter() - t0
        print(f"[sweep] batch {b}: scan-{args.scan} compiled+warm in "
              f"{compile_s:.1f}s", file=sys.stderr, flush=True)

        d = f"/tmp/recflow_prof/sweep_b{b}"
        jax.profiler.start_trace(d)
        for _ in range(args.reps):
            state, m = trainer.train_steps(state, [batch] * args.scan)
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        rep = parse_trace(d)
        n_steps = args.reps * args.scan
        dev_ms = rep.device_total_ms / n_steps
        eps = b / dev_ms * 1e3
        results.append({"batch": b, "device_ms_per_step": round(dev_ms, 3),
                        "device_sustained_eps": round(eps, 1),
                        "compile_s": round(compile_s, 1)})
        print(f"[sweep] batch {b}: device {dev_ms:.2f} ms/step -> "
              f"{eps:,.0f} ex/s/chip device-sustained",
              file=sys.stderr, flush=True)
        for op in rep.ops[:args.top]:
            print(f"    {op.name:<28s} {op.total_ms / n_steps:7.3f} ms/step",
                  file=sys.stderr, flush=True)

    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
