"""Benchmark: train-step throughput of the flagship two-tower recall model.

Runs on whatever platform JAX sees (the driver runs it on real TPU). Measures
steady-state jitted train-step examples/sec/chip at production scale
(conf/bench_recall.yaml: ~6M stacked embedding rows, batch 1024, in-batch
sampled softmax), then prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) —
the recorded value is measure-and-report; vs_baseline is computed against
the first recorded TPU value (BENCH_TARGET below) once one exists.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

# First real-TPU measurement becomes the fixed comparison point across rounds
# (v5e 1 chip, 2026-08-17, dense-Adam fp32 two-tower @ batch 1024).
BENCH_TARGET_EXAMPLES_PER_SEC = 16664.0


def main():
    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from __graft_entry__ import _synthetic_batch

    here = os.path.dirname(os.path.abspath(__file__))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    conf_name = "bench_recall.yaml" if on_tpu else "demo_recall.yaml"
    batch_size = 1024 if on_tpu else 256
    conf = Configuration(os.path.join(here, "conf", conf_name))

    model, _ = build_network(conf.networks["class"], {"conf": conf})
    schema = compile_schema(conf.features)
    batch = _synthetic_batch(schema, batch_size)

    n_chips = len(jax.devices())
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(trainer._put(batch))

    # warmup (compile) + steady state timing.
    # NOTE: synchronize via a scalar VALUE fetch, not block_until_ready — on
    # the axon TPU tunnel block_until_ready returns before the device
    # finishes (verified empirically: a 386M-param dense Adam step "took"
    # 0.05ms under block_until_ready vs ~12ms real with a value fetch).
    state, metrics = trainer.train_step(state, batch)
    _ = float(metrics["loss"])
    steps = 50 if on_tpu else 10

    def segment():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = trainer.train_step(state, batch)
        _ = float(metrics["loss"])  # forces the whole dependent chain
        return time.perf_counter() - t0

    # The first segment after tunnel idle can read ~2x slow (measured; see
    # CLAUDE.md tunnel-drift note) — throw one away, then take the best of 3
    # steady-state segments.
    segment()
    dt = min(segment() for _ in range(3))

    examples_per_sec = steps * batch_size / dt
    per_chip = examples_per_sec / n_chips
    vs = (per_chip / BENCH_TARGET_EXAMPLES_PER_SEC
          if BENCH_TARGET_EXAMPLES_PER_SEC else 1.0)
    print(json.dumps({
        "metric": "train_examples_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 4),
    }))


def scaling(mesh_sizes=(1, 2, 4, 8)):
    """Scaling-efficiency harness (BASELINE.md: >=80% examples/s 1 -> N):
    run the train step over growing dp meshes with proportionally growing
    global batch (weak scaling) and report parallel efficiency. On fake CPU
    devices this validates the mechanics; the numbers mean something on a
    real multi-chip slice."""
    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.parallel.mesh import make_mesh
    from recommendflow_tpu.train import Trainer
    from __graft_entry__ import _synthetic_batch

    here = os.path.dirname(os.path.abspath(__file__))
    conf = Configuration(os.path.join(here, "conf", "demo_recall.yaml"))
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [64]})
    schema = compile_schema(conf.features)
    devices = jax.devices()
    per_device_batch = 256
    results = {}
    for n in mesh_sizes:
        if n > len(devices):
            break
        mesh = make_mesh(devices[:n])
        trainer = Trainer(model, learning_rate=1e-3, mesh=mesh)
        batch = _synthetic_batch(schema, per_device_batch * n)
        state = trainer.init_state(trainer._put(batch))
        state, m = trainer.train_step(state, batch)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        steps = 20
        for _ in range(steps):
            state, m = trainer.train_step(state, batch)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        results[n] = steps * per_device_batch * n / dt
    base = results.get(1)
    if jax.default_backend() == "cpu":
        import sys
        print("note: fake CPU devices SHARE the host's cores — these "
              "efficiency numbers validate the harness mechanics only; "
              "run on a real multi-chip slice for meaningful scaling",
              file=sys.stderr)
    for n, eps in results.items():
        eff = eps / (base * n) if base else float("nan")
        print(json.dumps({"mesh": n, "examples_per_sec": round(eps, 1),
                          "weak_scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    import sys
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
