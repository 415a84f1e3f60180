"""Benchmark: train-step throughput of the flagship two-tower recall model.

Runs on whatever platform JAX sees (the driver runs it on real TPU). Measures
steady-state jitted train-step examples/sec/chip at production scale
(conf/bench_recall.yaml: ~6M stacked embedding rows, batch 1024, in-batch
sampled softmax), then prints JSON lines to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
The driver reads the LAST stdout line. The first JSON line is printed as
early as possible (right after the first steady segment) as insurance
against tunnel outages (round-2's BENCH was lost to one, rc=124); improved
lines from later, better-warmed segments follow and supersede it.

Progress heartbeats go to stderr with elapsed timestamps so a hung run is
diagnosable (which phase: import / init / compile / segment k).

Env knobs:
    BENCH_BUDGET_S   soft wall-clock budget (default 420). After the first
                     JSON line the loop stops refining when exceeded.
    BENCH_SKIP_SUSTAINED=1   skip the scan-K sustained measurement.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) —
the recorded value is measure-and-report; vs_baseline is computed against
the first recorded TPU value (BENCH_TARGET below) for cross-round
continuity.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# First real-TPU measurement becomes the fixed comparison point across rounds
# (v5e 1 chip, 2026-08-17, dense-Adam fp32 two-tower @ batch 1024).
BENCH_TARGET_EXAMPLES_PER_SEC = 16664.0

_T0 = time.perf_counter()


_PHASE = ["startup"]


def hb(msg: str) -> None:
    """Timestamped heartbeat on stderr (diagnosable if the run hangs)."""
    _PHASE[0] = msg
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _start_ticker(every_s: float = 30.0) -> None:
    """Daemon thread: if no phase boundary printed for `every_s`, report the
    phase still in flight — a silent hang (e.g. a 200s+ cold compile over
    the tunnel) stays attributable to its phase."""
    import threading

    def run():
        last = None
        while True:
            time.sleep(every_s)
            cur = _PHASE[0]
            if cur == last:
                print(f"[bench +{time.perf_counter() - _T0:7.1f}s] "
                      f"... still in: {cur}", file=sys.stderr, flush=True)
            last = cur

    threading.Thread(target=run, daemon=True).start()


_BW_UTIL = [0.0]  # HBM bandwidth utilization estimate, set once state exists


def emit(per_chip: float, note: str) -> None:
    vs = (per_chip / BENCH_TARGET_EXAMPLES_PER_SEC
          if BENCH_TARGET_EXAMPLES_PER_SEC else 1.0)
    rec = {
        "metric": "train_examples_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 4),
    }
    if _BW_UTIL[0]:
        # estimated HBM traffic per step / measured step time / nominal
        # 819 GB/s (v5e). Traffic model: 5 table passes (scatter zero-init +
        # row-mean read + apply 2R1W — matches the device trace in PERF.md)
        # + 7 dense-param passes (Adam p,g,m,v R + p,m,v W). The per-op
        # device profile (PERF.md) is the ground truth; this contextualizes
        # the wall number against the roofline.
        rec["bw_util"] = round(_BW_UTIL[0] * per_chip, 4)
    print(json.dumps(rec), flush=True)
    hb(f"JSON emitted ({note}): {per_chip:.0f} ex/s/chip")


def _bw_util_coeff(state, batch_size: int, n_chips: int = 1) -> float:
    """bw_util per (example/s/CHIP): with replicated params each chip
    streams the full traffic per step while processing batch/n_chips
    examples, so util = traffic * eps_per_chip * n_chips / batch / 819e9."""
    import jax
    import numpy as np

    table, dense = 0, 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "table_dim" in name:
            table += nbytes
        else:
            dense += nbytes
    traffic = 5 * table + 7 * dense
    return traffic * n_chips / batch_size / 819e9


def main():
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "420"))
    _start_ticker()
    hb("importing jax + recommendflow_tpu")
    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from __graft_entry__ import _synthetic_batch

    here = os.path.dirname(os.path.abspath(__file__))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    conf_name = "bench_recall.yaml" if on_tpu else "demo_recall.yaml"
    batch_size = 1024 if on_tpu else 256
    hb(f"devices={jax.devices()} conf={conf_name} batch={batch_size}")
    conf = Configuration(os.path.join(here, "conf", conf_name))

    model, _ = build_network(conf.networks["class"], {"conf": conf})
    schema = compile_schema(conf.features)
    batch = _synthetic_batch(schema, batch_size)
    hb("building model state (device init of the embedding tables)")

    n_chips = len(jax.devices())
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init_state(trainer._put(batch))
    _BW_UTIL[0] = _bw_util_coeff(state, batch_size, n_chips)
    hb("state initialised; compiling + running first train step")

    # NOTE: synchronize via a scalar VALUE fetch, not block_until_ready — on
    # the axon TPU tunnel block_until_ready returns before the device
    # finishes (verified empirically: a 386M-param dense Adam step "took"
    # 0.05ms under block_until_ready vs ~12ms real with a value fetch).
    state, metrics = trainer.train_step(state, batch)
    _ = float(metrics["loss"])
    hb("first step done (compiled + round-trip verified)")
    steps = 50 if on_tpu else 10

    def segment():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = trainer.train_step(state, batch)
        _ = float(metrics["loss"])  # forces the whole dependent chain
        return time.perf_counter() - t0

    # Insurance line FIRST: the very first segment after tunnel idle can read
    # ~2x slow (CLAUDE.md tunnel-drift note), but a possibly-low number beats
    # the null result of a run killed mid-refinement. Later segments print
    # improved lines; the driver reads the last one.
    dt = segment()
    best = steps * batch_size / dt / n_chips
    emit(best, f"segment 1, {dt:.2f}s — cold, may read low")

    n_segments = 4 if on_tpu else 2
    for k in range(n_segments):
        if time.perf_counter() - _T0 > budget_s:
            hb(f"budget {budget_s:.0f}s exceeded; stopping refinement")
            break
        dt = segment()
        eps = steps * batch_size / dt / n_chips
        hb(f"segment {k + 2}: {dt:.2f}s -> {eps:.0f} ex/s/chip")
        if eps > best:
            best = eps
            emit(best, f"segment {k + 2}")

    # Sustained production-loop throughput: fit() over a prebuilt batch
    # list (scan-8 chunked dispatch on accelerators — trainer.fit
    # scan_steps auto). Measured the SAME way as the isolated metric —
    # best of multiple rounds — so the two are comparable (r3 compared a
    # best-of-5 isolated against a single sustained draw and read a
    # spurious 19% fit() deficit; tunnel drift is ±10%+).
    if os.environ.get("BENCH_SKIP_SUSTAINED") != "1" and \
            time.perf_counter() - _T0 < budget_s:
        try:
            n_fit = 400 if on_tpu else 20
            batches = [batch] * n_fit
            sustained = 0.0
            for r in range(3 if on_tpu else 1):
                if r > 0 and time.perf_counter() - _T0 > budget_s:
                    break
                hb(f"sustained fit() round {r} over {n_fit} steps"
                   + (" (compiles scan-8 first)" if r == 0 else ""))
                t0 = time.perf_counter()
                out = trainer.fit(batches, epochs=1, state=state,
                                  resume_data=False, log_every=10 ** 9,
                                  verbose=False)
                state = out["state"]
                dt = time.perf_counter() - t0
                eps = n_fit * batch_size / dt / n_chips
                hb(f"sustained round {r}: {dt:.2f}s -> {eps:.0f} ex/s/chip")
                sustained = max(sustained, eps)
            print(json.dumps({
                "metric": "sustained_fit_examples_per_sec_per_chip",
                "value": round(sustained, 2),
                "unit": "examples/s/chip",
            }), file=sys.stderr, flush=True)
            if sustained > best:
                # fit() IS the production training loop — if it sustains
                # more than the isolated step loop, that is the honest
                # single-chip capability number.
                best = sustained
                emit(best, "sustained fit() pipeline")
        except Exception as e:  # sustained is best-effort extra evidence
            hb(f"sustained measurement failed (non-fatal): {e!r}")

    # Records-backed end-to-end: RFB files on disk -> threaded block decode
    # -> prefetch -> device steps. The reference's headline is "fast data
    # IO" (README.MD:3); this is the driver-visible number for it. Epoch 0
    # warms page cache + decode pools; epoch 1 is the measurement.
    if os.environ.get("BENCH_SKIP_RECORDS") != "1" and \
            time.perf_counter() - _T0 < budget_s:
        try:
            import tempfile

            from recommendflow_tpu.data.pipeline import Dataset
            from recommendflow_tpu.data.synthetic import generate_records

            rows = 300_000 if on_tpu else 4_096
            hb(f"records e2e: generating {rows} synthetic rows")
            with tempfile.TemporaryDirectory() as tmp:
                paths = generate_records(conf, tmp, num_rows=rows,
                                         num_files=8, seed=0)
                ds = Dataset(schema, paths, batch_size=batch_size,
                             shuffle=True, seed=0, decode_workers=2)
                hb(f"records e2e: fit over {len(ds)} steps x 2 epochs")
                out = trainer.fit(ds, epochs=2, state=state,
                                  resume_data=False, log_every=10 ** 9,
                                  verbose=False)
                e2e = out["history"][-1]["examples_per_sec"] / n_chips
                hb(f"records e2e epoch throughputs: "
                   f"{[round(h['examples_per_sec']) for h in out['history']]}")
                print(json.dumps({
                    "metric": "e2e_records_examples_per_sec_per_chip",
                    "value": round(e2e, 2),
                    "unit": "examples/s/chip",
                }), file=sys.stderr, flush=True)
        except Exception as e:
            hb(f"records e2e measurement failed (non-fatal): {e!r}")
    # the driver reads the LAST stdout line — re-emit the best number so
    # nothing printed in between (however a future code path behaves) can
    # end up as the final line
    emit(best, "final")


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
        print("note: fake CPU devices SHARE the host's cores — these "
              "efficiency numbers validate the harness mechanics only; "
              "run on a real multi-chip slice for meaningful scaling",
              file=sys.stderr)
    for n, eps in results.items():
        eff = eps / (base * n) if base else float("nan")
        print(json.dumps({"mesh": n, "examples_per_sec": round(eps, 1),
                          "weak_scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
