"""Multi-host weak-scaling efficiency harness (SURVEY §7 item 11 /
BASELINE.md north star: ">=80% examples/s from 1 host -> N>=2 hosts").

Measures examples/s/process for the SAME per-process workload at 1 process
and at N processes forming one jax.distributed cluster, and reports

    efficiency = eps_total(N proc) / (N * eps_total(1 proc))

The harness is hardware-agnostic: on a real multi-host TPU pod it measures
the ICI-backed north star directly (each process = one host of a slice).
This image has ONE tunneled TPU chip and no multi-host slice, so the
default run validates the harness on the proven 2-process CPU cluster
(tests/test_multiprocess.py: gloo collectives over 4 fake devices per
process). CPU-cluster efficiency is evidence the MACHINERY measures and
that the dp step scales structurally — the absolute number reflects gloo
on one box, not ICI (cross-host gradient psum dominates at CPU speeds).

Run: python benchmarks/bench_scaling.py [--procs 2] [--steps 30]
Worker mode (internal): bench_scaling.py --worker <idx> <procs> <port> ...
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(idx: int, nprocs: int, port: int, devices: int, steps: int,
           batch: int, out_dir: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=idx)

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data import compile_schema
    from recommendflow_tpu.data.synthetic import synthetic_batch
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.parallel.mesh import make_mesh
    from recommendflow_tpu.train import Trainer

    conf = Configuration(os.path.join(REPO, "conf", "demo_recall.yaml"))
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [64]})
    mesh = make_mesh()
    trainer = Trainer(model, learning_rate=1e-3, mesh=mesh,
                      shard_tables=True, seed=11)

    # weak scaling: every process contributes the same LOCAL batch; the
    # global batch (and the in-batch negative pool) grows with the cluster
    local = [synthetic_batch(schema, batch, seed=1000 * idx + s)
             for s in range(8)]
    state = trainer.init_state(trainer._put(local[0]))
    state, m = trainer.train_step(state, local[0])      # compile
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for s in range(steps):
        state, m = trainer.train_step(state, local[s % len(local)])
    _ = float(m["loss"])                                # sync
    dt = time.perf_counter() - t0
    eps_local = steps * batch / dt
    with open(os.path.join(out_dir, f"proc{idx}_of_{nprocs}.json"), "w") as f:
        json.dump({"eps_local": eps_local, "steps": steps,
                   "batch": batch, "seconds": dt}, f)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(nprocs: int, devices: int, steps: int, batch: int,
                 out_dir: str, timeout: int = 900) -> float:
    """Launch an nprocs cluster; return summed examples/s."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(nprocs), str(port), str(devices), str(steps), str(batch),
         out_dir], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)]
    # kill the EXACT Popen handles on any failure: a hung worker left
    # running would burn the 2-core host and poison concurrent TPU timing
    try:
        outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    except Exception:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        raise
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out[-3000:]}")
    total = 0.0
    for i in range(nprocs):
        with open(os.path.join(out_dir, f"proc{i}_of_{nprocs}.json")) as f:
            total += json.load(f)["eps_local"]
    return total


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "--worker":
        idx, nprocs, port, devices, steps, batch, out_dir = argv[1:8]
        worker(int(idx), int(nprocs), int(port), int(devices), int(steps),
               int(batch), out_dir)
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices_per_proc", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128,
                    help="per-process batch (weak scaling)")
    ap.add_argument("--out", default="/tmp/bench_scaling")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    eps1 = _run_cluster(1, args.devices_per_proc, args.steps, args.batch,
                        args.out)
    print(f"1-process baseline: {eps1:,.0f} examples/s "
          f"({args.devices_per_proc} devices, batch {args.batch})",
          flush=True)
    epsn = _run_cluster(args.procs, args.devices_per_proc, args.steps,
                        args.batch, args.out)
    eff = epsn / (args.procs * eps1)
    print(f"{args.procs}-process cluster: {epsn:,.0f} examples/s total "
          f"(global batch {args.procs * args.batch})", flush=True)
    ncores = os.cpu_count() or 1
    if args.procs > ncores / 2:
        # on this image: 2 cores — N co-located processes CONTEND for the
        # same cores, capping even perfect scaling at ncores/(N*cores_used)
        print(f"NOTE: {args.procs} co-located processes share {ncores} "
              f"physical cores — compute contention alone caps efficiency "
              f"near {min(1.0, ncores / (2 * args.procs)):.2f} here; the "
              f"number validates the harness, not the fabric. Run one "
              f"process per host on a TPU slice for the real north star.",
              flush=True)
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"x of linear, {args.procs} procs x "
                f"{args.devices_per_proc} devs (cpu+gloo here; run on a "
                f"multi-host TPU slice for the ICI north star)",
        "eps_1proc": round(eps1, 1),
        f"eps_{args.procs}proc_total": round(epsn, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
