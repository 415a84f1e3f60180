"""Ranking (CTR) benchmark: DCN at Criteo scale, with step decomposition.

Workload (conf/bench_ranking.yaml): 26 categorical features double-hashed
(2 salted branches each) into 750k-bucket bf16 tables at dim 32 (39M stacked
rows, ~1.25B embedding params) + 13 dense numeric, batch 2048, 3 cross
layers + [512, 256, 128] towers. (1M buckets/branch OOMs one v5e chip
inside a step: params + grad cotangent + optax updates are ~3.3 GB each.)

Prints steady-state examples/s/chip (best of 3 segments of 30 steps,
value-fetch synced — see bench.py for why block_until_ready is not enough
on the axon tunnel) plus a stage decomposition:
    fwd        loss only
    fwd+bwd    value_and_grad, no optimizer apply
    full       the production train step (grads + rowwise-Adagrad apply)
The fwd+bwd -> full gap is the embedding-table scatter-add + optimizer
update — the traffic-dominated stages for ranking-sized tables.

On CPU the scale shrinks (vocab 10k, batch 256) so the same script smokes
in CI.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(conf, batch_size, trainer_cls, vocab=None, zipf=0.0,
           table_update="dense"):
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.data.synthetic import synthetic_batch
    from recommendflow_tpu.models.base import build_network
    if vocab is not None:
        for f in conf.features.features:
            if f.vocab_size == 750000:
                f.vocab_size = vocab
        if hasattr(conf.features, "_schema_cache"):
            del conf.features._schema_cache
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    schema = compile_schema(conf.features)
    batch = synthetic_batch(schema, batch_size, zipf=zipf)
    trainer = trainer_cls(model, learning_rate=1e-3,
                          table_update=table_update)
    state = trainer.init_state(trainer._put(batch))
    return trainer, state, batch


def _dup_stats(schema, batch):
    """Duplicate fraction of the batch's stored-row ids per table dim."""
    import numpy as np
    ids = {}
    for name, arr in batch.items():
        s = schema.slots.get(name)
        if s is not None and s.kind == "sparse":
            ids.setdefault(s.dim, []).append(np.asarray(arr).reshape(-1))
    return {d: 1.0 - len(np.unique(np.concatenate(v)))
            / len(np.concatenate(v)) for d, v in ids.items()}


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.train import Trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="draw ids Zipf(a)-distributed (real CTR ids are "
                    "Zipfian; 0 = uniform)")
    ap.add_argument("--table_update", default="auto",
                    choices=["dense", "sparse", "auto", "split"])
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    batch_size = 2048 if on_tpu else 256
    steps = 30 if on_tpu else 5

    def timed_loop(fn, s, n):
        # the production step donates its input state — always thread it
        s = fn(s)              # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                s = fn(s)
            _ = float(jax.tree.leaves(s)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best / n

    # ---- headline: full production step at full scale. Use the scan-K
    # API (ONE dispatch for `steps` steps): at a 3.3 GB table, async
    # pipelining of 30 individually-dispatched steps overlaps grad buffers
    # of consecutive steps and OOMs the chip.
    conf = Configuration(os.path.join(here, "conf", "bench_ranking.yaml"))
    trainer, state, batch = _build(conf, batch_size, Trainer,
                                   vocab=None if on_tpu else 10000,
                                   zipf=args.zipf,
                                   table_update=args.table_update)
    if args.zipf:
        dup = _dup_stats(compile_schema(conf.features), batch)
        print(f"zipf a={args.zipf}: duplicate id fraction per dim = "
              f"{ {d: round(f, 4) for d, f in dup.items()} }")
    steps_full = 10 if on_tpu else steps   # scan-K: K small keeps HBM peak low
    batches = [batch] * steps_full
    state, m = trainer.train_steps(state, batches)   # compile + warm
    _ = float(jnp.ravel(m["loss"])[-1])
    t_full = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = trainer.train_steps(state, batches)
        _ = float(jnp.ravel(m["loss"])[-1])
        t_full = min(t_full, (time.perf_counter() - t0) / steps_full)
    eps = batch_size / t_full

    # device-sustained (tool of record): the wall number includes the
    # host->device transfer of synthetic id batches over the dev tunnel —
    # uniform ids are incompressible and the tunnel link compresses, so
    # the wall step reads 12-18 ms ABOVE device-busy (PERF.md §6; no
    # production analogue — a real host feeds batches over PCIe).
    dev_line = ""
    if on_tpu:
        try:
            from recommendflow_tpu.utils.xplane import parse_trace
            d = "/tmp/recflow_prof/bench_ranking"
            jax.profiler.start_trace(d)
            state, m = trainer.train_steps(state, batches)
            _ = float(jnp.ravel(m["loss"])[-1])
            jax.profiler.stop_trace()
            dev_ms = parse_trace(d).device_total_ms / steps_full
            dev_line = (f"device-sustained: {batch_size / dev_ms * 1e3:,.0f} "
                        f"examples/s/chip ({dev_ms:.2f} ms/step device-busy; "
                        f"the wall step includes tunnel id transfer)")
        except Exception as e:  # trace capture is best-effort extra evidence
            dev_line = f"(device trace unavailable: {e!r})"
    del state

    # ---- decomposition at reduced table scale (fwd/bwd grads are NOT
    # donated, so full scale would double the table footprint in HBM);
    # stage RATIOS are what matters — update traffic scales with table
    # size, scatter with batch.
    conf2 = Configuration(os.path.join(here, "conf", "bench_ranking.yaml"))
    trainer2, state2, batch2 = _build(conf2, batch_size, Trainer,
                                      vocab=250000 if on_tpu else 10000)
    step_rng = jax.random.PRNGKey(0)
    mutable = [k for k in trainer2._variables(state2) if k != "params"]

    def loss_of(params, carry):
        out = state2.apply_fn(trainer2._variables(state2, params), batch2,
                              training=True, rngs={"dropout": step_rng},
                              mutable=mutable if mutable else False)
        (loss, _), _ = out if mutable else (out, {})
        return loss + carry * 0.0

    fwd = jax.jit(loss_of)
    g_fn = jax.value_and_grad(loss_of)

    @jax.jit
    def fwd_bwd(params, c):
        loss, grads = g_fn(params, c)
        probe = sum(g.ravel()[0].astype(jnp.float32)
                    for g in jax.tree.leaves(grads))
        return loss + 0.0 * probe

    def timed_const(fn, n):
        c = fn(state2.params, jnp.float32(0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                c = fn(state2.params, c)
            _ = float(c)
            best = min(best, time.perf_counter() - t0)
        return best / n

    t_fwd = timed_const(fwd, steps)
    t_fb = timed_const(fwd_bwd, steps)

    def full2(s):
        s2, m = trainer2.train_step(s, batch2)
        return s2

    t_full2 = timed_loop(full2, state2, steps)

    print(f"[quarter-scale] fwd={t_fwd*1e3:.2f}ms  fwd+bwd={t_fb*1e3:.2f}ms  "
          f"full={t_full2*1e3:.2f}ms  (table stages ~{(t_full2-t_fb)*1e3:.2f}ms)")
    print(f"ranking examples/s/chip: {eps:,.0f}  (batch {batch_size}, "
          f"full-scale step {t_full*1e3:.2f}ms wall)")
    if dev_line:
        print(dev_line)


if __name__ == "__main__":
    main()
