"""Worker for test_multiprocess.py: one process of a 2-process CPU cluster.

Each process owns 4 fake CPU devices and a DISTINCT half of every global
batch; the cluster trains the demo model for 3 steps through the real
Trainer path (shard_batch -> make_array_from_process_local_data on the
multi-host branch), saves a checkpoint (exercising the process_allgather
save of row-sharded tables), and process 0 writes digest numbers that the
parent test compares against a single-process 8-device run on the SAME
global batches — the two runs partition identically, so the numerics must
agree.

A second mode exercises cluster-wide graceful preemption (mode=preempt:
ONLY process 0 receives SIGTERM mid-epoch; the trainer's _PreemptSync must
stop BOTH processes at the same step and both must participate in the
collective checkpoint save) and resume (mode=resume: restore that
checkpoint and finish the epoch; the final state must match an
uninterrupted single-process run).

Usage: python _mp_worker.py <process_id> <port> <out_dir> [mode]
"""
import json
import os
import sys


def main():
    idx, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=idx)
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    import jax.numpy as jnp

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data import compile_schema
    from recommendflow_tpu.data.synthetic import synthetic_batch
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.parallel.mesh import make_mesh
    from recommendflow_tpu.train import Trainer
    from recommendflow_tpu.train.checkpoint import save_pytree

    here = os.path.dirname(os.path.abspath(__file__))
    conf = Configuration(os.path.join(here, "..", "conf", "demo_recall.yaml"))
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [32]})
    mesh = make_mesh()  # all 8 devices across both processes
    trainer = Trainer(model, learning_rate=1e-3, mesh=mesh,
                      shard_tables=True, seed=11)

    B = 64
    half = B // 2
    n_batches = 16 if mode in ("preempt", "resume") else 3
    batches = [synthetic_batch(schema, B, seed=s) for s in range(n_batches)]
    local = [{k: v[idx * half:(idx + 1) * half] for k, v in b.items()}
             for b in batches]

    if mode in ("preempt", "resume"):
        _preempt_resume(mode, idx, out_dir, trainer, local)
        return

    state = trainer.init_state(trainer._put(local[0]))
    losses = []
    for b in local:
        state, metrics = trainer.train_step(state, b)
        losses.append(float(metrics["loss"]))

    # scan-K multi-dispatch across PROCESSES: per-host [K, B/2, ...] stacks
    # must concatenate into the global [K, B, ...] batch (the
    # make_array_from_process_local_data branch of train_steps)
    extra = [synthetic_batch(schema, B, seed=100 + s) for s in range(2)]
    local_extra = [{k: v[idx * half:(idx + 1) * half] for k, v in b.items()}
                   for b in extra]
    state, ms = trainer.train_steps(state, local_extra)
    scan_loss = float(ms["loss"])

    # evaluate/predict across processes: outputs are dp-sharded over both
    # hosts — the trainer allgathers before np conversion, so every process
    # sees the GLOBAL metrics/rows
    eval_b = [synthetic_batch(schema, B, seed=200 + s) for s in range(2)]
    local_eval = [{k: v[idx * half:(idx + 1) * half] for k, v in b.items()}
                  for b in eval_b]
    ev = trainer.evaluate(state, local_eval)
    pred = trainer.predict(state, local_eval)
    assert len(pred["user"]) == 2 * B, \
        f"proc {idx}: predict must return GLOBAL rows, got {len(pred['user'])}"

    # global param digest: cross-process arrays require every process to
    # run the same program — compute on both, write on one
    total_fn = jax.jit(
        lambda params: sum(jnp.sum(leaf) for leaf in jax.tree.leaves(params)),
        out_shardings=None)
    total = float(jax.device_get(total_fn(state.params)))

    # exercise the multi-host checkpoint path: row-sharded tables span
    # both processes, so save must process_allgather them
    save_pytree(os.path.join(out_dir, "mp_ckpt"), state.params)

    # UNEQUAL per-host batch counts (file sharding can hand hosts
    # different counts): fit must agree on the cluster-min batches per
    # epoch — without the cap the shorter host would leave its step loop
    # and issue epoch-top collectives against the other's train-step
    # collectives (deadlock). proc0 gets 3 local batches, proc1 gets 4;
    # both must train exactly min=3 steps and return. Runs LAST among the
    # state-digest stages: fit donates the state's buffers.
    uneq = [{k: v[idx * half:(idx + 1) * half] for k, v in
             synthetic_batch(schema, B, seed=300 + s).items()}
            for s in range(3 + idx)]
    step_before = int(state.step)
    r_uneq = trainer.fit(_ListDataset(uneq), epochs=1, state=state,
                         resume_data=False, verbose=False)
    assert int(r_uneq["state"].step) - step_before == 3, \
        f"proc {idx}: unequal-count fit trained " \
        f"{int(r_uneq['state'].step) - step_before} steps, want cluster-min 3"

    # CHUNKED multi-host fit (explicit scan_steps=2 -> drop_tail): every
    # host's dispatch sequence must be identical chunk-for-chunk, so the
    # cluster-min epoch cap (3) rounds DOWN to a chunk multiple (2) and
    # the per-host tails are dropped — without this the shorter host's
    # tail singles would desynchronize the per-step collectives
    uneq2 = [{k: v[idx * half:(idx + 1) * half] for k, v in
              synthetic_batch(schema, B, seed=400 + s).items()}
             for s in range(3 + idx)]
    state_c = r_uneq["state"]
    step_before = int(state_c.step)
    r_chunk = trainer.fit(_ListDataset(uneq2), epochs=1, state=state_c,
                          resume_data=False, verbose=False, scan_steps=2)
    assert int(r_chunk["state"].step) - step_before == 2, \
        f"proc {idx}: chunked unequal-count fit trained " \
        f"{int(r_chunk['state'].step) - step_before} steps, want 2 " \
        f"(cluster-min 3 rounded to the scan_steps=2 chunk multiple)"

    # sharded retrieval across PROCESSES: corpus rows split over all 8
    # devices (4 per process), per-shard tournament + cross-process
    # all_gather merge; every process must see the identical global top-k
    import numpy as np

    from recommendflow_tpu.retrieval import ShardedSearcher
    rng = np.random.RandomState(0)
    corpus = rng.randn(3000, 16).astype(np.float32)
    queries = rng.randn(32, 16).astype(np.float32)
    searcher = ShardedSearcher(dim=16, metric="ip")  # own 'items' mesh
    searcher.train(corpus)
    scores, ids = searcher.search(queries, topk=9, return_items=False)
    golden = np.argsort(-(queries @ corpus.T), axis=1)[:, :9]
    for r in range(len(queries)):
        assert set(np.asarray(ids)[r]) == set(golden[r]), \
            f"proc {idx}: sharded search row {r} wrong"

    # quantized sharded tier across PROCESSES (VERDICT r2 item 5): codes
    # row-sharded over both hosts; search merges via all_gather; the
    # results must equal a process-LOCAL single-device SqSearcher trained
    # on the same corpus (quantization is deterministic), and the
    # save/load round-trip must cross the process boundary (save
    # process_allgathers the process-spanning code matrix)
    from recommendflow_tpu.retrieval import ShardedSqSearcher
    from recommendflow_tpu.retrieval.searcher import SqSearcher
    qcorpus = rng.randn(3333, 16).astype(np.float32)
    qqueries = rng.randn(24, 16).astype(np.float32)
    ssq = ShardedSqSearcher(dim=16, metric="ip", qtype="sq8")
    ssq.train(qcorpus)
    sq_scores, sq_ids = ssq.search(qqueries, topk=7, return_items=False)
    ref = SqSearcher(dim=16, metric="ip", qtype="sq8").train(qcorpus)
    ref_scores, ref_ids = ref.search(qqueries, topk=7, return_items=False)
    np.testing.assert_allclose(np.sort(np.asarray(sq_scores), axis=1),
                               np.sort(np.asarray(ref_scores), axis=1),
                               rtol=1e-4, atol=1e-4)
    for r in range(len(qqueries)):
        assert len(set(np.asarray(sq_ids)[r]) &
                   set(np.asarray(ref_ids)[r])) >= 6, \
            f"proc {idx}: sharded SQ row {r} disagrees with local SqSearcher"
    # save is a collective (process_allgather of the sharded codes): every
    # process calls it, each writing its own file to avoid a write race
    sq_path = os.path.join(out_dir, f"sq_idx_p{idx}.npz")
    ssq.save(sq_path)
    restored = ShardedSqSearcher.load(sq_path)
    r_scores, r_ids = restored.search(qqueries, topk=7, return_items=False)
    np.testing.assert_allclose(np.asarray(r_scores), np.asarray(sq_scores),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(r_ids), np.asarray(sq_ids)), \
        f"proc {idx}: sharded SQ save/load round-trip changed results"

    if idx == 0:
        with open(os.path.join(out_dir, "digest.json"), "w") as f:
            json.dump({"losses": losses, "param_total": total,
                       "scan_loss": scan_loss, "val_auc": ev["val_auc"],
                       "search_ok": True, "sq_search_ok": True}, f)


class _ListDataset:
    """Deterministic in-memory batch stream with step-level resume."""

    def __init__(self, batches, kill_at=None):
        self.batches, self.kill_at = batches, kill_at

    def __len__(self):
        return len(self.batches)

    def _gen(self, skip):
        import signal
        for i, b in enumerate(self.batches[skip:]):
            if self.kill_at is not None and skip + i == self.kill_at:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    def __iter__(self):
        return self._gen(0)

    def iter_from(self, skip, epoch=0):
        return self._gen(skip)


def _preempt_resume(mode, idx, out_dir, trainer, local):
    import jax
    import jax.numpy as jnp

    from recommendflow_tpu.train.checkpoint import (
        latest_step, restore_checkpoint)
    from recommendflow_tpu.train.trainer import install_preemption_handler

    pdir = os.path.join(out_dir, "preempt_ckpt")
    if mode == "preempt":
        install_preemption_handler(trainer)
        # ASYMMETRIC preemption: only process 0 is signalled (at batch 3);
        # _PreemptSync must stop process 1 at the same step regardless
        ds = _ListDataset(local, kill_at=3 if idx == 0 else None)
        # small agreement window so the deterministic stop (signal step +
        # window) lands mid-epoch within this 16-step test epoch
        result = trainer.fit(ds, epochs=1, preempt_dir=pdir,
                             preempt_window=4)
        saved = latest_step(pdir)
        assert saved is not None and 1 <= saved <= 14, (
            saved, 'agreement must stop the cluster mid-epoch, not at the drain')
        assert int(result["state"].step) == saved
        if idx == 0:
            with open(os.path.join(out_dir, "preempt.json"), "w") as f:
                json.dump({"saved_step": saved}, f)
        return

    # mode == "resume": restore the cluster checkpoint, finish the epoch
    ds = _ListDataset(local)
    state = restore_checkpoint(pdir, trainer.init_state(trainer._put(local[0])))
    result = trainer.fit(ds, epochs=1, state=state)
    final = result["state"]
    assert int(final.step) == len(local), int(final.step)
    total_fn = jax.jit(
        lambda params: sum(jnp.sum(leaf) for leaf in jax.tree.leaves(params)),
        out_shardings=None)
    total = float(jax.device_get(total_fn(final.params)))
    if idx == 0:
        with open(os.path.join(out_dir, "resume.json"), "w") as f:
            json.dump({"final_step": int(final.step), "param_total": total}, f)


if __name__ == "__main__":
    main()
