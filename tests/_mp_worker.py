"""Worker for test_multiprocess.py: one process of a 2-process CPU cluster.

Each process owns 4 fake CPU devices and a DISTINCT half of every global
batch; the cluster trains the demo model for 3 steps through the real
Trainer path (shard_batch -> make_array_from_process_local_data on the
multi-host branch), saves a checkpoint (exercising the process_allgather
save of row-sharded tables), and process 0 writes digest numbers that the
parent test compares against a single-process 8-device run on the SAME
global batches — the two runs partition identically, so the numerics must
agree.

Usage: python _mp_worker.py <process_id> <port> <out_dir>
"""
import json
import os
import sys


def main():
    idx, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
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
    batches = [synthetic_batch(schema, B, seed=s) for s in range(3)]
    local = [{k: v[idx * half:(idx + 1) * half] for k, v in b.items()}
             for b in batches]

    state = trainer.init_state(trainer._put(local[0]))
    losses = []
    for b in local:
        state, metrics = trainer.train_step(state, b)
        losses.append(float(metrics["loss"]))

    # global param digest: cross-process arrays require every process to
    # run the same program — compute on both, write on one
    total_fn = jax.jit(
        lambda params: sum(jnp.sum(leaf) for leaf in jax.tree.leaves(params)),
        out_shardings=None)
    total = float(jax.device_get(total_fn(state.params)))

    # exercise the multi-host checkpoint path: row-sharded tables span
    # both processes, so save must process_allgather them
    save_pytree(os.path.join(out_dir, "mp_ckpt"), state.params)

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

    if idx == 0:
        with open(os.path.join(out_dir, "digest.json"), "w") as f:
            json.dump({"losses": losses, "param_total": total,
                       "search_ok": True}, f)


if __name__ == "__main__":
    main()
