"""Checkpoint portability across device counts.

CLAUDE.md's claim — host-numpy orbax checkpoints restore across different
device counts — proven: train on a 4-device mesh with row-sharded tables,
checkpoint, restore onto an 8-device mesh (and 8 -> 4) and continue training
with losses matching a same-mesh continuation. (Supersedes the reference's
per-epoch weights-only story, core/callbacks.py:5-15.)
"""
import jax
import numpy as np
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import compile_schema
from recommendflow_tpu.data.pipeline import Dataset
from recommendflow_tpu.data.synthetic import generate_records
from recommendflow_tpu.models.base import build_network
from recommendflow_tpu.parallel.mesh import make_mesh
from recommendflow_tpu.train import Trainer
from recommendflow_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def world(demo_conf_path, tmp_path_factory):
    conf = Configuration(demo_conf_path)
    out = str(tmp_path_factory.mktemp("records"))
    paths = generate_records(conf, out, num_rows=1200, num_files=2, seed=11)
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "tower_units": [64]})
    ds = Dataset(schema, paths, batch_size=128, shuffle=False, take_batches=4)
    return model, list(ds)


def _trainer(model, n_devices: int) -> Trainer:
    mesh = make_mesh(jax.devices()[:n_devices])
    return Trainer(model, learning_rate=1e-3, mesh=mesh, shard_tables=True,
                   seed=3)


def _steps(trainer, state, batches):
    losses = []
    for b in batches:
        state, m = trainer.train_step(state, b)
        losses.append(float(m["loss"]))
    return state, losses


@pytest.mark.parametrize("n_from,n_to", [(4, 8), (8, 4)])
def test_restore_across_device_counts(world, tmp_path, n_from, n_to):
    model, batches = world
    root = str(tmp_path / f"ckpt_{n_from}to{n_to}")

    # train 2 steps on the source mesh and checkpoint
    src = _trainer(model, n_from)
    state = src.init_state(batches[0])
    state, _ = _steps(src, state, batches[:2])
    save_checkpoint(root, state, step=0)

    # reference continuation: same mesh, 2 more steps
    ref_state = restore_checkpoint(root, src.init_state(batches[0]))
    _, ref_losses = _steps(src, ref_state, batches[2:4])

    # restore on a mesh with a different device count and continue
    dst = _trainer(model, n_to)
    dst_state = restore_checkpoint(root, dst.init_state(batches[0]))

    # restored params agree with the source snapshot
    for a, b in zip(jax.tree.leaves(jax.device_get(ref_state.params)),
                    jax.tree.leaves(jax.device_get(dst_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    _, dst_losses = _steps(dst, dst_state, batches[2:4])
    # loss trajectory continues consistently (cross-count reduction order
    # shifts a few ulps; global-batch losses are otherwise identical)
    np.testing.assert_allclose(dst_losses, ref_losses, rtol=1e-4)
