"""Device mesh construction and sharding rules.

The TPU-native replacement for the reference's MirroredStrategy
(backend/utils/gpu_utils.py:13-14): an explicit jax.sharding.Mesh with named
axes. Default layout is 1-D data parallelism over all chips ('dp'); tables
may additionally be row-sharded over the same axis (model parallelism for
embedding HBM capacity — SURVEY §2 component 2 / §7 step 3). XLA inserts the
collectives (all-gather of gathered rows on the forward, reduce-scatter of
scatter-add grads on the backward) when pjit sees the shardings.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_table_param(name: str) -> bool:
    """THE shared 'is this an embedding-table param' predicate.

    Linen modules name stacked tables '...table_dim{d}...'; the
    functional engine keys them 'dim{d}' at the path tail. Three divergent
    copies of this check (here, sharded_embedding.shard_tables,
    optimizers.label) once disagreed — a functional-engine params dict
    got zero tables sharded under the linen-only substring match."""
    tail = name.rsplit("/", 1)[-1]
    return "table_dim" in name or tail.startswith("dim")


def make_mesh(devices=None, axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict, axis: str = "dp") -> Dict:
    """Place every array of a host batch with batch-dim sharding.

    Single-process: a plain device_put. Multi-host: each process holds a
    DIFFERENT per-host batch (data/pipeline.py:shard_for_host), so the
    local array is process-local DATA, not a copy of the global value —
    device_put with a global-mesh sharding would silently keep only each
    host's addressable quarter of its own batch and drop the rest;
    make_array_from_process_local_data concatenates the per-host batches
    into the [n_hosts * B] global batch instead."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def table_sharding_rules(params, mesh: Mesh, axis: str = "dp",
                         min_rows: int = 8192):
    """PartitionSpec tree for model variables: embedding tables with at
    least `min_rows` PHYSICAL (packed, 512-byte) rows are row-sharded over
    `axis`; everything else replicated. The threshold is in stored rows —
    8192 x 512 B = 4 MB — because that is what the leaf shape exposes;
    logical rows are P (the pack factor) times more.

    Row-sharding the stacked per-dim tables spreads HBM across the mesh; the
    forward gather and backward scatter-add become XLA collectives over ICI.
    """
    def spec_for(path: Tuple, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if is_table_param(name) and hasattr(leaf, "shape") and leaf.ndim == 2 \
                and leaf.shape[0] >= min_rows and leaf.shape[0] % mesh.shape[axis] == 0:
            return P(axis, None)
        return P()
    return jax.tree_util.tree_map_with_path(spec_for, params)


def expert_sharding_rules(params, mesh: Mesh, axis: str = "ep"):
    """PartitionSpec tree sharding ExpertsMLP parameters over `axis`.

    ExpertsMLP (ops/mlp.py) gives every expert parameter a leading [E, ...]
    axis under a module named 'experts'; placing those leaves P(axis, ...)
    makes XLA partition the batched expert matmuls across the mesh (expert
    parallelism — each chip holds and runs E/|axis| experts; the gates'
    mixture einsum contracts the expert axis, which XLA lowers to one
    all-reduce over `axis`). Everything else replicated.
    """
    if axis not in mesh.shape:
        raise ValueError(
            f"expert_sharding_rules needs a '{axis}' mesh axis but the mesh "
            f"has {tuple(mesh.axis_names)} — build it with an EXPLICIT "
            f"shape, e.g. make_mesh(axis_names=('dp', '{axis}'), "
            f"shape=(n_devices // n_experts, n_experts)) — the default "
            f"shape puts every device on the first axis, leaving "
            f"'{axis}' size 1 (expert sharding would be a silent no-op)")
    n = mesh.shape[axis]

    def spec_for(path: Tuple, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "experts" in name.split("/") and hasattr(leaf, "shape") \
                and leaf.ndim >= 1 and leaf.shape[0] % n == 0:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()
    return jax.tree_util.tree_map_with_path(spec_for, params)


def merge_rules(*rule_trees):
    """Combine PartitionSpec trees: the first non-replicated spec wins."""
    def pick(*specs):
        for s in specs:
            if s != P():
                return s
        return P()
    return jax.tree.map(pick, *rule_trees,
                        is_leaf=lambda x: isinstance(x, P))


def apply_shardings(tree, mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree)
