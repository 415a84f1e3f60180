"""Multi-host initialization and input sharding helpers.

The reference's parallelism tops out at single-host MirroredStrategy
(gpu_utils.py:13-14); the TPU-native scale-out story:
  * `init_distributed()` — jax.distributed.initialize on multi-host slices
    (no-op on single host / when already initialized),
  * host identity helpers feeding the pipeline's per-host file sharding
    (data/pipeline.py:shard_for_host),
  * `make_mesh()` (parallel/mesh.py) — mesh over all chips of the slice;
    with dp over the full mesh, gradient all-reduce rides ICI within a
    slice and DCN across slices automatically (XLA picks the topology).

Scaling contract (BASELINE.md): examples/s should scale >=80% from 1 to N
hosts — per-host input sharding keeps the host decode path embarrassingly
parallel, and the only cross-host traffic is the gradient all-reduce plus
the all-gathered in-batch negatives ([B, D] per step, both bandwidth-tiny
next to ICI).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from recommendflow_tpu.utils.logger import get_logger

log = get_logger("recflow.distributed")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host. Arguments default
    to the standard env vars / TPU metadata autodetection; single-host runs
    return immediately.

    IMPORTANT: no jax.* call may run before jax.distributed.initialize
    (touching the backend — even jax.process_count() — locks single-process
    mode), so the no-op decision uses env/args only.

    On Cloud TPU pod slices NO coordinator env var is set — initialize()
    is meant to be called arg-less and autodetect via the TPU metadata
    server; TPU_WORKER_HOSTNAMES / MEGASCALE vars mark that case. A
    requested multi-host init that fails RAISES: swallowing it would let
    one host fall back to an independent single-host job that races the
    rest of the cluster's writes to shared checkpoint roots."""
    # TPU_WORKER_HOSTNAMES is set even on SINGLE-worker slices (e.g.
    # 'localhost' on a v5e-1) — it only implies multihost when it lists
    # more than one hostname
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    env_says_multihost = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "MEGASCALE_NUM_SLICES")) \
        or len([w for w in workers.split(",") if w.strip()]) > 1
    if coordinator_address is None and num_processes is None \
            and not env_says_multihost:
        return
    # already-initialized guard (the docstring's promised no-op): the
    # client handle is set iff initialize() ran in this process; checking
    # it does NOT touch the backend
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return
    except Exception:  # pragma: no cover - private-API drift
        pass
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("jax.distributed initialized: process %d/%d, %d local devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count())


def host_id() -> int:
    return jax.process_index()


def num_hosts() -> int:
    return jax.process_count()


