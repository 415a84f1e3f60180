"""Checkpointing: params + batch_stats + optimizer state + step.

Upgrades the reference's weights-only per-epoch saves
(backend/core/callbacks.py:5-15, Keras save_weights) to full-state
step-resumable checkpoints via orbax (SURVEY §5 'Checkpoint / resume').
Layout: <root>/<step>/ per save, plus '<root>/best' for the promoted model.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def tree_to_host(tree: Any) -> Any:
    """Device -> host numpy for a whole pytree. Arrays row-sharded ACROSS
    processes (multi-host shard_tables) are not np.asarray-able — gather
    their remote shards first (a COLLECTIVE: every process must call)."""
    def to_host(x):
        if not hasattr(x, "shape"):
            return x
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(to_host, tree)


def save_pytree(path: str, tree: Any, force: bool = True):
    # save device-agnostic host arrays: checkpoints written from a sharded
    # mesh must stay restorable in processes with a different device count
    tree = tree_to_host(tree)
    path = os.path.abspath(path)
    _checkpointer().save(path, tree, force=force)


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Restore as host numpy (re-placement onto devices/mesh is the
    caller's job); a template fixes the tree structure and dtypes."""
    path = os.path.abspath(path)
    if template is not None:
        restore_args = jax.tree.map(
            lambda x: ocp.RestoreArgs(restore_type=np.ndarray)
            if hasattr(x, "shape") else ocp.RestoreArgs(),
            template)
        return _checkpointer().restore(path, item=template,
                                       restore_args=restore_args)
    return _checkpointer().restore(path)


def save_checkpoint(root: str, state: Any, step: int, keep: int = 5):
    """Save a training state under root/<step>, pruning old steps."""
    os.makedirs(root, exist_ok=True)
    save_pytree(os.path.join(root, str(step)), state)
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    for old in steps[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(root, str(old)), ignore_errors=True)


def latest_step(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(root: str, template: Any, step: Optional[int] = None) -> Any:
    step = latest_step(root) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {root}")
    return restore_pytree(os.path.join(root, str(step)), template)


def save_variables(path: str, variables: Dict[str, Any]):
    """Weights-only save (parity surface with Keras save_weights)."""
    save_pytree(path, variables)


def restore_variables(path: str, template: Optional[Dict[str, Any]] = None):
    return restore_pytree(path, template)


def backup_model(src_root: str, backup_root: str, keep_days: int = 7):
    """Daily backup copies of a model dir with pruning (parity:
    backend/utils/model_utils.py:7-24 backup_model)."""
    import shutil
    import time as _time
    day = _time.strftime("%Y%m%d")
    dst = os.path.join(backup_root, day)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src_root, dst)
    days = sorted(d for d in os.listdir(backup_root)
                  if d.isdigit() and len(d) == 8)
    for old in days[:-keep_days]:
        shutil.rmtree(os.path.join(backup_root, old), ignore_errors=True)
    return dst
