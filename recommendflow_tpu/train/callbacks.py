"""Epoch-level callbacks: early stopping, LR plateau, checkpointing, eval.

Capability parity with the reference's Keras callback suite
(EarlyStopping / ReduceLROnPlateau / ModelCheckpoint / external Evaluator —
example/recall_search/train.py:100-104, backend/core/callbacks.py:5-15),
re-designed for the functional trainer: a callback sees (trainer, state,
epoch, logs) and may mutate trainer.control (stop flag, lr scale) or write
checkpoints. The Evaluator (retrieval recall eval producing 'val_auc' etc.)
lives in retrieval/eval.py and is wired via EvalCallback.
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Dict, List

from recommendflow_tpu.utils.logger import get_logger

log = get_logger("recflow.callbacks")


class Callback:
    def on_train_begin(self, trainer):  # noqa: D401
        pass

    def on_epoch_end(self, trainer, state, epoch: int, logs: Dict[str, float]):
        pass

    def on_train_end(self, trainer, state, logs: Dict[str, float]):
        pass


def _improved(value: float, best: float, mode: str, min_delta: float) -> bool:
    if mode == "max":
        return value > best + min_delta
    return value < best - min_delta


def _auto_mode(monitor: str, mode: str) -> str:
    """One shared monitor-direction rule: every retrieval/quality metric the
    framework emits (auc/hit/mrr/ndcg/recall, retrieval/eval.py) maximizes;
    losses minimize. A narrower copy of this list once inverted
    best-model selection for val_mrr/val_ndcg monitors."""
    if mode != "auto":
        return mode
    return ("max" if any(k in monitor for k in
                         ("auc", "hit", "mrr", "ndcg", "recall"))
            else "min")


class EarlyStopping(Callback):
    def __init__(self, monitor: str = "val_loss", patience: int = 3,
                 mode: str = "auto", min_delta: float = 0.0,
                 restore_best: bool = True):
        self.monitor = monitor
        self.patience = patience
        self.mode = _auto_mode(monitor, mode)
        self.min_delta = min_delta
        self.restore_best = restore_best
        self.best = -math.inf if self.mode == "max" else math.inf
        self.best_state = None
        self.wait = 0

    def on_train_begin(self, trainer):
        # a reused callback object must not carry a previous fit()'s
        # exhausted patience or stale best_state into this run (the trainer
        # resets control['stop'] for the same reason)
        self.best = -math.inf if self.mode == "max" else math.inf
        self.best_state = None
        self.wait = 0

    def on_epoch_end(self, trainer, state, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        if _improved(value, self.best, self.mode, self.min_delta):
            self.best = value
            self.wait = 0
            if self.restore_best:
                # copy to host: the live state's device buffers are DONATED
                # (and deleted) by the next train_step (trainer
                # donate_argnums). tree_to_host (not jax.device_get) so
                # process-spanning shards allgather instead of raising
                from recommendflow_tpu.train.checkpoint import tree_to_host
                self.best_state = tree_to_host(state)
        else:
            self.wait += 1
            if self.wait >= self.patience:
                log.info("early stopping at epoch %d (%s=%.6f best=%.6f)",
                         epoch, self.monitor, value, self.best)
                trainer.control["stop"] = True
                if self.restore_best and self.best_state is not None:
                    trainer.control["restore_state"] = self.best_state


class ReduceLROnPlateau(Callback):
    def __init__(self, monitor: str = "val_loss", factor: float = 0.5,
                 patience: int = 2, min_lr_scale: float = 1e-3,
                 mode: str = "auto", min_delta: float = 0.0):
        self.monitor = monitor
        self.factor = factor
        self.patience = patience
        self.min_lr_scale = min_lr_scale
        self.mode = _auto_mode(monitor, mode)
        self.min_delta = min_delta
        self.best = -math.inf if self.mode == "max" else math.inf
        self.wait = 0

    def on_train_begin(self, trainer):
        self.best = -math.inf if self.mode == "max" else math.inf
        self.wait = 0

    def on_epoch_end(self, trainer, state, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        if _improved(value, self.best, self.mode, self.min_delta):
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                new_scale = max(trainer.control.get("lr_scale", 1.0) * self.factor,
                                self.min_lr_scale)
                log.info("plateau on %s: lr_scale -> %.6f", self.monitor, new_scale)
                trainer.control["lr_scale"] = new_scale
                self.wait = 0


class ModelCheckpoint(Callback):
    """Per-epoch full-state checkpoints (parity: core/callbacks.py:5-15,
    upgraded to step-resumable orbax saves)."""

    def __init__(self, root: str, keep: int = 5, save_best: bool = True,
                 monitor: str = "val_loss", mode: str = "auto"):
        self.root = root
        self.keep = keep
        self.save_best = save_best
        self.monitor = monitor
        self.mode = _auto_mode(monitor, mode)
        self.best = -math.inf if self.mode == "max" else math.inf

    def on_epoch_end(self, trainer, state, epoch, logs):
        from recommendflow_tpu.train.checkpoint import save_checkpoint, save_pytree
        save_checkpoint(self.root, state, step=epoch, keep=self.keep)
        value = logs.get(self.monitor)
        if self.save_best:
            import jax
            if jax.process_count() > 1:
                # save_pytree allgathers process-spanning shards — a
                # COLLECTIVE. Per-host metrics can diverge (e.g. an eval fn
                # over per-host-sharded valid data can produce the metric on
                # some hosts and not others), so EVERY host must enter this
                # broadcast unconditionally — even metric-less ones — or the
                # cluster deadlocks. Process 0 decides both presence (NaN
                # sentinel when its local value is missing) and value.
                import numpy as np
                from jax.experimental import multihost_utils
                sent = np.float64("nan") if value is None else \
                    np.asarray(value, np.float64)
                agreed = float(
                    multihost_utils.broadcast_one_to_all(sent))
                value = None if math.isnan(agreed) else agreed
            if value is not None and _improved(value, self.best, self.mode,
                                               0.0):
                self.best = value
                save_pytree(os.path.join(self.root, "best"), state)
                log.info("epoch %d: new best %s=%.6f -> %s/best",
                         epoch, self.monitor, value, self.root)


class EvalCallback(Callback):
    """Runs a user function (e.g. retrieval recall eval) and merges its
    metrics into logs — the reconstruction of the reference's external
    `business.utils.evaluator.Evaluator` (train.py:8-9,100-104)."""

    def __init__(self, eval_fn: Callable[[Any, Any], Dict[str, float]]):
        self.eval_fn = eval_fn

    def on_epoch_end(self, trainer, state, epoch, logs):
        metrics = self.eval_fn(trainer, state)
        logs.update(metrics)


class History(Callback):
    def __init__(self):
        self.epochs: List[Dict[str, float]] = []

    def on_epoch_end(self, trainer, state, epoch, logs):
        self.epochs.append(dict(logs))
