"""CLI: daily finetune from an existing checkpoint.

Parity surface: example/recall_search/finetune.py:42-85 — resume from a
prior model, train fewer epochs on fresh daily data, per-epoch checkpoints,
final best-model save gated by the promotion monitor.
"""
from __future__ import annotations

import argparse
import os

from recommendflow_tpu.utils.str_parser import str2debug, str2dict
from recommendflow_tpu.utils.tables import print_args


def main(argv=None):
    p = argparse.ArgumentParser(description="Finetune from a checkpoint")
    p.add_argument("conf")
    p.add_argument("--data", required=True)
    p.add_argument("--dayno", default=None)
    p.add_argument("--load_checkpoint", required=True,
                   help="checkpoint root to resume from")
    p.add_argument("--model_save_root", required=True)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--train_mode", default="normal")
    p.add_argument("--monitor", default="val_auc")
    p.add_argument("--promotion_constraints", default="",
                   help="e.g. 'val_auc=[-0.05, inf); val_hit@50=[-0.1, inf)'")
    p.add_argument("--exp_id", type=int, default=None,
                   help="activate experiment row (must match the "
                        "checkpoint's training run — ±feature toggles "
                        "change the param tree)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    print_args(args)

    from recommendflow_tpu.parallel import init_distributed
    init_distributed()  # no-op single-host; must precede jax backend use
    from recommendflow_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # warm-process compiles -> seconds
    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.pipeline import make_dataset
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.parallel.mesh import make_mesh
    from recommendflow_tpu.retrieval.eval import make_recall_evaluator
    from recommendflow_tpu.train import (
        EvalCallback, ModelCheckpoint, Trainer, set_learning_rate,
    )
    from recommendflow_tpu.train.checkpoint import restore_checkpoint, save_pytree
    from recommendflow_tpu.train.monitor import model_online_monitor

    conf = Configuration(args.conf)
    loss_name = None
    if args.exp_id is not None:
        row = conf.active_experiment(args.exp_id)
        loss_name = row.get("loss")
    batch_size = args.batch_size or int(conf.get_conf_value_or("batch_size", 1024))
    debug = str2debug(args.train_mode)
    train_ds, valid_ds = make_dataset(conf, args.data, batch_size,
                                      dayno=args.dayno, valid_ratio=0.1,
                                      seed=args.seed, debug=debug,
                                      host_id=jax.process_index(),
                                      num_hosts=jax.process_count())
    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "loss": loss_name})
    trainer = Trainer(model, learning_rate=args.lr, mesh=make_mesh(),
                      seed=args.seed)

    sample = next(iter(train_ds))
    state = trainer.init_state(trainer._put(sample))
    state = restore_checkpoint(args.load_checkpoint, state)
    # the checkpoint restores the FULL opt_state, including the previous
    # run's (possibly plateau-reduced) learning_rate hyperparam — --lr
    # must win or the daily finetune silently trains at the old run's LR
    state = set_learning_rate(state, args.lr)

    eval_cb = EvalCallback(make_recall_evaluator(valid_ds or train_ds))
    base_logs: dict = {}
    base_logs.update(eval_cb.eval_fn(trainer, state))
    base_logs.update(trainer.evaluate(state, valid_ds or train_ds))
    print("pre-finetune metrics:", {k: round(v, 5) for k, v in base_logs.items()})

    callbacks = [eval_cb]
    if not debug:  # a 10-batch smoke run must not write real checkpoints
        callbacks.append(
            ModelCheckpoint(os.path.join(args.model_save_root, "ckpt"),
                            monitor=args.monitor))
    # resume_data=False: finetune trains FRESH epochs from the restored
    # weights — the restored step count is a different run's position, not a
    # mid-run resume point
    result = trainer.fit(train_ds, epochs=args.epochs, valid_ds=valid_ds,
                         callbacks=callbacks, state=state,
                         log_every=5 if debug else 100, resume_data=False)
    # final metrics measured EXACTLY like base_logs (fit's history lacks
    # val_auc whenever valid_ds is None — e.g. a single day file — which
    # would wrongly trip any val_auc promotion constraint)
    final_logs = dict(result["history"][-1]) if result["history"] else {}
    final_logs.update(eval_cb.eval_fn(trainer, result["state"]))
    final_logs.update(trainer.evaluate(result["state"], valid_ds or train_ds))

    if args.promotion_constraints:
        constraints = str2dict(args.promotion_constraints)
        model_online_monitor(base_logs, final_logs, constraints)
    if debug:
        print("debug mode: NOT promoting to online (10-batch smoke run)")
    else:
        save_pytree(os.path.join(args.model_save_root, "online"),
                    result["state"])
        print("promoted to", os.path.join(args.model_save_root, "online"))
    print("final:", {k: round(v, 5) for k, v in final_logs.items()})


if __name__ == "__main__":
    main()
