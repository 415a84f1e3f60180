"""CLI: full training pipeline (the canonical path).

Parity surface: example/recall_search/train.py:25-111 — argparse knobs (lr,
batch_size, epochs, topk list, train_mode test/normal, exp_id), config-driven
data + model construction, epoch-end retrieval eval, early stopping, LR
plateau, per-epoch + best checkpoints.

Usage:
    python -m recommendflow_tpu.cli.train CONF [--data PATTERN] [--epochs N]
        [--batch_size B] [--lr LR] [--train_mode test] [--exp_id K] ...
"""
from __future__ import annotations

import argparse
import os

from recommendflow_tpu.utils.str_parser import str2debug, str2list
from recommendflow_tpu.utils.tables import print_args


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a recommendflow_tpu model")
    p.add_argument("conf", help="yaml config path")
    p.add_argument("--data", default=None, help="override Train.data pattern")
    p.add_argument("--dayno", default=None, help="dayno DSL for YYYYMMDD substitution")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_schedule", default=None,
                   choices=["cosine", "linear", "warmup_constant"],
                   help="per-step LR schedule (peak = --lr)")
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--decay_steps", type=int, default=100_000)
    p.add_argument("--valid_ratio", type=float, default=0.1)
    p.add_argument("--topk", default="5,10,50,100", help="eval K list")
    p.add_argument("--train_mode", default="normal", help="'test' = 10-batch debug run")
    p.add_argument("--exp_id", type=int, default=None, help="activate experiment row")
    p.add_argument("--model_save_root", default=None)
    p.add_argument("--load_checkpoint", default=None)
    p.add_argument("--warm_start", action="store_true",
                   help="with --load_checkpoint: restore weights but train "
                        "FRESH epochs (no data fast-forward / epoch skip "
                        "from the restored step count)")
    p.add_argument("--patience", type=int, default=3)
    p.add_argument("--monitor", default="val_auc")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_mesh", action="store_true", help="single-device jit")
    p.add_argument("--preempt_dir", default=None,
                   help="SIGTERM/SIGINT -> finish step, checkpoint here, "
                        "exit cleanly (default: <model_save_root>/preempt)")
    p.add_argument("--shard_tables", action="store_true",
                   help="row-shard embedding tables over the mesh")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    print_args(args)

    from recommendflow_tpu.parallel import init_distributed
    init_distributed()  # no-op single-host; MUST precede any jax backend
    # touch or a multi-host launch degrades to N independent jobs racing
    # shared checkpoint writes
    from recommendflow_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()  # warm-process compiles: 20-40s -> seconds
    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.pipeline import make_dataset
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.parallel.mesh import make_mesh
    from recommendflow_tpu.retrieval.eval import make_recall_evaluator
    from recommendflow_tpu.train import (
        EarlyStopping, EvalCallback, ModelCheckpoint, ReduceLROnPlateau, Trainer,
    )
    from recommendflow_tpu.train.checkpoint import restore_checkpoint

    conf = Configuration(args.conf)
    loss_name = None
    data_pattern = args.data
    if args.exp_id is not None:
        row = conf.active_experiment(args.exp_id)
        loss_name = row.get("loss")
        data_pattern = data_pattern or row.get("train_data")
    conf.print_features()

    data_pattern = data_pattern or conf.get_conf_value("data")
    batch_size = args.batch_size or int(conf.get_conf_value_or("batch_size", 1024))
    epochs = args.epochs or int(conf.get_conf_value_or("epoch", 1))
    debug = str2debug(args.train_mode)

    train_ds, valid_ds = make_dataset(
        conf, data_pattern, batch_size, dayno=args.dayno,
        valid_ratio=args.valid_ratio, seed=args.seed, debug=debug,
        host_id=jax.process_index(), num_hosts=jax.process_count())

    model, _ = build_network(conf.networks["class"],
                             {"conf": conf, "loss": loss_name})
    mesh = None if args.no_mesh else make_mesh()
    schedule = ({"type": args.lr_schedule, "warmup_steps": args.warmup_steps,
                 "decay_steps": args.decay_steps}
                if args.lr_schedule else None)
    trainer = Trainer(model, learning_rate=args.lr, lr_schedule=schedule,
                      mesh=mesh, shard_tables=args.shard_tables,
                      seed=args.seed)

    topk = str2list(args.topk, trans_type=int)
    eval_source = valid_ds or train_ds
    monitor = args.monitor
    if valid_ds is None and monitor == "val_auc":
        # val_auc only comes from trainer.evaluate(valid_ds), which fit()
        # skips without a validation split (e.g. the pattern resolved to a
        # single file) — EarlyStopping/Plateau/best-model would be
        # silently inert; the recall evaluator's hit@K exists either way
        # min(topk), not max: the evaluator clamps Ks to the corpus size and
        # small single-file datasets (exactly this fallback's case) can drop
        # every K > corpus; clamp_topk keeps at least min(topk), so that key
        # is the only one guaranteed to be produced
        monitor = f"val_hit@{min(topk)}"
        print(f"WARNING: no validation split — '{args.monitor}' is never "
              f"produced; monitoring '{monitor}' (train-set retrieval "
              f"eval) instead. Pass >= 2 files + --valid_ratio for a true "
              f"validation monitor.")
    callbacks = [
        EvalCallback(make_recall_evaluator(eval_source, topk_list=topk)),
        EarlyStopping(monitor=monitor, patience=args.patience),
    ]
    if args.lr_schedule:
        # a schedule re-derives the LR every step; set_learning_rate (what
        # the plateau callback uses) has no effect while one is active —
        # adding it anyway would log LR cuts that never happen
        print("note: --lr_schedule active; ReduceLROnPlateau disabled")
    else:
        callbacks.append(ReduceLROnPlateau(monitor=monitor,
                                           patience=max(args.patience - 1, 1)))
    save_root = args.model_save_root or conf.get_conf_value_or("model_save_root")
    if save_root and not debug:
        callbacks.append(ModelCheckpoint(os.path.join(save_root, "ckpt"),
                                         monitor=monitor))

    state = None
    if args.load_checkpoint:
        sample = next(iter(train_ds))
        state = trainer.init_state(trainer._put(sample))
        state = restore_checkpoint(args.load_checkpoint, state)

    preempt_dir = args.preempt_dir or (
        os.path.join(save_root, "preempt") if save_root else None)
    if preempt_dir:
        from recommendflow_tpu.train.trainer import install_preemption_handler
        install_preemption_handler(trainer)

    result = trainer.fit(train_ds, epochs=epochs, valid_ds=valid_ds,
                         callbacks=callbacks, state=state,
                         log_every=5 if debug else 100,
                         preempt_dir=preempt_dir,
                         resume_data=not args.warm_start)
    final = result["history"][-1] if result["history"] else {}
    print("final:", {k: round(v, 5) for k, v in final.items()})
    return result


if __name__ == "__main__":
    main()
