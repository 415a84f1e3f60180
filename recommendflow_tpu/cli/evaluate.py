"""CLI: offline retrieval/ranking evaluation of a checkpoint.

Fills the reference's empty example/recall_search/evaluate.py: predict
embeddings/scores over an eval set, run the full recall metric suite
(hit/mrr/ndcg@K with optional group breakdowns) or AUC/AUPR for rankers,
print the aligned report (eval_utils.py:206-220 surface).
"""
from __future__ import annotations

import argparse

import numpy as np

from recommendflow_tpu.utils.str_parser import str2list
from recommendflow_tpu.utils.tables import print_args, print_table


def main(argv=None):
    from recommendflow_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # warm-process compiles -> seconds
    p = argparse.ArgumentParser(description="Evaluate a checkpoint")
    p.add_argument("conf")
    p.add_argument("--data", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--exp_id", type=int, default=None,
                   help="activate experiment row (must match the "
                        "checkpoint's training run)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--topk", default="5,10,50,100,200,300")
    p.add_argument("--dayno", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    print_args(args)

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.pipeline import make_dataset
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.retrieval import (
        TpuSearcher, batch_compute_recall_score, recall_report,
    )
    from recommendflow_tpu.train import Trainer
    from recommendflow_tpu.train.checkpoint import restore_checkpoint
    from recommendflow_tpu.train.metrics import average_precision, recall_at_precision, roc_auc

    conf = Configuration(args.conf)
    if args.exp_id is not None:
        conf.active_experiment(args.exp_id)  # ±feature toggles change the
        # working feature set, hence the checkpoint's param tree
    batch_size = args.batch_size or int(conf.get_conf_value_or("batch_size", 1024))
    # offline eval must see every example — a dropped tail would silently
    # exclude up to batch_size-1 rows (or ALL rows for sets < batch_size);
    # the one short tail batch just costs predict a second compile
    ds, _ = make_dataset(conf, args.data, batch_size, dayno=args.dayno,
                         shuffle=False, valid_ratio=0.0, seed=args.seed,
                         drop_remainder=False)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    # single-device jit: the short tail batch need not divide a dp mesh
    # (offline eval is one-chip work; the library API still offers
    # mesh-sharded predict for multi-host jobs)
    trainer = Trainer(model)
    state = trainer.init_state(trainer._put(next(iter(ds))))
    if args.checkpoint:
        state = restore_checkpoint(args.checkpoint, state)
    else:
        print("WARNING: no --checkpoint given — evaluating RANDOMLY "
              "INITIALIZED weights (baseline numbers, not a trained model)")
    out = trainer.predict(state, ds)

    if "user" in out and "ad" in out:
        from recommendflow_tpu.retrieval.eval import (build_eval_corpus,
                                                       clamp_topk)
        q, d, y = out["user"], out["ad"], out.get("label")
        corpus, inverse, pos = build_eval_corpus(q, d, y)
        if corpus is None:
            print("no positive rows in the eval set — recall metrics skipped")
            return
        searcher = TpuSearcher(dim=q.shape[1], metric="cos").train(corpus)
        topk = clamp_topk(str2list(args.topk, trans_type=int), len(corpus))
        metrics = batch_compute_recall_score(searcher, q[pos], inverse, topk)
        print(f"corpus items: {len(corpus)}, queries: {int(pos.sum())}")
        print(recall_report(metrics, topk))
        if y is not None:
            scores = np.sum(np.asarray(q) * np.asarray(d), axis=1)
            print(f"auc={roc_auc(y, scores):.5f}")
    elif "score" in out:
        y, s = np.asarray(out["label"]), np.asarray(out["score"])
        rec, thr = recall_at_precision(y, s, 0.6)
        print_table([["auc", f"{roc_auc(y, s):.5f}"],
                     ["aupr", f"{average_precision(y, s):.5f}"],
                     ["recall@precision>=0.6", f"{rec:.5f} (thr={thr:.4f})"]],
                    headers=["metric", "value"], title="Ranking evaluation")
    else:
        raise SystemExit(f"model outputs {list(out)} — nothing evaluable")


if __name__ == "__main__":
    main()
