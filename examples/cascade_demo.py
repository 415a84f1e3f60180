"""End-to-end cascade demo: matching -> (pre)ranking over retrieved candidates.

The reference scaffolds the classic cascade as empty model files (SURVEY
§2.6); this script runs the whole loop on synthetic data:

  1. train the two-tower recall model (conf/demo_recall.yaml),
  2. index item embeddings in TpuSearcher, retrieve top-K per query,
  3. train a DNN ranker on the same interactions,
  4. re-score each query's candidates with the ranker and report
     stage-1 recall@K vs end-to-end (rank-reordered) hit@k.

Run:  JAX_PLATFORMS=cpu python examples/cascade_demo.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import Dataset, compile_schema, resolve_paths
from recommendflow_tpu.data.synthetic import generate_records
from recommendflow_tpu.models.base import build_network
from recommendflow_tpu.retrieval import TpuSearcher, click_ranks, recall_metrics
from recommendflow_tpu.train import Trainer
from recommendflow_tpu.utils.tables import print_table

HERE = os.path.dirname(os.path.abspath(__file__))
TOPK = 50


def main():
    conf = Configuration(os.path.join(HERE, "..", "conf", "demo_recall.yaml"))
    schema = compile_schema(conf.features)
    data_dir = "/tmp/recflow_cascade"
    if not resolve_paths(data_dir):
        generate_records(conf, data_dir, num_rows=8000, num_files=2, seed=11)
    files = resolve_paths(data_dir)
    train_ds = Dataset(schema, files, batch_size=256, shuffle=True, seed=0)
    eval_ds = Dataset(schema, files[:1], batch_size=256, shuffle=False,
                      take_batches=8)

    # ---- stage 1: matching --------------------------------------------
    recall_model, _ = build_network("dssm", {"conf": conf, "tower_units": [64]})
    t1 = Trainer(recall_model, learning_rate=3e-3, seed=0)
    r1 = t1.fit(train_ds, epochs=2)
    out = t1.predict(r1["state"], eval_ds)
    q, d, y = out["user"], out["ad"], out["label"]
    pos = np.asarray(y) > 0.5

    d_pos = d[pos]
    keys = np.ascontiguousarray(np.round(d_pos, 5)).view(
        [("", d_pos.dtype)] * d_pos.shape[1]).ravel()
    _, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)
    corpus = d_pos[first_idx]
    searcher = TpuSearcher(dim=q.shape[1], metric="cos").train(corpus)
    k = min(TOPK, len(corpus))
    cand_items, cand_scores, _ = searcher.search(q[pos], topk=k)
    stage1 = recall_metrics(click_ranks(np.asarray(cand_items), inverse), [5, k])

    # ---- stage 2: ranking over candidates -----------------------------
    # rank candidates by a learned scorer over (query emb . item emb) with a
    # small MLP head trained on the same labels — a lightweight COLD-style
    # preranker consuming stage-1 embeddings.
    rank_model, _ = build_network(
        "recommendflow_tpu.models.preranking.cold.Cold",
        {"conf": conf, "hidden_units": (64,)})
    t2 = Trainer(rank_model, learning_rate=2e-3, seed=1)
    r2 = t2.fit(train_ds, epochs=1)
    rank_out = t2.predict(r2["state"], eval_ds)
    # per-query: re-order stage-1 candidates by ranker score of their rows —
    # here the candidate item's score approximated via corpus similarity to
    # the scored eval rows (demo plumbing: exact candidate scoring requires a
    # candidate feature join, which real deployments do in the feature store)
    ranker_score = np.asarray(rank_out["score"])[pos]
    # per-ITEM quality prior: mean ranker score over eval rows whose positive
    # item is that corpus item (the preranker's per-candidate contribution)
    item_prior = np.zeros(len(corpus))
    counts = np.zeros(len(corpus))
    np.add.at(item_prior, inverse, ranker_score)
    np.add.at(counts, inverse, 1.0)
    item_prior = item_prior / np.maximum(counts, 1.0)
    blended = np.asarray(cand_scores) + 0.5 * item_prior[np.asarray(cand_items)]
    order = np.argsort(-blended, axis=1)
    reord = np.take_along_axis(np.asarray(cand_items), order, axis=1)
    stage2 = recall_metrics(click_ranks(reord, inverse), [5, k])

    print_table(
        [["stage-1 recall", f"{stage1[f'hit@{k}']:.4f}", f"{stage1['hit@5']:.4f}"],
         ["cascade (reranked)", f"{stage2[f'hit@{k}']:.4f}", f"{stage2['hit@5']:.4f}"]],
        headers=["stage", f"hit@{k}", "hit@5"], title="Cascade demo")
    return stage1, stage2


if __name__ == "__main__":
    main()
