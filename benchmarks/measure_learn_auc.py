"""Measure each zoo model's achieved val AUC on the planted synthetic worlds
(the does-it-learn acceptance configs in tests/test_models.py) alongside the
Bayes-optimal ceiling of the click model (data/synthetic.py:bayes_ceiling).

Used to set the ceiling-relative acceptance fractions — run after changing a
model, the generator, or the acceptance budgets:
    JAX_PLATFORMS=cpu python benchmarks/measure_learn_auc.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import tempfile

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data.schema import compile_schema
from recommendflow_tpu.data.synthetic import bayes_ceiling, generate_records
from recommendflow_tpu.models.base import build_network

from test_models import (LEARN_ENCODER, LEARN_RANKING, LEARN_RECALL,
                         _fit_val_auc)

HERE = os.path.dirname(os.path.abspath(__file__))


def recall_world(tmp):
    conf = Configuration(os.path.join(HERE, "..", "conf", "demo_recall.yaml"))
    conf.networks["loss"] = \
        "recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss"
    paths = generate_records(conf, tmp, num_rows=6000, num_files=1, seed=5)
    return conf, compile_schema(conf.features), paths


def ranking_world(tmp):
    conf = Configuration(os.path.join(HERE, "..", "conf", "demo_ranking.yaml"))
    paths = generate_records(conf, tmp, num_rows=6000, num_files=1, seed=6)
    return conf, compile_schema(conf.features), paths


def main():
    print(f"bayes ceiling (recall seed 5): {bayes_ceiling(seed=5):.4f}")
    print(f"bayes ceiling (ranking seed 6): {bayes_ceiling(seed=6):.4f}",
          flush=True)
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        worlds = {"recall": recall_world(t1), "ranking": ranking_world(t2)}
        suites = [("recall", LEARN_RECALL, None),
                  ("ranking", LEARN_RANKING, None),
                  ("ranking", LEARN_ENCODER, "encoder")]
        for world_name, suite, mode in suites:
            conf, schema, paths = worlds[world_name]
            for path, kwargs, thresh, epochs, lr in suite:
                c = conf
                if mode == "encoder":
                    c = Configuration(os.path.join(
                        HERE, "..", "conf", "demo_ranking.yaml"))
                    c.networks["loss"] = ("recommendflow_tpu.losses.match."
                                          "batch_neg_sample_scaled_multi_class_ce_loss")
                    c.networks["embedding_dim"] = 32
                    c.networks["text_vocab_size"] = 200
                    c.networks["text_dim"] = 32
                    c.networks["text_layers"] = 1
                    c.networks["text_pooling"] = "avg"
                    enc = {"vocab_size": 200, "num_layers": 1,
                           "model_dim": 32, "pooling": "avg"}
                    c.networks["user_encoder"] = dict(enc)
                    c.networks["ad_encoder"] = dict(enc)
                model, _ = build_network(path, {"conf": c, **kwargs})
                t0 = time.time()
                auc = _fit_val_auc(c, schema, paths, model,
                                   epochs=epochs, lr=lr)
                name = path.rsplit(".", 1)[1]
                print(f"{name:20s} auc={auc:.4f} thresh={thresh} "
                      f"epochs={epochs} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
