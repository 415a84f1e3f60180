"""Property-based fuzz over the config grammar: random feature specs must
drive the WHOLE stack — YAML parse -> schema compile -> synthetic records ->
pipeline decode -> model init -> train step -> eval step — without shape
errors, NaNs, or crashes. Catches integration bugs in feature-combination
space that the hand-written configs never visit."""
import os

import numpy as np
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import compile_schema
from recommendflow_tpu.data.pipeline import Dataset
from recommendflow_tpu.data.synthetic import generate_records, synthetic_batch
from recommendflow_tpu.models.base import build_network
from recommendflow_tpu.train import Trainer

pytestmark = pytest.mark.slow  # heavy: deselect with -m 'not slow'

DEALS = ["numeric", "discrete", "hashing", "lookup", "embedding"]
POOLINGS = ["sum", "avg", "min", "max", "first", "last"]


def _random_conf(rng: np.random.RandomState, path: str) -> str:
    lines = []
    n_user = rng.randint(1, 4)
    n_ad = rng.randint(1, 4)
    for i in range(n_user + n_ad):
        tower = "user" if i < n_user else "ad"
        deal = DEALS[rng.randint(len(DEALS))]
        pooling = POOLINGS[rng.randint(len(POOLINGS))]
        dim = int(rng.choice([4, 8, 16, 32]))
        if deal == "numeric":
            row = f"f{i},float,{tower},numeric,null,-1,null,true"
        elif deal == "discrete":
            row = f"f{i},float,{tower},discrete,$bins,{dim},{pooling},true"
        elif deal == "hashing":
            vtype = "str" if rng.rand() < 0.5 else "int"
            buckets = int(rng.choice([50, 500, 5000]))
            row = f"f{i},{vtype},{tower},hashing,{buckets},{dim},{pooling},true"
        elif deal == "lookup":
            vtype = "int" if rng.rand() < 0.5 else "str"
            vocab = "$int_vocab" if vtype == "int" else "$str_vocab"
            row = f"f{i},{vtype},{tower},lookup,{vocab},{dim},{pooling},true"
        else:  # embedding passthrough column
            row = f"f{i},float,{tower},embedding,null,-1,null,true"
        lines.append(f"    {row}")
    max_lens = "\n".join(
        f"    f{i}: {int(rng.choice([1, 3, 8]))}"
        for i in range(n_user + n_ad))
    conf = f"""
Features:
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
{os.linesep.join(lines)}
    label,float,label,numeric,null,-1,null,true

Variables:
  vocabs:
    bins: [0.1, 0.5, 2.0]
    int_vocab: [1, 2, 3, 4, 5, 6, 7]
    str_vocab: [aa, bb, cc, dd]
  seeds: [7, 99]
  max_len_map:
{max_lens}

Networks:
  class: recommendflow_tpu.models.matching.dssm.Dssm
  loss: recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss
  embedding_dim: 16
  tower_units: [32]
"""
    with open(path, "w") as f:
        f.write(conf)
    return path


@pytest.mark.parametrize("seed", range(8))
def test_random_config_end_to_end(seed, tmp_path):
    rng = np.random.RandomState(1000 + seed)
    conf = Configuration(_random_conf(rng, str(tmp_path / "fuzz.yaml")))
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    trainer = Trainer(model, learning_rate=1e-3, seed=seed)

    if seed % 2 == 0:
        # full path: records on disk -> pipeline decode
        paths = generate_records(conf, str(tmp_path / "recs"),
                                 num_rows=256, num_files=1, seed=seed)
        batches = list(Dataset(schema, paths, batch_size=64, shuffle=True,
                               seed=seed))
        assert len(batches) == 4
    else:
        batches = [synthetic_batch(schema, 64, seed=s) for s in range(2)]

    state = trainer.init_state(trainer._put(batches[0]))
    for b in batches[:2]:
        state, metrics = trainer.train_step(state, b)
        assert np.isfinite(float(metrics["loss"])), metrics
    out = trainer.eval_step(state, batches[0])
    assert out["user"].shape[1] == out["ad"].shape[1] == 16
    assert np.isfinite(np.asarray(out["user"])).all()
