"""Compatibility pin: the reference's OWN shipped configs parse here.

Config-surface parity is the framework's core promise (SURVEY §7: "Keep the
reference's config surface ... so demo configs port over"). These tests load
the reference repo's real production files verbatim:

* ``conf/base_recall_sdpa.yaml`` + its 231-line ``.feature.map`` — integer
  feature-group slots with ``[1, 4, ..., 71]`` ellipsis (reference
  conf/base_recall_sdpa.yaml:3-5) — must expand to 232 features and
  schema-compile to 229 TPU slots (3 label columns excluded).
* ``conf/demo_conf.yaml`` / ``conf/base_conf.yaml`` — vocab variables point
  at ``hdfs://`` CSVs, so parsing uses the injectable ``vocab_reader`` seam
  (the reference would equally fail off-cluster); experiment rows, $var
  substitution, and ± working-flag toggles must survive.
"""
import copy
import os

import pytest
import yaml

from recommendflow_tpu.config import Configuration, FeatureDeal
from recommendflow_tpu.data.schema import compile_schema

REF_CONF = "/root/reference/conf"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONF), reason="reference repo not present")


def _stub_vocab_reader(path: str):
    """Stands in for unreachable hdfs:// vocab CSVs; digit strings satisfy
    both int-typed lookup casters and discrete float-bin casters."""
    assert path.startswith("hdfs://"), f"unexpected local fetch: {path}"
    return ["1", "2", "3", "5", "8"]


def test_base_recall_sdpa_parses_and_compiles():
    # no vocab stubbing needed: its Variables.vocabs is {} — but the integer
    # feature groups need the slot map, passed the same way a user would
    # (slot_map key; the reference's yaml doesn't carry the path — its
    # callers pass slot_map_path to Features by hand)
    raw = yaml.safe_load(open(os.path.join(REF_CONF, "base_recall_sdpa.yaml")))
    raw["Variables"]["slot_map"] = os.path.join(
        REF_CONF, "base_recall_sdpa.feature.map")
    conf = Configuration(conf=raw)

    assert len(conf.features.features) == 232
    names = [f.name for f in conf.features.features]
    assert "channel" in names and "imei" in names  # slot-map names resolved
    assert len(names) == len(set(names))

    schema = compile_schema(conf.features)
    assert len(schema.slots) == 229  # 232 - 3 label columns
    # every hashing feature carries the conf's [2022, 2023] double-hash seeds
    hashed = [f for f in conf.features.features
              if f.deal == FeatureDeal.Hashing]
    assert hashed and all(list(f.hash_seeds) == [2022, 2023] for f in hashed)
    # $var substitution inside dayno_conf ($dayno-14 etc.)
    dc = conf.get_conf_value("dayno_conf")
    assert dc["train"] == "20230214-14" and dc["eval"] == "20230214+:1"


def test_demo_conf_parses_with_stubbed_vocabs():
    raw = yaml.safe_load(open(os.path.join(REF_CONF, "demo_conf.yaml")))
    conf = Configuration(conf=raw, vocab_reader=_stub_vocab_reader)
    assert conf.features.features, "no features parsed"
    # hdfs:// lookup vocabs resolved through the stub (5 entries each);
    # literal-list vocabs (top_cat: [game, app]) keep their own values
    lookups = [f for f in conf.features.features
               if f.deal == FeatureDeal.Lookup and isinstance(f.vocabs, list)]
    assert sum(len(f.vocabs) == 5 for f in lookups) >= 4
    top_cat = next(f for f in conf.features.features if f.name == "top_cat")
    assert top_cat.vocabs == ["game", "app"]


def test_base_conf_experiments_and_toggles():
    raw = yaml.safe_load(open(os.path.join(REF_CONF, "base_conf.yaml")))
    conf = Configuration(conf=raw, vocab_reader=_stub_vocab_reader)

    # experiment matrix: rows over experiment_fields, exp_id first
    assert conf.experiment_field[0] == "exp_id"
    assert conf.experiments, "no experiment rows parsed"
    row0 = conf.experiments["0"] if "0" in conf.experiments else \
        next(iter(conf.experiments.values()))
    assert row0["loss"] == "cosent"
    # $train_data1 resolved through Variables
    assert str(row0["train_data"]).startswith("hdfs://")

    # ± feature toggles: the del_sug_and_desc experiment turns features off
    # (some are already off in the shipped config — the invariant is the
    # POST-state, matching the reference's idempotent '-feat' semantics)
    toggled = [r for r in conf.experiments.values()
               if isinstance(r.get("features"), list)
               and any(str(t).startswith("-") for t in r["features"])]
    assert toggled, "no toggle experiment rows found"
    exp_id = next(k for k, v in conf.experiments.items() if v is toggled[0])
    conf.active_experiment(exp_id)
    flipped = [t[1:] for t in toggled[0]["features"]
               if str(t).startswith("-")]
    assert flipped
    for name in flipped:
        feat = next(f for f in conf.features.features if f.name == name)
        assert feat.working is False


def test_demo_conf_second_pass_flag_consistency():
    raw = yaml.safe_load(open(os.path.join(REF_CONF, "demo_conf.yaml")))
    conf = Configuration(conf=copy.deepcopy(raw),
                         vocab_reader=_stub_vocab_reader)
    has_second = (conf.features.contain_deal(FeatureDeal.Image)
                  or conf.features.contain_deal(FeatureDeal.Embedding))
    assert conf.need_parse_second == has_second
