"""Config subsystem tests: YAML load, $var substitution, feature grammar,
group/ellipsis expansion, vocab resolution, experiments, toggles."""
import os
import textwrap

import pytest

from recommendflow_tpu.config import (
    Configuration, Feature, FeatureDeal, FeaturePooling, FeatureTower, Features,
)
from recommendflow_tpu.utils.str_parser import (
    str2bool, str2dayno, str2dict, str2list, str2scale,
)


# ------------------------------------------------------------------ str DSL
def test_str2list_and_dict():
    assert str2list(" a, b,c ,") == ["a", "b", "c"]
    assert str2list("1,2,3", trans_type=int) == [1, 2, 3]
    assert str2dict("a=1;b=x=y") == {"a": "1", "b": "x=y"}


def test_str2scale():
    pred = str2scale("[-0.01, inf)")
    assert pred(-0.01) and pred(0.5) and not pred(-0.5)
    pred2 = str2scale("(0, 1]")
    assert pred2(1) and not pred2(0)


def test_str2dayno_forms():
    assert str2dayno("20221126~20221128", mode="list") == ["20221126", "20221127", "20221128"]
    assert str2dayno("[20221126~20221128)", mode="list") == ["20221126", "20221127"]
    assert str2dayno("20221128", mode="list") == ["20221128"]
    assert str2dayno("20221128-2", mode="list") == ["20221126", "20221127", "20221128"]
    assert str2dayno("20221128-:2", mode="list") == ["20221126", "20221127"]
    assert str2dayno("20221128+:1", mode="list") == ["20221129"]
    pat = str2dayno("20221128-2", mode="patten")
    assert pat == "2022112{6,7,8}"  # longest common prefix is folded out


def test_str2bool():
    assert str2bool("True") and str2bool("true") and not str2bool("false")


# ------------------------------------------------------------ demo config
def test_demo_config_loads(demo_conf_path):
    conf = Configuration(demo_conf_path)
    names = conf.train_feature_names
    assert "user_id" in names and "item_id" in names and "label" in names
    assert "clk_item_ids" in names  # group expansion
    f = conf.features.get_feature("clk_item_ids")
    assert f.deal == FeatureDeal.Hashing and f.vocab_size == 20000
    assert f.max_len == 16  # from max_len_map
    assert f.hash_seeds == [2022, 2023]
    cats = conf.features.get_feature("clk_cat_ids")
    assert cats.deal == FeatureDeal.Lookup and cats.vocab_size == 16
    disc = conf.features.get_feature("item_ctr")
    assert disc.deal == FeatureDeal.Discrete and disc.vocab_size == 5
    assert disc.vocabs == [0.001, 0.005, 0.01, 0.05, 0.1]


def test_dollar_substitution(demo_conf_path):
    conf = Configuration(demo_conf_path)
    # $train_data replaced inside Train.data
    assert conf.conf["Train"]["data"] == "/tmp/recflow_demo/train"
    # $dayno embedded arithmetic string: "$dayno-7" -> "20260817-7"
    assert conf.conf["Task"]["dayno_conf"]["train"] == "20260817-7"


def test_towers_and_deal_attrs(demo_conf_path):
    conf = Configuration(demo_conf_path)
    assert set(conf.features.user_feature_names) == {"user_id", "clk_item_ids", "clk_cat_ids"}
    assert set(conf.features.ad_feature_names) == {"item_id", "item_cat_id", "item_ctr", "item_cvr"}
    assert conf.features.label_names == ["label"]
    # dynamic deal attrs
    assert "user_id" in conf.features.hashing_feature_names
    assert "item_ctr" in conf.features.discrete_feature_names


def test_experiments_and_toggles(demo_conf_path):
    conf = Configuration(demo_conf_path)
    assert set(conf.experiments) == {0, 1}
    row = conf.active_experiment(1)
    assert row["loss"] == "cosent_loss"
    assert not conf.features.contain("clk_cat_ids")  # toggled off
    assert conf.features.contain("user_id")
    conf.active_experiment(0)  # no_del does not re-enable; toggles are cumulative
    assert not conf.features.contain("clk_cat_ids")
    conf.features.set_feature_valid(name="clk_cat_ids")
    assert conf.features.contain("clk_cat_ids")


def test_feature_filter_or_semantics(demo_conf_path):
    conf = Configuration(demo_conf_path)
    both = conf.features.feature_filter(deal="hashing|lookup")
    assert {f.deal for f in both} == {FeatureDeal.Hashing, FeatureDeal.Lookup}
    none_user = conf.features.feature_except(tower="user")
    assert all(f.tower != FeatureTower.User for f in none_user)


def test_feature_name_equality_dict_key(demo_conf_path):
    conf = Configuration(demo_conf_path)
    f = conf.features.get_feature("user_id")
    d = {"user_id": 1}
    assert d[f.name] == 1 and f == "user_id"


# ------------------------------------------------------- inline yaml cases
def _mini_conf(features_block: str, extra: str = "") -> dict:
    import yaml
    text = textwrap.dedent(f"""
    Features:
      feature_group: {{}}
      feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
      features:
        {features_block}
    Variables:
      vocabs: {{}}
      seeds: 7
    {extra}
    """)
    return yaml.safe_load(text)


def test_single_seed_hashing():
    conf = Configuration(conf=_mini_conf("a,str,user,hashing,100,8,sum,true"))
    f = conf.features.get_feature("a")
    assert f.hash_seeds == 7 and f.vocab_size == 100


def test_conflicting_feature_names_raise():
    import yaml
    text = textwrap.dedent("""
    Features:
      feature_group:
        g1: [x, y]
        g2: [y, z]
      feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
      features:
        g1,str,user,hashing,100,8,sum,true
        g2,str,user,hashing,100,8,sum,true
    """)
    with pytest.raises(ValueError, match="conflict"):
        Configuration(conf=yaml.safe_load(text))


def test_lookup_without_vocab_raises():
    with pytest.raises(ValueError, match="vocab"):
        Configuration(conf=_mini_conf("a,int,user,lookup,null,8,sum,true"))


def test_auto_vocab_bucket():
    conf = Configuration(conf=_mini_conf("a,int,user,lookup,500,8,sum,true"))
    f = conf.features.get_feature("a")
    assert f.vocab_size == 500 and f.is_auto_vocabs()


def test_slot_map_ellipsis(tmp_path):
    slot_map = tmp_path / "slots.map"
    slot_map.write_text("".join(f"feat_{i}:StringType:{i}\n" for i in range(10)))
    import yaml
    text = textwrap.dedent(f"""
    Features:
      feature_group:
        sparse: [0, 2, ..., 5, 9]
      feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
      features:
        sparse,str,user,hashing,1000,8,sum,true
    Variables:
      slot_map: {slot_map}
      seeds: [1, 2]
    """)
    conf = Configuration(conf=yaml.safe_load(text))
    names = conf.train_feature_names
    assert names == ["feat_0", "feat_2", "feat_3", "feat_4", "feat_5", "feat_9"]


def test_plus_toggle_reenables_disabled_group_member(demo_conf_path):
    """'+name' must find features that are currently disabled (the whole
    point of the toggle) — contain_any vs working-only contain."""
    conf = Configuration(demo_conf_path)
    conf.features.set_feature_invalid(name="clk_cat_ids")
    assert not conf.features.contain("clk_cat_ids")
    conf.experiments[0]["features"] = ["+clk_cat_ids"]
    conf.active_experiment(0)
    assert conf.features.contain("clk_cat_ids")


def test_discrete_with_int_bucket_rejected():
    import yaml, textwrap
    text = textwrap.dedent("""
    Features:
      feature_group: {}
      feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
      features:
        a,float,user,discrete,100,8,sum,true
    Variables:
      seeds: 1
    """)
    with pytest.raises(ValueError, match="bin boundaries"):
        Configuration(conf=yaml.safe_load(text))


# ------------------------------------------------------------- review fixes
def _write_conf(tmp_path, features_row, extra=""):
    p = tmp_path / "c.yaml"
    p.write_text(f"""
Variables:
  vocabs:
    frac_bins: [0.5, 1.5]
    token_list: [a, b, c]
Features:
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    {features_row}
    label,float,label,numeric,null,-1,null,true
{extra}
Networks:
  class: recommendflow_tpu.models.matching.dssm.Dssm
""")
    return str(p)


def test_discrete_boundaries_not_int_cast(tmp_path):
    """Bin boundaries are thresholds, not values: an int-typed discrete
    feature with fractional boundaries must keep them (regression test for
    a review finding)."""
    from recommendflow_tpu.config import Configuration

    conf = Configuration(_write_conf(
        tmp_path, "cnt,int,user,discrete,$frac_bins,8,sum,true"))
    f = conf.features.get_features_by_name(["cnt"])[0]
    assert list(f.vocabs) == [0.5, 1.5]


def test_bert_encode_list_vocab_rejected(tmp_path):
    """bert_encode vocab must be a file path; a token list (legal for
    lookup) must fail at parse time, not inside the decode pool
    (regression test for a review finding)."""
    import pytest as _pytest

    from recommendflow_tpu.config import Configuration

    with _pytest.raises(ValueError, match="file path"):
        Configuration(_write_conf(
            tmp_path, "txt,str,user,bert_encode,$token_list,8,cls,true"))


def test_experiment_row_length_checked(tmp_path):
    """Experiment rows must match experiment_fields exactly — zip() would
    silently drop/omit cells (regression test for a review finding)."""
    import pytest as _pytest

    from recommendflow_tpu.config import Configuration

    extra = """
Experiments:
  experiment_fields: [exp_id, loss, lr]
  experiments:
    - 0,cosent_loss
"""
    with _pytest.raises(ValueError, match="experiment row 0"):
        Configuration(_write_conf(
            tmp_path, "cat,str,user,hashing,100,8,sum,true", extra))


def test_str2dayno_single_day_and_fn_resolution():
    """Single-day patterns are literal (no '{}' suffix — bash/hadoop treat
    it literally); str2fn refuses non-callable module attributes
    (regression: review findings)."""
    import pytest as _pytest

    from recommendflow_tpu.utils.str_parser import str2dayno, str2fn
    assert str2dayno("20221128") == "20221128"
    assert "{" in str2dayno("20221128-2")
    with _pytest.raises(AttributeError):
        str2fn("jnp", default_module="recommendflow_tpu.losses.classify")
    fn = str2fn("cosent_loss")
    assert callable(fn)


def test_adjacent_dollar_tokens_and_cycles():
    """'$a$b' must substitute BOTH tokens (was mis-read as one name); a
    cyclic $reference errors clearly AT PARSE TIME instead of dying in
    RecursionError."""
    feats = {
        "feature_group": {},
        "feature_fields": ["group", "type", "tower", "deal", "vocab",
                           "embedding_dim", "pooling", "working"],
        "features": "label,float,label,numeric,null,-1,null,true"}
    conf = Configuration(conf={
        "Features": dict(feats),
        "Variables": {"a": "left", "b": "right"}})
    assert conf._sub_value("$a$b") == "leftright"
    with pytest.raises(ValueError, match="cyclic"):
        Configuration(conf={
            "Features": dict(feats),
            "Variables": {"x": "$y", "y": "$x"},
            "Task": {"out": "$x"}})


def test_find_key_descends_lists_and_null_stops():
    conf = Configuration(conf={
        "Features": {
            "feature_group": {},
            "feature_fields": ["group", "type", "tower", "deal", "vocab",
                               "embedding_dim", "pooling", "working"],
            "features": "label,float,label,numeric,null,-1,null,true"},
        "Datasets": [{"name": "d1", "lr2": 0.01}],
        "Train": {"seeds2": None},
        "Deep": {"nest": {"seeds2": 42}}})
    assert conf.get_conf_value("lr2") == 0.01          # list descent
    # explicit null stops at the FIRST occurrence: default, not the
    # deeper same-named key
    assert conf.get_conf_value_or("seeds2", "dflt") == "dflt"


def test_substitute_skips_only_packed_sections():
    """An unrelated key merely NAMED 'features' still substitutes."""
    conf = Configuration(conf={
        "Features": {
            "feature_group": {},
            "feature_fields": ["group", "type", "tower", "deal", "vocab",
                               "embedding_dim", "pooling", "working"],
            "features": "label,float,label,numeric,null,-1,null,true"},
        "Variables": {"cols": "a,b"},
        "Datasets": {"features": "$cols"}})
    assert conf.conf["Datasets"]["features"] == "a,b"


def test_reset_features_undoes_toggles(demo_conf_path):
    conf = Configuration(demo_conf_path)
    conf.active_experiment(1)
    assert not conf.features.contain("clk_cat_ids")
    conf.reset_features()
    assert conf.features.contain("clk_cat_ids")


def test_string_int_slot_groups_and_regex_filter(tmp_path):
    """Packed-string integer-slot groups behave like int lists; name_rlike
    is a real regex (was substring containment)."""
    slot_map = tmp_path / "slots.map"
    slot_map.write_text("feat_0:str:0\nfeat_2:str:2\nfeat_9:str:9\n")
    conf = Configuration(conf={
        "Features": {
            "feature_group": {"sparse": "0,2,9"},
            "feature_fields": ["group", "type", "tower", "deal", "vocab",
                               "embedding_dim", "pooling", "working"],
            "features": "sparse,str,user,hashing,100,8,sum,true\n"
                        "label,float,label,numeric,null,-1,null,true",
            "slot_map": str(slot_map)},
        "Variables": {"seeds": 1}})
    names = {f.name for f in conf.features.train_features}
    assert {"feat_0", "feat_2", "feat_9"} <= names
    assert [f.name for f in conf.features.feature_filter(
        name_rlike="^feat_[02]$")] == ["feat_0", "feat_2"]


def test_dollar_in_numeric_cells_errors_clearly():
    with pytest.raises(ValueError, match="not supported in the"):
        Configuration(conf={
            "Features": {
                "feature_group": {},
                "feature_fields": ["group", "type", "tower", "deal", "vocab",
                                   "embedding_dim", "pooling", "working"],
                "features": "uid,str,user,hashing,$buckets,16,sum,true"},
            "Variables": {"seeds": 1, "buckets": 1000}})
