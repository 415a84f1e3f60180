"""L0 data-prep helpers (parity: reference utils/util.py:83-348)."""
import numpy as np
import pandas as pd
import pytest

from recommendflow_tpu.utils.dataprep import (
    df2str, dump_csv, filter_illegal_chars, get_datetime, get_delta_seconds,
    mem_percentage, sample_neg_app, save_text, split_and_shuffle,
)


def test_filter_illegal_chars():
    assert filter_illegal_chars("a b,c。d！e") == "abcde"
    assert filter_illegal_chars("纯中文保留") == "纯中文保留"
    assert filter_illegal_chars("") == ""


def test_sample_neg_app_excludes_positives_and_respects_weights():
    weights = {"a": 1.0, "b": 1.0, "c": 1000.0, "pos": 5.0}
    out = sample_neg_app(weights, ["pos", "pos2"], 3, seed=0)
    assert len(out) == 2 * 3
    assert "pos" not in out
    counts = {k: 0 for k in ("a", "b", "c")}
    for _ in range(50):
        for x in sample_neg_app(weights, ["pos"], 4, seed=None):
            counts[x] += 1
    assert counts["c"] > counts["a"] + counts["b"]  # weight dominates


def test_sample_neg_app_all_positive_raises():
    with pytest.raises(ValueError):
        sample_neg_app({"a": 1.0}, ["a"], 2)


def test_datetime_helpers():
    today = get_datetime(0, "%Y%m%d")
    tomorrow = get_datetime(1, "%Y%m%d")
    assert len(today) == 8 and today != tomorrow
    assert get_delta_seconds("2026.01.01-00:00:10",
                             "2026.01.01-00:00:00") == 10.0
    # order-insensitive (reference abs())
    assert get_delta_seconds("2026.01.01-00:00:00",
                             "2026.01.01-00:01:00") == 60.0


def test_dump_csv_and_save_text(tmp_path, capsys):
    df = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    p = str(tmp_path / "out.csv")
    dump_csv(df, p, show=2)
    back = pd.read_csv(p, sep="\t")
    assert list(back["x"]) == [1, 2, 3]
    assert "3 rows" in capsys.readouterr().out

    t = str(tmp_path / "out.txt")
    save_text(["l1", 2], t)
    assert open(t).read() == "l1\n2\n"
    save_text("solo", t)
    assert open(t).read() == "solo\n"


def test_split_and_shuffle_modes():
    df = pd.DataFrame({"v": np.arange(100), "dayno": [20260101] * 50 + [20260102] * 50})
    tr, va = split_and_shuffle(df, 0.2, shuffle_mode=None)
    assert len(tr) == 80 and len(va) == 20
    assert list(va["v"]) == list(range(80, 100))  # ordered tail split

    tr, va = split_and_shuffle(df, 0.2, shuffle_mode="all", seed=0)
    assert len(tr) == 80 and len(va) == 20
    assert set(tr["v"]) | set(va["v"]) == set(range(100))
    assert list(va["v"]) != list(range(80, 100))  # actually shuffled

    tr, va = split_and_shuffle(df, 0.2, shuffle_mode="in_day", seed=0)
    assert len(va) == 20
    assert sorted(va["dayno"].value_counts()) == [10, 10]  # each day stratified

    with pytest.raises(ValueError):
        split_and_shuffle(df, 0.2, shuffle_mode="bogus")
    with pytest.raises(AssertionError):
        split_and_shuffle(df.drop(columns=["dayno"]), 0.2,
                          shuffle_mode="in_day")


def test_df2str_renders_box_table():
    df = pd.DataFrame({"count": [3.0, 5.0], "score": [0.123456, 1.0]},
                      index=["q1", "q2"])
    s = df2str(df)
    assert "INDEX" in s and "count" in s
    assert "0.12346" in s  # 5-decimal float formatting
    assert " 3 " in s  # count column cast to int
    assert s.count("\n") >= 4  # box borders + header + 2 rows


def test_mem_percentage():
    v = mem_percentage()
    assert v.endswith("%") and 0.0 <= float(v[:-1]) <= 100.0


def test_df2str_duplicate_index():
    # concat output with overlapping RangeIndexes must render, not raise
    # (to_dict('index') would demand a unique index)
    import pandas as pd
    a = pd.DataFrame({"x": [1.0, 2.0]})
    s = df2str(pd.concat([a, a]))
    assert s.count("1.00000") == 2 and s.count("2.00000") == 2
