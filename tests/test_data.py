"""Data layer tests: record codec round-trip, schema compilation, CSR padding,
host-side hashing/lookup/discretize, pipeline batching."""
import os
import numpy as np
import pytest

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import (
    BatchSchema, ColumnSpec, Dataset, PAD_ID, RecordWriter,
    compile_schema, count_rows, hash_bucket, hash_bucket_array, iter_blocks,
)
from recommendflow_tpu.data.pipeline import (
    _pad_csr, encode_block, expand_braces, prefetch, resolve_paths, split_files,
)
from recommendflow_tpu.data.schema import encode_discrete, encode_lookup
from recommendflow_tpu.data.synthetic import generate_records


# ----------------------------------------------------------------- recordio
def test_recordio_roundtrip(tmp_path):
    path = str(tmp_path / "t.rfb")
    cols = [ColumnSpec("ids", "int"), ColumnSpec("score", "float"), ColumnSpec("tok", "str")]
    rows = [
        {"ids": [1, 2, 3], "score": [0.5], "tok": ["a", "bb"]},
        {"ids": [], "score": [1.5], "tok": []},
        {"ids": [7], "score": [], "tok": ["ccc"]},
    ]
    with RecordWriter(path, cols, block_rows=2) as w:  # force 2 blocks
        w.write_rows(rows)
    assert count_rows(path) == 3
    got_rows = []
    for nrows, block in iter_blocks(path):
        for i in range(nrows):
            row = {}
            for name, (vals, splits) in block.items():
                row[name] = list(vals[splits[i]:splits[i + 1]])
            got_rows.append(row)
    assert got_rows[0]["ids"] == [1, 2, 3]
    assert got_rows[0]["tok"] == ["a", "bb"]
    assert got_rows[1]["ids"] == [] and got_rows[1]["score"] == [1.5]
    assert got_rows[2]["tok"] == ["ccc"]


def test_recordio_column_subset(tmp_path):
    path = str(tmp_path / "t.rfb")
    cols = [ColumnSpec("a", "int"), ColumnSpec("b", "str"), ColumnSpec("c", "float")]
    with RecordWriter(path, cols) as w:
        w.write_row({"a": [1], "b": ["x"], "c": [2.0]})
    _, block = next(iter_blocks(path, columns=["c"]))
    assert set(block) == {"c"}
    np.testing.assert_allclose(block["c"][0], [2.0])


def test_recordio_bad_magic(tmp_path):
    path = str(tmp_path / "bad.rfb")
    path_obj = tmp_path / "bad.rfb"
    path_obj.write_bytes(b"NOPE1234")
    with pytest.raises(ValueError, match="not an RFB1"):
        list(iter_blocks(path))


# ------------------------------------------------------------------ hashing
def test_hash_determinism_and_salts():
    a = hash_bucket("hello", 2022, 1000)
    assert a == hash_bucket("hello", 2022, 1000)
    assert hash_bucket("hello", 2023, 1000) != a or True  # different salt usually differs
    arr = hash_bucket_array(["hello", "world", "hello"], 2022, 1000)
    assert arr[0] == arr[2] == a
    assert (arr >= 0).all() and (arr < 1000).all()


def test_encode_lookup_and_discrete():
    ids = encode_lookup(np.array(["a", "b", "zzz"], dtype=object), ["a", "b", "c"])
    assert list(ids) == [1, 2, PAD_ID]
    bins = encode_discrete(np.array([0.0001, 0.003, 0.2]), [0.001, 0.005, 0.01])
    assert list(bins) == [1, 2, 4]  # shifted +1, pad=0 reserved


# ------------------------------------------------------------------- schema
def test_compile_schema(demo_conf_path):
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    assert schema.label_names == ["label"]
    uid = schema.slots["user_id"]
    assert uid.kind == "sparse" and uid.num_hashes == 2 and uid.num_rows == 20001
    assert uid.out_dim == 32  # 2 hashes x dim 16
    clk = schema.slots["clk_item_ids"]
    assert clk.max_len == 16
    cats = schema.slots["clk_cat_ids"]
    assert cats.num_hashes == 1 and cats.num_rows == 17
    ctr = schema.slots["item_ctr"]
    assert ctr.num_rows == 7  # 5 boundaries -> 6 bins + pad
    # stacked table groups: dims {16, 8}
    assert set(schema.groups) == {8, 16}
    g16 = schema.groups[16]
    assert g16.total_rows == sum(t.num_rows for t in g16.tables)
    # user tower width: 2*16 (uid) + 2*16 (clicks) + 16 (cats)
    assert schema.tower_dim("user") == 80


def test_pad_csr():
    values = np.array([1, 2, 3, 4, 5])
    splits = np.array([0, 3, 3, 5])
    out, mask = _pad_csr(values, splits, 4, 0, np.int64)
    np.testing.assert_array_equal(out, [[1, 2, 3, 0], [0, 0, 0, 0], [4, 5, 0, 0]])
    np.testing.assert_array_equal(mask.sum(axis=1), [3, 0, 2])
    # truncation
    out2, _ = _pad_csr(values, np.array([0, 5]), 2, 0, np.int64)
    np.testing.assert_array_equal(out2, [[1, 2]])


# ----------------------------------------------------------------- pipeline
def test_expand_braces():
    assert expand_braces("a{1,2}b") == ["a1b", "a2b"]
    assert expand_braces("x") == ["x"]
    assert expand_braces("a{1,2}b{x,y}") == ["a1bx", "a1by", "a2bx", "a2by"]


def test_synthetic_and_dataset(demo_conf_path, tmp_path):
    conf = Configuration(demo_conf_path)
    out = str(tmp_path / "records")
    paths = generate_records(conf, out, num_rows=600, num_files=2, seed=1)
    assert len(paths) == 2
    schema = compile_schema(conf.features)
    ds = Dataset(schema, paths, batch_size=128, shuffle=True, seed=0)
    batches = list(ds)
    assert len(batches) == 600 // 128 == len(ds)
    b = batches[0]
    assert b["user_id"].shape == (128, 2, 1) and b["user_id"].dtype == np.int32
    assert b["clk_item_ids"].shape == (128, 2, 16)
    assert b["clk_cat_ids"].shape == (128, 1, 8)
    assert b["item_ctr"].shape == (128, 1, 1)
    assert b["label"].shape == (128,) and b["label"].dtype == np.float32
    # ids within table range
    assert b["user_id"].max() < schema.slots["user_id"].num_rows
    assert b["user_id"].min() >= 0
    # shapes constant across batches (jit contract)
    for bb in batches[1:]:
        for k in b:
            assert bb[k].shape == b[k].shape
    # labels have both classes
    labs = np.concatenate([bb["label"] for bb in batches])
    assert 0.0 < labs.mean() < 1.0


def test_dataset_take_and_remainder(demo_conf_path, tmp_path):
    conf = Configuration(demo_conf_path)
    paths = generate_records(conf, str(tmp_path / "r"), num_rows=300, num_files=1)
    schema = compile_schema(conf.features)
    ds = Dataset(schema, paths, batch_size=128, take_batches=1)
    assert len(list(ds)) == 1
    ds2 = Dataset(schema, paths, batch_size=128, drop_remainder=False)
    sizes = [len(b["label"]) for b in ds2]
    assert sizes == [128, 128, 44]


def test_prefetch_propagates_and_matches(demo_conf_path, tmp_path):
    conf = Configuration(demo_conf_path)
    paths = generate_records(conf, str(tmp_path / "r"), num_rows=256, num_files=1)
    schema = compile_schema(conf.features)
    ds = Dataset(schema, paths, batch_size=64, shuffle=False)
    direct = list(ds)
    fetched = list(prefetch(iter(ds), size=2))
    assert len(direct) == len(fetched)
    np.testing.assert_array_equal(direct[0]["label"], fetched[0]["label"])

    def boom():
        yield direct[0]
        raise RuntimeError("decode failed")
    with pytest.raises(RuntimeError, match="decode failed"):
        list(prefetch(boom()))


def test_split_files_and_resolve(tmp_path):
    files = [str(tmp_path / f"f{i}.rfb") for i in range(10)]
    for f in files:
        open(f, "w").close()
    train, valid = split_files(files, 0.2, seed=1)
    assert len(valid) == 2 and len(train) == 8 and not set(train) & set(valid)
    got = resolve_paths(str(tmp_path / "*.rfb"))
    assert got == sorted(files)


# ------------------------------------------------------------------- native
def test_native_hash_matches_python_fallback(demo_conf_path, tmp_path, monkeypatch):
    """Native fused hashing path must produce identical batches to the
    pure-numpy fallback."""
    from recommendflow_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    conf = Configuration(demo_conf_path)
    paths = generate_records(conf, str(tmp_path / "r"), num_rows=300, num_files=1)
    schema = compile_schema(conf.features)
    ds = Dataset(schema, paths, batch_size=128, shuffle=False)
    with_native = [dict(b) for b in ds]
    monkeypatch.setattr(native, "available", lambda: False)
    without = [dict(b) for b in ds]
    assert len(with_native) == len(without)
    for b1, b2 in zip(with_native, without):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)


def test_scalar_numpy_native_hash_identity():
    from recommendflow_tpu import native
    from recommendflow_tpu.data.hashing import _hash_matrix, _to_byte_matrix, hash64
    vals = ["", "a", "-1", "hello world", "日本語", "x" * 257]
    mat, lens = _to_byte_matrix(vals)
    scalar = np.array([hash64(v, 42) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(_hash_matrix(mat, lens, 42), scalar)
    if native.available():
        np.testing.assert_array_equal(native.hash_matrix(mat, lens, 42), scalar)


def test_bert_encode_deal_end_to_end(tmp_path):
    """bert_encode deal: raw text in records -> host tokenization -> token +
    segment id batches consumable by SiameseEncoder."""
    import yaml
    import jax
    import jax.numpy as jnp
    from recommendflow_tpu.data.recordio import RecordWriter, ColumnSpec
    from recommendflow_tpu.encoder.tokenizer import build_demo_vocab
    from recommendflow_tpu.models.base import build_network

    vocab = build_demo_vocab(["hello", "world", "deep", "rank"])
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(sorted(vocab, key=vocab.get)) + "\n")

    text = f"""
Features:
  feature_group: {{}}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    query_text,str,user,bert_encode,$bert_vocab,-1,cls,true
    title_text,str,ad,bert_encode,$bert_vocab,-1,cls,true
    label,float,label,numeric,null,-1,null,true
Variables:
  vocabs:
    bert_vocab: {vpath}
  seeds: 1
  max_len_map: {{query_text: 10, title_text: 10}}
Networks:
  class: recommendflow_tpu.models.matching.siamese_encoder.SiameseEncoder
  loss: recommendflow_tpu.losses.match.batch_neg_sample_scaled_multi_class_ce_loss
  embedding_dim: 16
  text_vocab_size: {len(vocab)}
  text_dim: 16
  text_layers: 1
"""
    conf = Configuration(conf=yaml.safe_load(text))
    schema = compile_schema(conf.features)
    assert schema.slots["query_text"].kind == "bert"

    path = str(tmp_path / "t.rfb")
    cols = [ColumnSpec("query_text", "str"), ColumnSpec("title_text", "str"),
            ColumnSpec("label", "float")]
    with RecordWriter(path, cols) as w:
        for i in range(8):
            w.write_row({"query_text": ["hello world"],
                         "title_text": ["deep rank hello"], "label": [float(i % 2)]})
    b = next(iter(Dataset(schema, [path], batch_size=8)))
    assert b["query_text"].shape == (8, 10)
    assert b["query_text:seg"].shape == (8, 10)
    assert b["query_text"].dtype == np.int32
    # CLS at position 0 for every row
    from recommendflow_tpu.data.schema import get_tokenizer
    tok = get_tokenizer(str(vpath))
    assert (b["query_text"][:, 0] == tok.cls_id).all()

    # SiameseEncoder trains on it
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    v = model.init(jax.random.PRNGKey(0), jb, training=False)
    loss, aux = model.apply(v, jb, training=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss))
    out = model.apply(v, jb, training=False)
    assert out["user"].shape == (8, 16)


def test_iter_from_respects_take_batches(demo_conf_path, tmp_path):
    """iter_from(skip) must stop at the same absolute position as the
    un-skipped stream: a resume inside a take_batches-bounded epoch yields
    exactly the remaining batches (regression: it used to emit take_batches
    more, overrunning the epoch by `skip`)."""
    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.pipeline import Dataset
    from recommendflow_tpu.data.schema import compile_schema
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    paths = generate_records(conf, str(tmp_path / "r"), num_rows=800,
                             num_files=1, seed=2)
    ds = Dataset(schema, paths, batch_size=64, shuffle=False, take_batches=6)
    full = list(ds)
    assert len(full) == 6
    resumed = list(ds.iter_from(2))
    assert len(resumed) == 4
    for a, b in zip(full[2:], resumed):
        np.testing.assert_array_equal(a["label"], b["label"])
    assert list(ds.iter_from(6)) == []


def test_prefetch_abandonment_releases_worker():
    """Breaking out of a prefetch()ed loop (the preemption path) must let
    the worker thread exit instead of blocking forever on a full queue
    (regression test for a review finding)."""
    import threading
    import time as _time

    from recommendflow_tpu.data.pipeline import prefetch

    n_before = threading.active_count()
    for _ in range(3):
        it = prefetch(iter(range(100)), size=2)
        assert next(it) == 0
        it.close()                      # abandon mid-stream
    deadline = _time.time() + 5.0
    while threading.active_count() > n_before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= n_before, "prefetch workers leaked"


def test_prefetch_propagates_errors():
    from recommendflow_tpu.data.pipeline import prefetch

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch(boom())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="decode failed"):
        list(it)


# ------------------------------------------------------------- review fixes
def test_parse_cell_missing_sentinel_for_id_deals():
    """'-1' is the missing sentinel for id-like deals of every dtype
    (DEFAULT_MAP), but a real value for numeric columns — a numeric-typed
    discrete feature's missing cells must NOT train a real bucket
    (regression test for a review finding)."""
    from recommendflow_tpu.config.proto import FeatureDeal
    from recommendflow_tpu.data.writer import parse_cell

    assert parse_cell("-1", "float", FeatureDeal.Discrete) == []
    assert parse_cell("-1", "int", FeatureDeal.Lookup) == []
    assert parse_cell("-1", "str", FeatureDeal.Hashing) == []
    assert parse_cell("3,-1,5", "int", FeatureDeal.Lookup) == [3, 5]
    # numeric keeps -1 as a value (it is a legitimate measurement)
    assert parse_cell("-1", "float", FeatureDeal.Numeric) == [-1.0]


def test_convert_rows_rejects_header_mismatch(demo_conf_path, tmp_path):
    """A misnamed CSV column must fail loudly, not write an all-empty
    dataset (regression test for a review finding)."""
    import pytest as _pytest

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.writer import convert_rows

    conf = Configuration(demo_conf_path)
    rows = [{"totally_wrong_column": "1"}]
    with _pytest.raises(KeyError, match="lack feature column"):
        convert_rows(conf, rows, str(tmp_path / "bad.rfb"))


def test_build_records_same_basename_no_clobber(demo_conf_path, tmp_path):
    """Sources in different directories with the same basename must map to
    distinct output files (regression test for a review finding)."""
    import csv as csvlib

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.writer import build_records, columns_for

    conf = Configuration(demo_conf_path)
    names = [s.name for s in columns_for(conf)]
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        with open(d / "events.csv", "w", newline="") as f:
            w = csvlib.DictWriter(f, fieldnames=names)
            w.writeheader()
            w.writerow({n: "1" for n in names})
    outs = build_records(demo_conf_path, str(tmp_path / "*" / "events.csv"),
                         str(tmp_path / "out"), num_procs=1)
    assert len(outs) == len(set(outs)) == 2


def test_record_writer_flushes_on_blob_byte_budget(tmp_path, monkeypatch):
    """str/bytes blobs are int32-offset-limited per block; the writer must
    flush on byte budget, not only on row count (regression test for a
    review finding)."""
    from recommendflow_tpu.data import recordio
    from recommendflow_tpu.data.recordio import ColumnSpec, RecordWriter

    monkeypatch.setattr(RecordWriter, "MAX_BLOCK_BLOB_BYTES", 1024)
    path = str(tmp_path / "big.rfb")
    payload = b"x" * 600
    with RecordWriter(path, [ColumnSpec("img", "bytes")],
                      block_rows=1000) as w:
        for _ in range(10):
            w.write_row({"img": [payload]})
    # 600B rows against a 1KiB budget -> blocks of 2 rows, never 1000
    sizes = list(recordio.iter_block_nrows(path))
    assert max(sizes) <= 2 and sum(sizes) == 10
    got = [bytes(v) for _, cols in recordio.iter_blocks(path)
           for v in cols["img"][0]]
    assert got == [payload] * 10


def test_normalize_seeds_empty_list_falls_back():
    from recommendflow_tpu.data.hashing import normalize_seeds
    assert normalize_seeds([], 2) == normalize_seeds(0, 2) == [0, 7]
    assert normalize_seeds([5], 2) == [5, 12]


def test_parse_cell_fixes():
    """Review-fix pins: bert text keeps commas; embedding flattens the
    reference's nested separators; 64-bit ids survive exactly; the
    float-rendered '-1.0' sentinel is missing, not a real bucket."""
    from recommendflow_tpu.config.proto import FeatureDeal
    from recommendflow_tpu.data.writer import parse_cell
    assert parse_cell("great price, fast shipping", "str",
                      FeatureDeal.BertEncode) == \
        ["great price, fast shipping"]
    assert parse_cell("0.1;0.2|0.3,0.4", "float", FeatureDeal.Embedding) == \
        [0.1, 0.2, 0.3, 0.4]
    big = 597305344234567891  # > 2^53: int(float()) corrupts it
    assert parse_cell(str(big), "int", FeatureDeal.Lookup) == [big]
    assert parse_cell("-1.0", "float", FeatureDeal.Discrete) == []
    assert parse_cell("3,-1.0,5", "float", FeatureDeal.Discrete) == [3.0, 5.0]
    # but -1.0 stays a REAL value for numeric columns
    assert parse_cell("-1.0", "float", FeatureDeal.Numeric) == [-1.0]


def test_output_names_collision_free():
    from recommendflow_tpu.data.writer import output_names
    names = output_names(["a/x.csv", "b/x.csv", "c/x-1.csv"])
    assert len(set(names)) == 3 and names[0] == "x"


def test_writer_exception_removes_partial_file(tmp_path):
    """A crash mid-conversion must not leave a valid-looking partial .rfb
    (it would pass the CSV cache's mtime freshness check forever)."""
    from recommendflow_tpu.data.recordio import ColumnSpec, RecordWriter
    path = str(tmp_path / "partial.rfb")
    with pytest.raises(RuntimeError):
        with RecordWriter(path, [ColumnSpec("a", "int")]) as w:
            w.write_row({"a": [1]})
            raise RuntimeError("mid-conversion crash")
    assert not os.path.exists(path)


def test_truncated_block_header_raises(tmp_path):
    from recommendflow_tpu.data.recordio import (ColumnSpec, RecordWriter,
                                                 count_rows)
    path = str(tmp_path / "trunc.rfb")
    with RecordWriter(path, [ColumnSpec("a", "int")]) as w:
        w.write_rows([{"a": [i]} for i in range(5)])
    with open(path, "ab") as f:
        f.write(b"\x01\x02\x03")  # torn trailing header bytes
    with pytest.raises(ValueError, match="truncated"):
        count_rows(path)


def test_write_columns_validates(tmp_path):
    from recommendflow_tpu.data.recordio import ColumnSpec, RecordWriter
    path = str(tmp_path / "cols.rfb")
    w = RecordWriter(path, [ColumnSpec("a", "int"), ColumnSpec("b", "int")])
    with pytest.raises(ValueError, match="unequal"):
        w.write_columns({"a": [[1], [2]], "b": [[3]]})
    with pytest.raises(ValueError, match="empty"):
        w.write_columns({})


def test_schema_compile_time_validation():
    """Review-fix pins: unsorted discrete boundaries, non-positive
    embedding_dim, and int-typed file vocabs fail/cast at COMPILE time
    instead of silently corrupting training."""
    import yaml
    from recommendflow_tpu.data.schema import compile_schema

    def conf_for(feature_line, vocabs=None):
        text = f"""
Features:
  feature_group: {{}}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features: |
    {feature_line}
    label,float,label,numeric,null,-1,null,true
Variables:
  seeds: 1
"""
        d = yaml.safe_load(text)
        if vocabs:
            d["Variables"]["vocabs"] = vocabs
        return Configuration(conf=d)

    with pytest.raises(ValueError, match="ascending"):
        compile_schema(conf_for(
            "price_bin,float,ad,discrete,$bins,8,sum,true",
            vocabs={"bins": [0.5, 0.1, 2.0]}).features)
    with pytest.raises(ValueError, match="embedding_dim"):
        compile_schema(conf_for(
            "cat,str,ad,hashing,100,-1,sum,true").features)
    # int-typed vocab given as strings must cast (the file-backed
    # vocab path always yields strings)
    schema = compile_schema(conf_for(
        "iid,int,ad,lookup,$ids,8,sum,true",
        vocabs={"ids": ["10", "20", "30"]}).features)
    from recommendflow_tpu.data.schema import encode_lookup
    ids = encode_lookup(np.asarray([20, 99], np.int64),
                        schema.slots["iid"].vocab)
    assert list(ids) == [2, 0]  # 20 -> second row, unknown -> pad


def test_seed_normalization_accepts_strings():
    from recommendflow_tpu.data.hashing import normalize_seeds
    assert normalize_seeds("2022") == [2022, 2029]
    assert normalize_seeds("2022, 2023") == [2022, 2023]
    assert normalize_seeds(["2022", "2023"]) == [2022, 2023]
    assert normalize_seeds(2022) == [2022, 2029]


def test_hash_array_rejects_non_string():
    from recommendflow_tpu.data.hashing import hash_bucket_array
    with pytest.raises(TypeError, match="str/bytes"):
        hash_bucket_array([5, 7], seed=1, num_bins=100)


def test_float_lookup_round_trips_float32():
    """Record columns decode as float32; float64 vocab keys would never
    match and every value embedded as pad (review-fix pin)."""
    import yaml
    from recommendflow_tpu.data.schema import compile_schema, encode_lookup
    text = """
Features:
  feature_group: {}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features: |
    lvl,float,ad,lookup,$lv,8,sum,true
    label,float,label,numeric,null,-1,null,true
Variables:
  seeds: 1
"""
    d = yaml.safe_load(text)
    d["Variables"]["vocabs"] = {"lv": [1.1, 2.2, 3.5]}
    schema = compile_schema(Configuration(conf=d).features)
    ids = encode_lookup(np.asarray([1.1, 2.2, 9.9], np.float32),
                        schema.slots["lvl"].vocab)
    assert list(ids) == [1, 2, 0]


def test_resolve_paths_dedups_brace_overlap(tmp_path):
    f = tmp_path / "part001.rfb"
    f.write_bytes(b"x")
    files = resolve_paths(str(tmp_path / "part{0,00}*.rfb"))
    assert files == [str(f)]


def test_mixed_labeled_unlabeled_files_fail_loudly(tmp_path):
    """One pattern mixing label-bearing and label-less files must raise
    (a batch slicing both would silently misalign rows)."""
    import yaml
    from recommendflow_tpu.data.pipeline import Dataset
    from recommendflow_tpu.data.recordio import ColumnSpec, RecordWriter
    conf = Configuration(os.path.join(os.path.dirname(__file__), "..",
                                      "conf", "demo_recall.yaml"))
    from recommendflow_tpu.data.synthetic import generate_records
    paths = generate_records(conf, str(tmp_path), num_rows=64, num_files=1,
                             seed=3)
    schema = compile_schema(conf.features)
    # clone the file's schema WITHOUT the label column
    from recommendflow_tpu.data.recordio import iter_blocks, read_schema
    specs = [c for c in read_schema(paths[0]) if c.name != "label"]
    nolabel = str(tmp_path / "nolabel.rfb")
    with RecordWriter(nolabel, specs) as w:
        nrows, block = next(iter_blocks(paths[0]))
        for i in range(nrows):
            w.write_row({c.name: list(
                block[c.name][0][block[c.name][1][i]:block[c.name][1][i + 1]])
                for c in specs})
    ds = Dataset(schema, [paths[0], nolabel], batch_size=16, shuffle=False,
                 drop_remainder=False)
    with pytest.raises(ValueError, match="inconsistent"):
        list(ds)
