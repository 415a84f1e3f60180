"""Robustness: corrupt/truncated record files, hostile configs, edge-case
batches — failure modes must be loud and named, never silent corruption."""
import struct
import zlib

import numpy as np
import pytest
import yaml

from recommendflow_tpu.config import Configuration
from recommendflow_tpu.data import ColumnSpec, Dataset, RecordWriter, compile_schema, iter_blocks
from recommendflow_tpu.data.recordio import BLOCK_MAGIC, MAGIC


def _write_sample(path):
    with RecordWriter(str(path), [ColumnSpec("a", "int"), ColumnSpec("b", "str")]) as w:
        for i in range(10):
            w.write_row({"a": [i], "b": [f"s{i}"]})
    return str(path)


def test_truncated_block_is_detected(tmp_path):
    path = _write_sample(tmp_path / "t.rfb")
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-7])  # chop mid-block
    with pytest.raises(Exception):  # zlib error or size mismatch
        list(iter_blocks(path))


def test_corrupt_block_magic(tmp_path):
    path = _write_sample(tmp_path / "t.rfb")
    data = bytearray(open(path, "rb").read())
    # find the block header (after file magic + schema) and corrupt its magic
    schema_len = struct.unpack("<I", data[4:8])[0]
    off = 4 + 4 + schema_len
    struct.pack_into("<I", data, off, 0xDEADBEEF)
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="corrupt block header"):
        list(iter_blocks(path))


def test_corrupt_payload_size(tmp_path):
    path = _write_sample(tmp_path / "t.rfb")
    data = bytearray(open(path, "rb").read())
    schema_len = struct.unpack("<I", data[4:8])[0]
    off = 4 + 4 + schema_len
    magic, nrows, comp, raw = struct.unpack_from("<IIII", data, off)
    struct.pack_into("<IIII", data, off, magic, nrows, comp, raw + 5)
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="size mismatch"):
        list(iter_blocks(path))


def test_record_missing_config_column(tmp_path, demo_conf_path):
    """A record file lacking a feature the config requires fails loudly."""
    path = str(tmp_path / "partial.rfb")
    with RecordWriter(path, [ColumnSpec("user_id", "str")]) as w:
        w.write_row({"user_id": ["u1"]})
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    with pytest.raises(KeyError, match="missing column"):
        list(Dataset(schema, [path], batch_size=1, drop_remainder=False))


@pytest.mark.parametrize("bad_row", [
    "a,str,user",                                   # too few fields
    "a,str,user,hashing,100,8,sum,true,EXTRA",      # too many fields
    "a,complex,user,hashing,100,8,sum,true",        # bad type
    "a,str,marstower,hashing,100,8,sum,true",       # bad tower
    "a,str,user,hashing,100,8,zigzag,true",         # bad pooling
    "a,str,user,hashing,-5,8,sum,true",             # negative bucket
    "a,float,user,discrete,null,8,sum,true",        # discrete without vocab
])
def test_hostile_feature_rows(bad_row):
    text = f"""
Features:
  feature_group: {{}}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    {bad_row}
Variables:
  seeds: 1
"""
    with pytest.raises((ValueError, KeyError)):
        Configuration(conf=yaml.safe_load(text))


def test_recursive_dollar_does_not_hang():
    """Mutually-referencing $vars must error or resolve, not loop forever."""
    text = """
Features:
  feature_group: {}
  feature_fields: [group, type, tower, deal, vocab, embedding_dim, pooling, working]
  features:
    a,float,user,numeric,null,-1,null,true
Task:
  x: $y
  y: $x
"""
    # review fix: a clear parse-time error naming the cycle replaced the
    # former bare RecursionError
    with pytest.raises(ValueError, match="cyclic"):
        Configuration(conf=yaml.safe_load(text))


def test_empty_batch_features_all_padded(demo_conf_path, tmp_path):
    """Rows with every feature missing still produce valid (all-pad) batches."""
    conf = Configuration(demo_conf_path)
    schema = compile_schema(conf.features)
    from recommendflow_tpu.data.writer import columns_for
    path = str(tmp_path / "empty.rfb")
    with RecordWriter(path, columns_for(conf)) as w:
        for _ in range(4):
            w.write_row({})
    b = next(iter(Dataset(schema, [path], batch_size=4, drop_remainder=False)))
    for name in schema.order:
        slot = schema.slots[name]
        if slot.kind == "sparse":
            assert (b[name] == 0).all(), name
    # model forward survives all-pad input
    import jax
    import jax.numpy as jnp
    from recommendflow_tpu.models.base import build_network
    model, _ = build_network("dssm", {"conf": conf, "tower_units": [16]})
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    v = model.init(jax.random.PRNGKey(0), jb, training=False)
    out = model.apply(v, jb, training=False)
    assert np.isfinite(np.asarray(out["user"])).all()
