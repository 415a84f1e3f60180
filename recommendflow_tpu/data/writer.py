"""ETL: raw CSV tables -> RFB record files.

Capability parity with the reference's utils/make_tfrecord.py:23-196 — per-deal
cell parsing (multi-value cells split on ',', '-1'/'' missing sentinels,
';'/'|' nested separators for serialized embeddings), per-file multiprocessing
fan-out — targeting the RFB columnar format instead of tf.train.Example.
"""
from __future__ import annotations

import glob
import multiprocessing as mp
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from recommendflow_tpu.config.configuration import Configuration
from recommendflow_tpu.config.proto import FeatureDeal
from recommendflow_tpu.data.recordio import ColumnSpec, RecordWriter

MAX_PROCS = 64


def columns_for(conf: Configuration) -> List[ColumnSpec]:
    """Record columns follow the declared feature type (str stays str —
    hashing happens at read time so bucket size / seeds can change without
    re-running ETL; the reference bakes hashing into the graph instead)."""
    cols = []
    for f in conf.features.train_features:
        if f.deal == FeatureDeal.Image:
            # raw encoded image bytes (reference: bytes_list of the file's
            # contents, make_tfrecord.py:70-79); decoded at read time
            vtype = "bytes"
        else:
            vtype = {"int": "int", "float": "float", "str": "str"}[f.type]
        cols.append(ColumnSpec(f.name, vtype))
    return cols


def parse_cell(raw: Any, vtype: str, deal: FeatureDeal) -> List[Any]:
    """One CSV cell -> list of values (the universal list convention)."""
    if raw is None or (isinstance(raw, float) and np.isnan(raw)):
        return []
    if deal == FeatureDeal.Image:
        # cell = image file path (or already-encoded bytes); store raw bytes
        if isinstance(raw, bytes):
            return [raw]
        path = str(raw).strip()
        if path in ("", "-1"):
            return []
        with open(path, "rb") as f:
            return [f.read()]
    if isinstance(raw, (list, tuple, np.ndarray)):
        return list(raw)
    s = str(raw).strip()
    if s == "" or s == "-1" and vtype == "str":
        return []
    parts = [p for p in s.split(",") if p != ""]
    if vtype == "int":
        return [int(float(p)) for p in parts]
    if vtype == "float":
        return [float(p) for p in parts]
    return parts


def convert_rows(conf: Configuration, rows: Sequence[Dict[str, Any]],
                 out_path: str, block_rows: int = 4096) -> int:
    """Write an iterable of raw row-dicts to one RFB file."""
    specs = columns_for(conf)
    feats = {f.name: f for f in conf.features.train_features}
    with RecordWriter(out_path, specs, block_rows=block_rows) as w:
        for row in rows:
            rec = {}
            for spec in specs:
                f = feats[spec.name]
                rec[spec.name] = parse_cell(row.get(spec.name), f.type, f.deal)
            w.write_row(rec)
        return w.rows_written


def _convert_csv_file(args):
    conf_path, src, out_path = args
    import csv as csvlib
    conf = Configuration(conf_path)
    with open(src, newline="") as f:
        reader = csvlib.DictReader(f)
        n = convert_rows(conf, reader, out_path)
    return src, out_path, n


def build_records(conf_path: str, src_pattern: str, out_dir: str,
                  num_procs: Optional[int] = None) -> List[str]:
    """Convert every CSV matching src_pattern into out_dir/*.rfb in parallel
    (process fan-out parity: make_tfrecord.py:176-195)."""
    srcs = sorted(glob.glob(src_pattern))
    if not srcs:
        raise FileNotFoundError(f"no source files match {src_pattern}")
    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    for src in srcs:
        base = os.path.splitext(os.path.basename(src))[0]
        jobs.append((conf_path, src, os.path.join(out_dir, base + ".rfb")))
    procs = min(num_procs or mp.cpu_count(), MAX_PROCS, len(jobs))
    if procs <= 1:
        results = [_convert_csv_file(j) for j in jobs]
    else:
        with mp.Pool(procs) as pool:
            results = pool.map(_convert_csv_file, jobs)
    return [out for _, out, _ in results]
