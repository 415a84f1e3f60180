"""Host data-pipeline benchmark: RFB records -> decoded fixed-shape batches.

Measures pure host-side throughput (no device work) of the input path the
trainer consumes: block inflate -> columnar parse -> string hashing -> CSR
-> padded [B, H, L] id batches, with the thread-pool block decoder and the
native C++ kernels (native/recflow_native.cc) against the numpy fallback
(RECFLOW_NO_NATIVE=1).

The device consumes ~93k examples/s end-to-end on one v5e chip (CLAUDE.md);
this prints the host margin over that.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(paths, schema, batch_size, threads):
    from recommendflow_tpu.data.pipeline import Dataset
    ds = Dataset(schema, paths, batch_size=batch_size, shuffle=False,
                 decode_workers=threads)
    n = 0
    t0 = time.perf_counter()
    for batch in ds:
        n += len(next(iter(batch.values())))
    return n / (time.perf_counter() - t0)


def main():
    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.data.synthetic import generate_records

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = Configuration(os.path.join(here, "conf", "bench_recall.yaml"))
    schema = compile_schema(conf.features)
    with tempfile.TemporaryDirectory() as tmp:
        paths = generate_records(conf, tmp, num_rows=200_000, num_files=8,
                                 seed=0)
        for threads in (0, 4):
            eps = run(paths, schema, 1024, threads)
            print(f"threads={threads}: {eps:,.0f} examples/s host decode "
                  f"({eps / 93_200:.1f}x the device's 93.2k ex/s e2e burn)",
                  flush=True)


if __name__ == "__main__":
    main()
