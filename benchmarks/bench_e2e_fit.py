"""End-to-end fit throughput: records on disk -> pipeline -> Trainer.fit.

The full production path at bench scale (conf/bench_recall.yaml, 386M-param
two-tower, batch 1024): RFB block decode + hashing on host threads,
prefetch, jitted train steps with device-side metric accumulation (no
per-step host sync — CLAUDE.md: a per-step float() caps the tunnel at
8.4k ex/s). Reports steady-state epoch examples/s; deep pipelining lets
this EXCEED the isolated-step bench (~72k) because host decode of batch
i+1 overlaps device compute of batch i.
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.pipeline import Dataset
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.data.synthetic import generate_records
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    conf = Configuration(os.path.join(
        here, "conf", "bench_recall.yaml" if on_tpu else "demo_recall.yaml"))
    schema = compile_schema(conf.features)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    rows = 300_000 if on_tpu else 4_000
    with tempfile.TemporaryDirectory() as tmp:
        paths = generate_records(conf, tmp, num_rows=rows, num_files=8,
                                 seed=0)
        ds = Dataset(schema, paths, batch_size=1024 if on_tpu else 256,
                     shuffle=True, seed=0, decode_workers=2)
        trainer = Trainer(model, learning_rate=1e-3)
        result = trainer.fit(ds, epochs=3)
        for i, epoch in enumerate(result["history"]):
            print(f"epoch {i}: {epoch['examples_per_sec']:,.0f} examples/s "
                  f"(loss {epoch['loss']:.4f})", flush=True)


if __name__ == "__main__":
    main()
