"""CLI: batch embedding inference / scoring.

Parity surface: example/recall_search/predict.py:49-85 — restore a
checkpoint, run model predict over record files, dump embeddings (npz) for
downstream ANN indexing or promotion checks.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from recommendflow_tpu.utils.tables import print_args


def main(argv=None):
    from recommendflow_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # warm-process compiles -> seconds
    p = argparse.ArgumentParser(description="Batch predict embeddings/scores")
    p.add_argument("conf", help="yaml config path")
    p.add_argument("--data", required=True, help="record pattern")
    p.add_argument("--checkpoint", default=None, help="checkpoint root (latest step)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--dayno", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    print_args(args)

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.pipeline import make_dataset
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from recommendflow_tpu.train.checkpoint import restore_checkpoint

    conf = Configuration(args.conf)
    batch_size = args.batch_size or int(conf.get_conf_value_or("batch_size", 2048))
    # drop_remainder=False + single-device jit, like evaluate.py: a dropped
    # tail would silently omit up to batch_size-1 embeddings from the npz
    # (or ALL rows for sets < batch_size); the short tail batch need not
    # divide a dp mesh
    ds, _ = make_dataset(conf, args.data, batch_size, dayno=args.dayno,
                         shuffle=False, valid_ratio=0.0, seed=args.seed,
                         drop_remainder=False)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    trainer = Trainer(model)
    state = trainer.init_state(trainer._put(next(iter(ds))))
    if args.checkpoint:
        state = restore_checkpoint(args.checkpoint, state)
    else:
        print("WARNING: no --checkpoint given — predicting with RANDOMLY "
              "INITIALIZED weights (the npz will hold garbage embeddings)")
    outputs = trainer.predict(state, ds)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    # np.savez appends .npz when absent — report the REAL path written
    out = args.out if args.out.endswith(".npz") else args.out + ".npz"
    np.savez_compressed(out, **outputs)
    print(f"wrote {out}: " + ", ".join(f"{k}{v.shape}" for k, v in outputs.items()))


if __name__ == "__main__":
    main()
