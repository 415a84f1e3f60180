"""CLI: export a trained checkpoint to a portable StableHLO serving artifact
(frozen-pb replacement; parity surface: onnx_utils.freeze_keras_model2pb)."""
from __future__ import annotations

import argparse

import numpy as np

from recommendflow_tpu.utils.tables import print_args


def main(argv=None):
    p = argparse.ArgumentParser(description="Export checkpoint to .rfx")
    p.add_argument("conf")
    p.add_argument("--checkpoint", default=None, help="checkpoint root")
    p.add_argument("--out", required=True, help="output .rfx path "
                   "(or SavedModel dir with --format savedmodel)")
    p.add_argument("--batch_size", type=int, default=256,
                   help="fixed serving batch size")
    p.add_argument("--format", default="rfx",
                   choices=["rfx", "savedmodel", "both"],
                   help="rfx = StableHLO (JAX serving); savedmodel = "
                   "jax2tf TF SavedModel (pure-TF serving, onnx_utils "
                   "parity)")
    p.add_argument("--frozen_pb", default=None,
                   help="also write a constant-folded GraphDef .pb "
                   "(with --format savedmodel/both)")
    args = p.parse_args(argv)
    print_args(args)

    from recommendflow_tpu.config import Configuration
    from recommendflow_tpu.data.schema import compile_schema
    from recommendflow_tpu.export import ServingModel, export_model
    from recommendflow_tpu.models.base import build_network
    from recommendflow_tpu.train import Trainer
    from recommendflow_tpu.train.checkpoint import restore_checkpoint
    from recommendflow_tpu.data.synthetic import synthetic_batch

    conf = Configuration(args.conf)
    model, _ = build_network(conf.networks["class"], {"conf": conf})
    schema = compile_schema(conf.features)
    sample = synthetic_batch(schema, args.batch_size)
    trainer = Trainer(model)
    state = trainer.init_state(trainer._put(sample))
    if args.checkpoint:
        state = restore_checkpoint(args.checkpoint, state)
    else:
        print("WARNING: no --checkpoint given — exporting RANDOMLY "
              "INITIALIZED weights into the serving artifact")
    variables = trainer._variables(state)
    # serving requests carry no labels: bake label columns in as zeroed
    # constants (their output echoes are dropped) instead of making them
    # part of the serving input signature
    label_keys = [k for k in getattr(schema, "label_names", [])
                  if k in sample]
    serve_sample = {k: v for k, v in sample.items() if k not in label_keys}
    constants = {k: np.zeros_like(sample[k]) for k in label_keys}
    if args.format in ("rfx", "both"):
        path = export_model(model, variables, serve_sample, args.out,
                            constants=constants)
        print(f"exported to {path}")
        # smoke: reload and run once
        serving = ServingModel.load(path)
        out = serving.predict(serve_sample)
        print("reload check:",
              {k: np.asarray(v).shape for k, v in out.items()})
    if args.format in ("savedmodel", "both"):
        from recommendflow_tpu.export import export_savedmodel, load_savedmodel
        sm_path = (args.out + ".savedmodel" if args.format == "both"
                   else args.out)
        export_savedmodel(model, variables, serve_sample, sm_path,
                          frozen_pb=args.frozen_pb, constants=constants)
        print(f"exported SavedModel to {sm_path}"
              + (f" + frozen pb {args.frozen_pb}" if args.frozen_pb else ""))
        out = load_savedmodel(sm_path)(serve_sample)
        print("TF reload check:",
              {k: np.asarray(v).shape for k, v in out.items()})


if __name__ == "__main__":
    main()
