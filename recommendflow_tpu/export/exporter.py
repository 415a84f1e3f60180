"""Model export for online serving — the frozen-pb/ONNX replacement.

The reference freezes Keras graphs to constant-folded GraphDefs with renamed
x*/y* IO nodes and re-imports them for serving (backend/utils/onnx_utils.py:
8-137). The TPU-native equivalent is StableHLO via jax.export: the predict
function is traced with weights baked in (constants folded), serialized to a
portable artifact, and re-loaded anywhere JAX runs (CPU serving included).

    export_model(model, variables, sample_batch, path)  -> path.rfx
    ServingModel.load(path).predict(batch)              -> outputs dict
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np
from jax import export as jax_export

MAGIC = "RFX1"


def export_model(model, variables, sample_batch: Dict[str, np.ndarray],
                 path: str, training: bool = False,
                 constants: Dict[str, np.ndarray] = None) -> str:
    """Serialize model.apply(variables, batch, training=False) to StableHLO
    with weights folded in. sample_batch fixes shapes/dtypes (static-shape
    serving contract, like the reference's concrete-function freeze).

    `constants`: feature columns baked into the trace instead of being
    serving inputs — the export CLI passes zeroed LABEL columns here so
    real serving requests (which have no labels) don't need to fabricate
    them; any echo of a constant key in the output dict is dropped."""
    constants = {k: np.asarray(v) for k, v in (constants or {}).items()}
    batch_keys = sorted(sample_batch.keys())
    # bake weights as host constants: device/sharding metadata on restored
    # checkpoint arrays would otherwise be serialized and break deserialize
    variables = jax.tree.map(np.asarray, variables)

    overlap = set(batch_keys) & set(constants)
    if overlap:
        raise ValueError(
            f"constants {sorted(overlap)} also appear in sample_batch — "
            "they would become required serving inputs whose values are "
            "silently ignored; remove them from one side")

    def predict(*arrays):
        batch = dict(zip(batch_keys, arrays))
        batch.update(constants)
        out = model.apply(variables, batch, training=training)
        if constants and isinstance(out, dict):
            out = {k: v for k, v in out.items() if k not in constants}
        return out

    arrays = [jax.ShapeDtypeStruct(np.shape(sample_batch[k]),
                                   np.asarray(sample_batch[k]).dtype)
              for k in batch_keys]
    # lower for BOTH platforms: without this the artifact binds to the
    # export-time backend (TPU under the preset JAX_PLATFORMS) and a CPU
    # serving host rejects it with a platform mismatch
    exported = jax_export.export(jax.jit(predict),
                                 platforms=["cpu", "tpu"])(*arrays)
    blob = exported.serialize()

    meta = {
        "magic": MAGIC,
        "batch_keys": batch_keys,
        "shapes": {k: list(np.shape(sample_batch[k])) for k in batch_keys},
        "dtypes": {k: str(np.asarray(sample_batch[k]).dtype) for k in batch_keys},
    }
    if not path.endswith(".rfx"):
        path = path + ".rfx"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"meta": meta, "stablehlo": blob}, f)
    return path


def export_savedmodel(model, variables, sample_batch: Dict[str, np.ndarray],
                      path: str, training: bool = False,
                      frozen_pb: str = None,
                      constants: Dict[str, np.ndarray] = None) -> str:
    """jax2tf -> TF SavedModel: a standard-interchange artifact that
    predicts under PURE TensorFlow with no JAX import at serve time
    (parity: the reference's frozen-GraphDef/ONNX export,
    backend/utils/onnx_utils.py:8-60,102-137).

    Weights are folded in as constants (native serialization wraps the
    StableHLO module in an XlaCallModule op — TF executes it with its own
    bundled compiler). `frozen_pb` additionally writes a constant-folded
    GraphDef .pb (freeze_keras_model2pb parity) re-importable via
    `load_frozen_pb`.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    constants = {k: np.asarray(v) for k, v in (constants or {}).items()}
    batch_keys = sorted(sample_batch.keys())
    variables = jax.tree.map(np.asarray, variables)

    overlap = set(batch_keys) & set(constants)
    if overlap:
        raise ValueError(
            f"constants {sorted(overlap)} also appear in sample_batch — "
            "they would become required serving inputs whose values are "
            "silently ignored; remove them from one side")

    def predict(*arrays):
        batch = dict(zip(batch_keys, arrays))
        batch.update({k: jax.numpy.asarray(v) for k, v in constants.items()})
        out = model.apply(variables, batch, training=training)
        if constants and isinstance(out, dict):
            out = {k: v for k, v in out.items() if k not in constants}
        return out

    # lower for BOTH platforms, like the rfx path: under the preset TPU
    # backend the XlaCallModule would otherwise bind to TPU only and the
    # pure-TF CPU serving hosts this format exists for reject it
    tf_fn = jax2tf.convert(predict, with_gradient=False,
                           native_serialization_platforms=("cpu", "tpu"))
    specs = [tf.TensorSpec(np.shape(sample_batch[k]),
                           np.asarray(sample_batch[k]).dtype, name=k)
             for k in batch_keys]
    module = tf.Module()
    module.predict = tf.function(tf_fn, autograph=False,
                                 input_signature=specs)
    tf.saved_model.save(
        module, path,
        signatures={"serving_default":
                    module.predict.get_concrete_function(*specs)})
    # record the input order: SavedModel signatures are keyword-based, but
    # the frozen-pb path and batch-array callers need the positional order
    with open(os.path.join(path, "rfx_inputs.txt"), "w") as f:
        f.write("\n".join(batch_keys))
    if frozen_pb:
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2)
        concrete = module.predict.get_concrete_function(*specs)
        frozen = convert_variables_to_constants_v2(concrete)
        gd = frozen.graph.as_graph_def()
        os.makedirs(os.path.dirname(os.path.abspath(frozen_pb)) or ".",
                    exist_ok=True)
        with open(frozen_pb, "wb") as f:
            f.write(gd.SerializeToString())
        # sidecar: structured output key -> frozen tensor name. The
        # fallback 'consumer-less Identity' scan in load_frozen_pb cannot
        # name outputs and can pick up dangling Identities left by
        # constant folding; tf.nest flattens dict outputs in sorted-key
        # order, so keys and frozen.outputs align positionally
        struct = concrete.structured_outputs
        names = [t.name for t in frozen.outputs]
        keys = (sorted(struct) if isinstance(struct, dict)
                else [f"out{i}" for i in range(len(names))])
        with open(frozen_pb + ".outputs.txt", "w") as f:
            f.write("\n".join(f"{k}\t{n}" for k, n in zip(keys, names)))
    return path


def load_savedmodel(path: str):
    """Pure-TF reload of export_savedmodel output: returns
    predict(batch_dict) -> {name: np.ndarray} (no JAX involved)."""
    import tensorflow as tf
    loaded = tf.saved_model.load(path)
    with open(os.path.join(path, "rfx_inputs.txt")) as f:
        batch_keys = f.read().splitlines()

    def predict(batch: Dict[str, np.ndarray]):
        arrays = [tf.convert_to_tensor(np.asarray(batch[k]))
                  for k in batch_keys]
        out = loaded.predict(*arrays)
        if isinstance(out, dict):
            return {k: np.asarray(v) for k, v in out.items()}
        # bare-tensor outputs (the rfx path tolerates them too)
        return {"output": np.asarray(out)}

    return predict


def load_frozen_pb(pb_path: str, input_names, output_names=None):
    """Re-import a frozen GraphDef written by export_savedmodel(frozen_pb=)
    (wrap_frozen_graph parity, onnx_utils.py:63-99). Returns
    predict(batch_arrays) -> dict of np.ndarray keyed by the exported
    output names when the `<pb>.outputs.txt` sidecar (written alongside
    the pb) is present, else a list in deterministic op-name order."""
    import tensorflow as tf
    with open(pb_path, "rb") as f:
        gd = tf.compat.v1.GraphDef()
        gd.ParseFromString(f.read())

    def _imports():
        tf.graph_util.import_graph_def(gd, name="")

    wrapped = tf.compat.v1.wrap_function(_imports, [])
    graph = wrapped.graph
    ins = [graph.get_tensor_by_name(n if ":" in n else n + ":0")
           for n in input_names]
    out_keys = None
    if output_names is None:
        sidecar = pb_path + ".outputs.txt"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                pairs = [line.split("\t") for line in
                         f.read().splitlines() if line]
            out_keys = [p[0] for p in pairs]
            output_names = [p[1] for p in pairs]
    if output_names is None:
        # fallback: consumer-less Identity ops, natural-sorted so
        # Identity_2 < Identity_10 (lexicographic order would misorder
        # graphs with >10 outputs; graph-insertion order isn't exposed)
        def _natural(name):
            base, _, suffix = name.rpartition("_")
            if base and suffix.isdigit():
                return (base, int(suffix))
            return (name, -1)

        out_ops = sorted(
            (op for op in graph.get_operations()
             if op.type == "Identity"
             and not any(c for c in op.outputs[0].consumers())),
            key=lambda op: _natural(op.name))
        outs = [op.outputs[0] for op in out_ops]
    else:
        outs = [graph.get_tensor_by_name(n if ":" in n else n + ":0")
                for n in output_names]
    fn = wrapped.prune(ins, outs)

    def predict(batch_arrays):
        import tensorflow as _tf
        tensors = [_tf.convert_to_tensor(np.asarray(a))
                   for a in batch_arrays]
        res = [np.asarray(t) for t in fn(*tensors)]
        return dict(zip(out_keys, res)) if out_keys else res

    return predict


class ServingModel:
    """Re-loaded exported model (wrap_frozen_graph parity,
    onnx_utils.py:63-99): call .predict with a batch dict of the exported
    shapes."""

    def __init__(self, exported, meta: Dict[str, Any]):
        self._exported = exported
        self.meta = meta
        self.batch_keys = meta["batch_keys"]

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        if not path.endswith(".rfx"):
            path = path + ".rfx"
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if payload["meta"].get("magic") != MAGIC:
            raise ValueError(f"{path}: not an RFX export")
        exported = jax_export.deserialize(payload["stablehlo"])
        return cls(exported, payload["meta"])

    def predict(self, batch: Dict[str, np.ndarray]):
        missing = [k for k in self.batch_keys if k not in batch]
        if missing:
            raise KeyError(f"export expects inputs {self.batch_keys}; missing {missing}")
        arrays = []
        for k in self.batch_keys:
            arr = np.asarray(batch[k])
            want = tuple(self.meta["shapes"][k])
            if arr.shape != want:
                raise ValueError(f"input '{k}': shape {arr.shape} != exported {want}")
            arrays.append(arr.astype(self.meta["dtypes"][k]))
        return self._exported.call(*arrays)
