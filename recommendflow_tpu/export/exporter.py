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
                 path: str, training: bool = False) -> str:
    """Serialize model.apply(variables, batch, training=False) to StableHLO
    with weights folded in. sample_batch fixes shapes/dtypes (static-shape
    serving contract, like the reference's concrete-function freeze)."""
    batch_keys = sorted(sample_batch.keys())
    # bake weights as host constants: device/sharding metadata on restored
    # checkpoint arrays would otherwise be serialized and break deserialize
    variables = jax.tree.map(np.asarray, variables)

    def predict(*arrays):
        batch = dict(zip(batch_keys, arrays))
        return model.apply(variables, batch, training=training)

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
