"""RecommendFlow-TPU: a TPU-native recommender-system training framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
mechsihao/RecommendFlow (reference layout documented in /root/repo/SURVEY.md):
YAML-driven feature configuration, record-based feature ETL, fused embedding
engines on sharded HBM tables, a matching -> preranking -> ranking -> reranking
model cascade, in-batch-negative sampled-softmax retrieval training, on-device
exact top-k retrieval evaluation, and multi-chip data/model parallelism via
jax.sharding meshes.

The compute path is jax/pjit/Pallas; everything is static-shape and
jit-compatible. Strings never reach the device: hashing and vocab lookup are
resolved host-side in the input pipeline (XLA has no string dtype).
"""

import os as _os

# Honor JAX_PLATFORMS even on runtimes whose platform plugins override it
# (observed: a preinstalled TPU plugin wins over the env var unless the
# platform is forced through jax.config before first backend use). Without
# this, `JAX_PLATFORMS=cpu python -m recommendflow_tpu.cli.*` silently runs
# on the accelerator.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 — never block import on platform quirks
        pass

from recommendflow_tpu.version import __version__

__all__ = ["__version__"]
