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

from recommendflow_tpu.version import __version__

__all__ = ["__version__"]
