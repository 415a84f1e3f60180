from recommendflow_tpu.models.base import Batch, FeatureEmbedder, RecModel, build_network
