from recommendflow_tpu.models.reranking.escm2 import Escm2, ESCM2
