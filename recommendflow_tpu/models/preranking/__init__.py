from recommendflow_tpu.models.preranking.cold import Cold, COLD
