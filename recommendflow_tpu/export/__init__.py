from recommendflow_tpu.export.exporter import (
    ServingModel, export_model, export_savedmodel, load_frozen_pb,
    load_savedmodel,
)
