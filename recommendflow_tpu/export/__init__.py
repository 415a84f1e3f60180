from recommendflow_tpu.export.exporter import ServingModel, export_model
