"""Host data layer: schema, preprocessing, pipelines, synthetic batches."""
