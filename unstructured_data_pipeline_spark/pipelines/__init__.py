from unstructured_data_pipeline_spark.pipelines.batch import (
    run_document_pipeline,
    persist_pipeline_outputs,
)

__all__ = ["run_document_pipeline", "persist_pipeline_outputs"]
