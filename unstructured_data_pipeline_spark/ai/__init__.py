from unstructured_data_pipeline_spark.ai.backends import (
    DocumentAIBackend,
    DeterministicStubBackend,
    SUMMARY_INPUT_CAP,
)

__all__ = ["DocumentAIBackend", "DeterministicStubBackend", "SUMMARY_INPUT_CAP"]
