"""Round-10: C6 metadata/result caching contract (VERDICT r9 #3).

The reference memoizes re-read results with ``@st.cache_data`` and clears
the cache after writes (`app/Auto-Magic Document AI.py:89-199`); the
Spark-native form is ``run_document_pipeline(cache_intermediate=True)``
persisting the shared classify+extract stage for the multi-sink writers,
which unpersist it after the fan-out.  Measured A/B: tools/persist_ab.py.
"""

from __future__ import annotations

from unstructured_data_pipeline_spark.catalog import bootstrap_warehouse
from unstructured_data_pipeline_spark.pipelines.batch import (
    persist_pipeline_outputs,
    persist_pipeline_outputs_idempotent,
    run_document_pipeline,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "@s/d1.txt", "customer invoice total 42"),
            ("d2", "@s/d2.txt", "stream receipt for coffee"),
            ("d3", "@s/d3.txt", "plain agreement text here"),
        ],
        "file_ref string, file_url string, text string",
    )


def _det(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_cache_intermediate_identical_outputs(spark):
    """cache on/off must be invisible in every deterministic output column."""
    cols_p = ["file_ref", "file_url", "class_name", "extraction_result"]
    cols_e = ["file_ref", "file_url", "class_name", "field_name", "field_value"]
    off = run_document_pipeline(_docs(spark), with_ocr=True)
    on = run_document_pipeline(_docs(spark), with_ocr=True, cache_intermediate=True)
    try:
        assert off.cached is None and on.cached is not None
        assert on.cached.storageLevel.useMemory  # actually persisted
        assert _det(on.processed, cols_p) == _det(off.processed, cols_p)
        assert _det(on.extracted_fields, cols_e) == _det(off.extracted_fields, cols_e)
        assert _det(on.ocr, ["file_ref", "ocr", "summary"]) == _det(
            off.ocr, ["file_ref", "ocr", "summary"]
        )
    finally:
        if on.cached is not None:
            on.cached.unpersist()


def test_writers_unpersist_cached_stage(spark, tmp_path):
    """Both multi-sink writers must release the C6 handle (the reference's
    explicit `.clear()` after writes), including on the idempotent path."""
    for writer, sub in (
        (persist_pipeline_outputs, "plain"),
        (persist_pipeline_outputs_idempotent, "idem"),
    ):
        tables = bootstrap_warehouse(spark, str(tmp_path / sub))
        out = run_document_pipeline(
            _docs(spark), with_ocr=True, cache_intermediate=True
        )
        assert out.cached.storageLevel.useMemory
        writer(out, tables)
        assert not out.cached.storageLevel.useMemory  # unpersisted after fan-out
        assert tables["documents_processed"].read().count() == 3
        assert tables["documents_extracted_fields"].read().count() == 9
