"""17-23: document pipeline + history analytics (AI1-AI7, W1, P1-P6, C5)

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, HistoryFilters, _CLASSIFY_SQL, _DOCS_BASE_SQL, _EAV_SQL, _docs_pipeline_eav, _heavy, _t, class_summary, documents_latest, field_flatten, make_udfs

# ---------------------------------------------------------------------------
# 17-23: the document pipeline + history analytics (AI1-AI7, W1, P1-P6, C5)


def pipeline_extract_eav(spark, sf_dir):
    """AI1+AI2+EAV explode: the whole stub pipeline, oracle-checked."""
    return _docs_pipeline_eav(spark, sf_dir)


PIPELINE_EAV_SQL = (
    _EAV_SQL
    + "SELECT file_ref, file_url, class_name, field_name, field_value FROM eav "
    "ORDER BY file_ref, field_name"
)


def pipeline_classify_summary(spark, sf_dir):
    """AI1 rollup: docs + distinct languages per predicted class."""
    docs = _heavy(spark, sf_dir, "documents")
    udfs = make_udfs()
    c = docs.withColumn("class_name", udfs["classify"](F.col("text")))
    return (
        c.groupBy("class_name")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.countDistinct("lang").alias("n_langs"))
        .orderBy(F.desc("n_docs"), "class_name")
    )


CLASSIFY_SUMMARY_SQL = f"""
SELECT {_CLASSIFY_SQL} AS class_name, COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY 1 ORDER BY n_docs DESC, class_name
"""


def pipeline_extract_wide(spark, sf_dir):
    """C5 round-trip: EAV -> dynamic pivot back to wide."""
    from unstructured_data_pipeline_spark.operators.pivot import dynamic_pivot

    eav = _docs_pipeline_eav(spark, sf_dir)
    wide = dynamic_pivot(
        eav,
        ["file_ref", "class_name"],
        values=["first_word", "n_words", "fingerprint"],
    )
    return wide


PIPELINE_WIDE_SQL = f"""
WITH base AS ({_DOCS_BASE_SQL})
SELECT file_ref, class_name,
       string_split(text, ' ')[1] AS first_word,
       CAST(len(string_split(text, ' ')) AS VARCHAR) AS n_words,
       md5(text) AS fingerprint
FROM base ORDER BY file_ref
"""


def summarize_documents(spark, sf_dir):
    """AI4: summarization with the 6000-char input cap contract."""
    docs = _heavy(spark, sf_dir, "documents")
    udfs = make_udfs()
    return docs.select(
        "doc_id", udfs["summarize"](F.col("text")).alias("summary")
    )


SUMMARIZE_SQL = """
SELECT doc_id,
       CASE WHEN len(string_split(text, ' ')) > 12
            THEN array_to_string(string_split(text, ' ')[1:12], ' ') || ' ...'
            ELSE text END AS summary
FROM documents ORDER BY doc_id
"""


def history_class_summary(spark, sf_dir):
    """History entry point 3.1 (`app.py:678-693`) over the pipeline EAV."""
    eav = _docs_pipeline_eav(spark, sf_dir)
    return class_summary(eav)


HISTORY_CLASS_SUMMARY_SQL = (
    _EAV_SQL
    + """
SELECT class_name, COUNT(DISTINCT file_ref) AS docs
FROM eav GROUP BY class_name ORDER BY docs DESC, class_name
"""
)


def history_documents_current(spark, sf_dir):
    """History entry point 3.2 (`app.py:698-741`): latest state per doc with
    field counts, derived stage, and the EXISTS-style has_ocr flag."""
    eav = _docs_pipeline_eav(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    ocr = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("string").alias("file_ref")
    )
    out = documents_latest(eav, processed=None, ocr=ocr)
    return out.select(
        "file_ref", "class_name", "stage", "fields_extracted", "has_ocr"
    )


HISTORY_DOCS_SQL = (
    _EAV_SQL
    + """
, ocr AS (SELECT CAST(doc_id AS VARCHAR) AS file_ref FROM documents WHERE doc_id % 2 = 0)
SELECT e.file_ref,
       e.class_name,
       'docs_stage' AS stage,
       COUNT(*) AS fields_extracted,
       MAX(CASE WHEN o.file_ref IS NOT NULL THEN 1 ELSE 0 END) = 1 AS has_ocr
FROM eav e LEFT JOIN ocr o ON o.file_ref = e.file_ref
GROUP BY e.file_ref, e.class_name
ORDER BY e.file_ref
"""
)


def history_field_flatten_filtered(spark, sf_dir):
    """History entry point 3.3 + the dynamic predicate builder (P1-P4)."""
    eav = _docs_pipeline_eav(spark, sf_dir)
    filters = HistoryFilters(classes=["invoice"], file_contains="1")
    return field_flatten(eav, filters)


FIELD_FLATTEN_SQL = (
    _EAV_SQL
    + """
SELECT file_ref, class_name, field_name, field_value AS field_value_json
FROM eav
WHERE class_name IN ('invoice') AND lower(file_ref) LIKE '%1%'
ORDER BY file_ref, class_name, field_name
"""
)


