"""Interactive-pipeline parity (SURVEY §3 entry point 1): OCR+summary
branch, AI7 error envelopes (failures persist, never throw), and the AI4
summarization contract."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.ai.backends import (
    SUMMARY_INPUT_CAP,
    DeterministicStubBackend,
)
from unstructured_data_pipeline_spark.pipelines.batch import run_document_pipeline


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "@s/d1.txt", "customer invoice total 42"),
            ("d2", "@s/d2.txt", "stream receipt for coffee"),
            ("d3", "@s/d3.txt", "plain agreement text here"),
        ],
        "file_ref string, file_url string, text string",
    )


def test_interactive_pipeline_with_ocr(spark):
    out = run_document_pipeline(_docs(spark), with_ocr=True)

    processed = {r["file_ref"]: r for r in out.processed.collect()}
    assert set(processed) == {"d1", "d2", "d3"}
    assert processed["d1"]["class_name"] == "invoice"
    assert processed["d2"]["class_name"] == "receipt"
    assert processed["d3"]["class_name"] == "contract"
    # extraction envelope: {"response": {...}} with the 3 stub fields
    resp = json.loads(processed["d1"]["extraction_result"])["response"]
    assert resp["first_word"] == "customer" and resp["n_words"] == "4"

    # EAV: 3 fields per document
    eav = out.extracted_fields
    assert eav.groupBy("file_ref").count().collect()[0]["count"] == 3

    # OCR branch: layout envelope round-trips the text; summary is the head
    ocr = {r["file_ref"]: r for r in out.ocr.collect()}
    payload = json.loads(ocr["d1"]["ocr"])
    assert payload == {"content": "customer invoice total 42", "mode": "layout"}
    assert ocr["d2"]["summary"].startswith("stream receipt")


def test_summarize_contract():
    b = DeterministicStubBackend()
    assert SUMMARY_INPUT_CAP == 6000  # `app.py:218` truncation contract
    long = " ".join(f"w{i}" for i in range(5000))
    s = b.summarize(long)
    assert s.endswith(" ...") and s.split(" ")[0] == "w0"
    assert b.summarize("short text") == "short text"


class _FailingBackend(DeterministicStubBackend):
    def extract(self, text, prompts_json):
        raise RuntimeError("backend unavailable")


def test_error_envelope_persists_not_throws(spark):
    out = run_document_pipeline(_docs(spark), backend=_FailingBackend(), with_ocr=False)
    rows = out.processed.collect()  # must NOT raise (app.py:506-510)
    assert len(rows) == 3
    for r in rows:
        env = json.loads(r["extraction_result"])
        assert "error" in env and "backend unavailable" in env["error"]
    # no response -> nothing to explode into the EAV table
    assert out.extracted_fields.count() == 0


class _FailingClassifier(DeterministicStubBackend):
    def classify(self, text):
        raise RuntimeError("classifier down")


def test_classify_failure_enveloped(spark):
    out = run_document_pipeline(
        _docs(spark), backend=_FailingClassifier(), with_ocr=False
    )
    rows = out.processed.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["class_name"] == ""
        assert "classifier down" in json.loads(r["extraction_result"])["error"]


def test_binary_source_to_pipeline_end_to_end(spark, tmp_path):
    """Entry point 1 from raw blobs: binaryFile scan -> OCR UDF (text
    recovery) -> classify -> extract -> EAV, matching the reference's
    upload -> stage -> TO_FILE flow (SURVEY §2.1 S3/S5)."""
    from unstructured_data_pipeline_spark.ai.udfs import make_udfs
    from unstructured_data_pipeline_spark.sources.binary_docs import (
        directory_listing,
        read_binary_documents,
    )

    land = tmp_path / "stage"
    land.mkdir()
    (land / "a.pdf").write_bytes(b"customer invoice total 42")
    (land / "b.png").write_bytes(b"stream receipt for coffee")
    (land / "ignored.txt").write_bytes(b"not a supported format")

    # the format glob prunes unsupported files at the SOURCE
    listing = directory_listing(spark, str(land))
    assert sorted(r["relative_path"] for r in listing.collect()) == ["a.pdf", "b.png"]

    blobs = read_binary_documents(spark, str(land))
    udfs = make_udfs()
    docs = blobs.select(
        F.element_at(F.split("path", "/"), -1).alias("file_ref"),
        F.col("path").alias("file_url"),
        F.get_json_object(udfs["ocr"](F.col("content")), "$.content").alias("text"),
    )
    out = run_document_pipeline(docs, with_ocr=False)
    got = {r["file_ref"]: r["class_name"] for r in out.processed.collect()}
    assert got == {"a.pdf": "invoice", "b.png": "receipt"}


def test_prompts_override_upserts_generated(spark):
    """run_document_pipeline(prompts=...) must let caller schemas win over
    auto-generated ones (the reference's CLASS_PROMPTS upsert path)."""
    custom = spark.createDataFrame(
        [("invoice", '{"last_word":"What is the last word?"}')],
        "class_name string, prompts string",
    )
    out = run_document_pipeline(_docs(spark), prompts=custom, with_ocr=False)
    fields = {
        (r["file_ref"], r["field_name"]) for r in out.extracted_fields.collect()
    }
    # invoice docs extract the OVERRIDDEN single field...
    assert ("d1", "last_word") in fields
    assert ("d1", "first_word") not in fields
    # ...while other classes keep the generated 3-field schema
    assert ("d2", "first_word") in fields and ("d3", "n_words") in fields


def test_history_filters_and_sql_views(spark, sf_dir):
    """HistoryFilters predicate composition + register_fixture_views SQL
    surface (S4): the same count through both paths."""
    from unstructured_data_pipeline_spark.operators.history import (
        HistoryFilters,
        class_summary,
    )
    from unstructured_data_pipeline_spark.sources.tables import (
        register_fixture_views,
    )

    eav = spark.createDataFrame(
        [
            ("f1", "@s/f1", "invoice", "a", "1"),
            ("f1", "@s/f1", "invoice", "b", "2"),
            ("f2", "@s/f2", "receipt", "a", "3"),
            ("g3", "@s/g3", "invoice", "a", "4"),
        ],
        "file_ref string, file_url string, class_name string, field_name string, field_value string",
    )
    # class IN-list + file LIKE compose with AND
    got = class_summary(
        eav, HistoryFilters(classes=["invoice"], file_contains="f")
    ).collect()
    assert [(r["class_name"], r["docs"]) for r in got] == [("invoice", 1)]
    # empty filters = identity
    assert class_summary(eav).count() == 2

    register_fixture_views(spark, sf_dir)
    n_sql = spark.sql("SELECT COUNT(*) AS n FROM customer").collect()[0]["n"]
    import os

    n_df = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    assert n_sql == n_df


def test_observed_metrics_single_pass(spark):
    """`observe()`: pipeline health metrics (docs processed, error
    envelopes, distinct classes) accumulate DURING the one pipeline pass —
    no second scan over 100 TB to count failures."""
    from pyspark.sql import Observation

    out = run_document_pipeline(_docs(spark), with_ocr=False)
    obs = Observation("pipeline_metrics")
    observed = out.processed.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("extraction_result").contains('"error"'), 1).otherwise(0)
        ).alias("n_errors"),
        # DISTINCT aggregates are rejected in observed metrics (they would
        # force an extra shuffle); the sketch version is the right tool
        F.approx_count_distinct("class_name").alias("n_classes"),
    )
    n = observed.count()  # the single pass
    m = obs.get
    assert m["n_docs"] == n == 3
    assert m["n_errors"] == 0
    assert m["n_classes"] >= 1
