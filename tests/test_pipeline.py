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
