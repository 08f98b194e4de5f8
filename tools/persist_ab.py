"""C6 (metadata/result caching) measured A/B — VERDICT r9 #3.

The reference memoizes re-read results between Streamlit reruns with
``@st.cache_data(ttl=30/60)`` (`app/Auto-Magic Document AI.py:89-199`); the
Spark-native form is persisting a multi-consumer intermediate.  The concrete
surface: ``persist_pipeline_outputs*`` drives THREE write actions off the one
classify+extract pandas-UDF stage, so without C6 the AI stage re-runs once
per sink.  ``run_document_pipeline(cache_intermediate=True)`` persists that
stage (MEMORY_AND_DISK) and the writer unpersists it after the fan-out.

This probe runs the SAME multi-sink write twice at an SF dir (default
sf0.1), cache off then on, asserts the landed tables are value-identical
(timestamp audit columns excluded — they are wall-clock by contract), and
prints one JSON line with both walls.  Usage:

    python tools/persist_ab.py [sf_dir] [n_reps] [call_cost_ms]

``call_cost_ms`` (default 0) adds a per-AI-call sleep to the stub backend,
modeling a real inference cost: the stub is microseconds per call, so with
it the duplicated stage hides behind parquet-write overhead; the reference's
real calls are ~30 000 ms/doc (BASELINE.md), so even 1 ms/call understates
production by 4 orders of magnitude.  The cost model changes no output
values (results are asserted identical across all four variants).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from unstructured_data_pipeline_spark.catalog import bootstrap_warehouse  # noqa: E402
from unstructured_data_pipeline_spark.pipelines.batch import (  # noqa: E402
    persist_pipeline_outputs,
    run_document_pipeline,
)
from unstructured_data_pipeline_spark.queries import _heavy  # noqa: E402
from unstructured_data_pipeline_spark.session import get_spark  # noqa: E402

# deterministic output columns per landed table (audit timestamps excluded)
_DET_COLS = {
    "documents_processed": ["file_ref", "file_url", "class_name", "extraction_result"],
    "documents_extracted_fields": [
        "file_ref",
        "file_url",
        "class_name",
        "field_name",
        "field_value",
    ],
    "document_ocr": ["file_name", "file_ref", "ocr", "summary"],
}


class _CostModelBackend:
    """DeterministicStubBackend + a fixed per-call sleep: same outputs, a
    realistic (still hugely conservative) inference cost."""

    def __init__(self, call_cost_ms: float):
        from unstructured_data_pipeline_spark.ai.backends import (
            DeterministicStubBackend,
        )

        self._inner = DeterministicStubBackend()
        self._cost = call_cost_ms / 1000.0

    def _sleep(self):
        if self._cost:
            time.sleep(self._cost)

    def classify(self, text):
        self._sleep()
        return self._inner.classify(text)

    def extract(self, text, prompts_json):
        self._sleep()
        return self._inner.extract(text, prompts_json)

    def summarize(self, text):
        self._sleep()
        return self._inner.summarize(text)

    def ocr(self, content):
        self._sleep()
        return self._inner.ocr(content)

    def generate_prompts(self, class_name):
        return self._inner.generate_prompts(class_name)


def _run_once(
    spark, docs, root: str, cache: bool, call_cost_ms: float
) -> tuple[float, dict[str, str]]:
    tables = bootstrap_warehouse(spark, root)
    backend = _CostModelBackend(call_cost_ms) if call_cost_ms else None
    t0 = time.perf_counter()
    out = run_document_pipeline(
        docs, backend=backend, with_ocr=True, cache_intermediate=cache
    )
    persist_pipeline_outputs(out, tables)
    wall = time.perf_counter() - t0
    hashes = {}
    for name, cols in _DET_COLS.items():
        df = tables[name].read().select(*cols)
        h = df.select(
            F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in cols]))
            .alias("h")
        ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"))
        row = h.collect()[0]
        hashes[name] = f"{df.count()}:{row['s']}"
    return wall, hashes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    call_cost_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    spark = get_spark("persist-ab")
    docs = _heavy(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("file_ref"),
        F.concat(
            F.lit("@docs_stage/"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("file_url"),
        "text",
    )
    walls: dict[str, list[float]] = {"nocache": [], "cache": []}
    hashes: dict[str, dict[str, str]] = {}
    for rep in range(n_reps):
        for mode, cache in (("nocache", False), ("cache", True)):
            root = tempfile.mkdtemp(prefix=f"udp_c6_{mode}_")
            try:
                wall, h = _run_once(spark, docs, root, cache, call_cost_ms)
            finally:
                shutil.rmtree(root, ignore_errors=True)
            walls[mode].append(round(wall, 3))
            if rep == 0:
                hashes[mode] = h
            print(f"# rep{rep} {mode}: {wall:.3f}s", file=sys.stderr, flush=True)
    identical = hashes["nocache"] == hashes["cache"]
    med = {m: sorted(v)[len(v) // 2] for m, v in walls.items()}
    print(
        json.dumps(
            {
                "probe": "C6 persist A/B (multi-sink document pipeline)",
                "sf_dir": sf_dir,
                "call_cost_ms": call_cost_ms,
                "identical_results": identical,
                "nocache_sec": med["nocache"],
                "cache_sec": med["cache"],
                "speedup": round(med["nocache"] / med["cache"], 3),
                "runs": walls,
                "table_hashes": hashes["cache"],
            }
        )
    )
    spark.stop()
    if not identical:
        print(f"## MISMATCH: {hashes}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
