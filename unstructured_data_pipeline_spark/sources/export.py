"""Export sinks (SURVEY §2.1 S7): the reference offers CSV and JSON-records
downloads of query results (`app/Auto-Magic Document AI.py:574-579,765-790,
936-941,967-971`).

Two shapes:

* driver-side bytes (the reference's download-button contract) — for small
  result sets only; guarded by ``max_rows`` so nobody collects a 100 TB
  table onto the driver by accident.
* distributed directory writes — the scale path (one file per partition,
  any size).
"""

from __future__ import annotations

import io
import json

from pyspark.sql import DataFrame


class ResultTooLargeError(RuntimeError):
    pass


def _bounded(df: DataFrame, max_rows: int):
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ResultTooLargeError(
            f"result exceeds max_rows={max_rows}; use export_csv_dir/"
            "export_json_dir for distributed export"
        )
    return rows


def to_csv_bytes(df: DataFrame, max_rows: int = 100_000) -> bytes:
    """Small-result CSV download (`app.py:574-579` semantics)."""
    import csv

    rows = _bounded(df, max_rows)
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(df.columns)
    for r in rows:
        w.writerow([r[c] for c in df.columns])
    return buf.getvalue().encode("utf-8")


def to_json_records(df: DataFrame, max_rows: int = 100_000) -> bytes:
    """Small-result JSON-records download (`app.py:765-790` semantics)."""
    rows = _bounded(df, max_rows)
    return json.dumps([r.asDict(recursive=True) for r in rows], default=str).encode(
        "utf-8"
    )


def export_csv_dir(df: DataFrame, path: str) -> None:
    """Distributed CSV export — the 100 TB shape."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def export_json_dir(df: DataFrame, path: str) -> None:
    """Distributed JSON-lines export — the 100 TB shape."""
    df.write.mode("overwrite").json(path)


def export_orc_dir(df: DataFrame, path: str) -> None:
    """Distributed ORC export — the columnar interchange shape for
    warehouses that ingest ORC rather than parquet (Hive/Trino lineage).
    Unlike the text sinks above, ORC round-trips types natively
    (timestamps, doubles, nested arrays), carries per-stripe min/max
    indexes (the zone-map idea baked into the format), and Spark's ORC
    reader pushes filters down to stripe level — so an ORC export is a
    first-class queryable table, not just a download."""
    df.write.mode("overwrite").orc(path)
