"""Local replica of the driver's DuckDB-oracle gate: run a registry query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb

from unstructured_data_pipeline_spark.schemas import FIXTURE_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    """Canonicalize a cell for comparison.

    Driver parity (VERDICT r5 #2): the driver hashes canonical STRING
    renderings of each cell, so an integer-typed Spark column vs a
    float-typed oracle column (e.g. DuckDB HUGEINT rendered as float64 by
    fetchdf) must NOT compare equal here even though Python says
    ``26000000000000 == 2.6e13``.  Floats are therefore rendered as their
    repr string (after a 9-dp round that absorbs benign cross-engine
    double noise) — ``'26000000000000.0'`` never equals the int
    ``26000000000000``, so a kind mismatch fails locally exactly like it
    fails at the driver."""
    if v is None:
        return None
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return v


def normalize(df_pandas):
    """Sorted column order, row-order-insensitive canonical list of tuples."""
    cols = sorted(df_pandas.columns)
    rows = []
    for _, r in df_pandas[cols].iterrows():
        rows.append(tuple(_norm_cell(v) for v in r))
    return cols, sorted(rows, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, oracle_pdf) -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    problems = []
    spdf = spark_df.toPandas()
    scols, srows = normalize(spdf)
    ocols, orows = normalize(oracle_pdf)
    if scols != ocols:
        problems.append(f"columns differ: spark={scols} oracle={ocols}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    n_bad = 0
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a} oracle={b}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
