"""The local correctness gate: every registry query must match its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from unstructured_data_pipeline_spark.queries import DEMOS, REGISTRY
from tests.oracle_harness import compare, run_oracle

ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None]
# Rows-only demos live outside REGISTRY since r4 (their hash-checked
# *_contract siblings carry the driver evidence); they stay executable here.
ROWS_ONLY_CASES = [(n, fn) for n, (fn, sql) in REGISTRY.items() if sql is None] + list(
    DEMOS.items()
)


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, sf_dir, name, fn, sql):
    sdf = fn(spark, sf_dir)
    odf = run_oracle(sql, sf_dir)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES, ids=[c[0] for c in ROWS_ONLY_CASES])
def test_rows_only(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
