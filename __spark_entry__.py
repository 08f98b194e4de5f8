"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in ``unstructured_data_pipeline_spark``; the
query registry (one entry per operator from SURVEY.md section 2 plus the
training-data-pipeline extensions) is
``unstructured_data_pipeline_spark/queries/`` (a package since round 10;
registry + freshness rotation live in its ``__init__.py``).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from unstructured_data_pipeline_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full stub document pipeline (classify -> extract -> EAV)
    rolled up by the History "current documents" analytics query, at sf0.001."""
    return Q.history_documents_current(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
