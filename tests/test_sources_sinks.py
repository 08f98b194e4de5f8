"""Source/sink parity (SURVEY §2.1): export sinks S7 round-trip through
both the driver-side bytes shape and the distributed directory shape, and
the engine reads the same relation from parquet/CSV/JSON sources
identically."""

from __future__ import annotations

import csv
import io
import json
import os

import pytest
from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.sources.export import (
    ResultTooLargeError,
    export_csv_dir,
    export_json_dir,
    to_csv_bytes,
    to_json_records,
)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))


def test_csv_bytes_roundtrip(nation):
    data = to_csv_bytes(nation).decode("utf-8")
    rows = list(csv.reader(io.StringIO(data)))
    assert rows[0] == ["n_nationkey", "n_name", "n_regionkey"]
    assert len(rows) - 1 == nation.count()


def test_json_records_roundtrip(nation):
    recs = json.loads(to_json_records(nation))
    assert len(recs) == nation.count()
    assert set(recs[0]) == {"n_nationkey", "n_name", "n_regionkey"}


def test_driver_side_export_is_bounded(nation):
    with pytest.raises(ResultTooLargeError):
        to_csv_bytes(nation, max_rows=3)


def test_distributed_export_roundtrip(spark, nation, tmp_path):
    export_csv_dir(nation, str(tmp_path / "csv"))
    export_json_dir(nation, str(tmp_path / "json"))
    back_csv = (
        spark.read.option("header", "true")
        .schema(nation.schema)
        .csv(str(tmp_path / "csv"))
    )
    back_json = spark.read.schema(nation.schema).json(str(tmp_path / "json"))
    want = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, back_csv.collect())) == want
    assert sorted(map(tuple, back_json.collect())) == want


def test_multi_format_source_same_relation(spark, sf_dir, tmp_path):
    """The same aggregation over parquet/CSV/JSON copies of a table must
    agree — format is an I/O concern, not a semantics concern."""
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    cust.write.option("header", "true").mode("overwrite").csv(str(tmp_path / "c_csv"))
    cust.write.mode("overwrite").json(str(tmp_path / "c_json"))
    cust.write.mode("overwrite").orc(str(tmp_path / "c_orc"))

    def agg(df):
        return sorted(
            map(
                tuple,
                df.groupBy("c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.floor(F.col("c_acctbal") * 100 + 0.5)).alias("cents"),
                )
                .collect(),
            )
        )

    want = agg(cust)
    got_csv = agg(
        spark.read.option("header", "true").schema(cust.schema).csv(str(tmp_path / "c_csv"))
    )
    got_json = agg(spark.read.schema(cust.schema).json(str(tmp_path / "c_json")))
    got_orc = agg(spark.read.orc(str(tmp_path / "c_orc")))
    assert got_csv == want and got_json == want and got_orc == want
