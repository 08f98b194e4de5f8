"""Canary for the events.ts ingestion contract (VERDICT r2 #6).

events.parquet stores NANOSECOND timestamps; how Spark surfaces them has
already shifted once between environment builds (Spark 4.1 ignores
``spark.sql.legacy.parquet.nanosAsLong`` and reads TIMESTAMP_NTZ, older
builds honored the conf and produced BIGINT nanos).  ``queries._events``
must absorb either form and always hand the engine BIGINT epoch-MICROS
equal to DuckDB ``epoch_us(ts)``.  If the parquet reader's behavior moves
again, THIS test names the problem instead of 13 downstream query errors.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from unstructured_data_pipeline_spark.queries import _events

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_events_ts_is_bigint_micros(spark, sf):
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        pytest.skip(f"{sf} not generated")
    ev = _events(spark, sf)
    assert isinstance(ev.schema["ts"].dataType, LongType), (
        f"_events must normalize ts to BIGINT, got {ev.schema['ts'].dataType}"
    )
    got = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).first()
    want = duckdb.sql(
        "SELECT MIN(epoch_us(ts)) lo, MAX(epoch_us(ts)) hi, COUNT(*) n "
        f"FROM read_parquet('{os.path.join(sf, 'events.parquet')}')"
    ).fetchone()
    assert (got["lo"], got["hi"], got["n"]) == want, (
        "ts must be epoch MICROS matching DuckDB epoch_us — a 1000x offset "
        "here means the nanos/micros normalization regressed"
    )


def test_events_session_timezone_is_utc(spark):
    # the NTZ -> timestamp -> unix_micros path is only wall-clock-exact
    # under a UTC session timezone (session.py pins it); guard that too
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
