"""DML operators: upsert / anti-insert / delete (SURVEY.md section 2.8).

The reference uses Snowflake ``MERGE INTO`` for three upsert targets
(`app/Auto-Magic Document AI.py:185-195,548-554,920-926`), ``INSERT ... WHERE
NOT EXISTS`` for seeding (`app.py:481-489`), and ``DELETE ... WHERE pk``
(`app.py:197-199`).  Without taking a Delta Lake dependency, MERGE over
parquet is a join-based rewrite:

    upsert(target, source, keys) =
        source  UNION  (target ANTI-JOIN source ON keys)

i.e. source rows win on key collision — exactly MERGE's
WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT for whole-row updates, and
idempotent (upsert(upsert(t,s),s) == upsert(t,s)).

Scale notes: the anti-join is a shuffle on the key — unavoidable for a
key-matched merge — but the small side (a batch of new uploads / prompt
edits) broadcasts, so at 100 TB the target is never shuffled: plan is
BroadcastHashJoin(LeftAnti) over a straight scan.  ``ParquetTable`` gives
the durable form with atomic-enough overwrite for single-writer pipelines
(concurrent writers are out of scope — the reference has no concurrency
control either).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _key_cond(keys: list[str]):
    def cond(t: DataFrame, s: DataFrame) -> Column:
        c = None
        for k in keys:
            e = t[k].eqNullSafe(s[k])
            c = e if c is None else (c & e)
        return c

    return cond


def upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: rows from ``source`` replace key-matched rows in
    ``target``; unmatched target rows survive.  Column order follows target."""
    cols = target.columns
    src = source.select(*cols)
    kept = target.join(F.broadcast(src.select(*keys).distinct()), on=keys, how="left_anti")
    return kept.unionByName(src)


def anti_insert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """INSERT ... WHERE NOT EXISTS (D2): append only source rows whose key is
    absent from target (`app.py:488`; `setup_database.sql:142`)."""
    fresh = source.join(target.select(*keys).distinct(), on=keys, how="left_anti")
    return target.unionByName(fresh.select(*target.columns))


def delete_where(target: DataFrame, predicate: Column) -> DataFrame:
    """DELETE ... WHERE pred (D3) as filter-retain."""
    return target.filter(~F.coalesce(predicate, F.lit(False)))


class ParquetTable:
    """A durable table over a parquet directory with CREATE IF NOT EXISTS,
    append, upsert, delete — the engine's stand-in for the reference's five
    Snowflake tables (`app.py:38-81`).

    Writes go via a swap directory so readers never see partial output
    (single-writer assumption, same as the reference).
    """

    def __init__(self, spark: SparkSession, root: str, name: str, schema: T.StructType):
        self.spark = spark
        self.name = name
        self.schema = schema
        self.path = os.path.join(root, name)

    # -- CREATE TABLE IF NOT EXISTS (`app.py:38-81`) ------------------------
    def ensure(self) -> "ParquetTable":
        if not os.path.exists(os.path.join(self.path, "_SUCCESS")):
            empty = self.spark.createDataFrame([], self.schema)
            empty.write.mode("overwrite").parquet(self.path)
        return self

    def read(self) -> DataFrame:
        self.ensure()
        return self.spark.read.schema(self.schema).parquet(self.path)

    def append(self, df: DataFrame) -> None:
        df.select(*[f.name for f in self.schema.fields]).write.mode("append").parquet(
            self.path
        )

    def _replace(self, df: DataFrame) -> None:
        tmp = self.path + "__stage"
        df.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.path)
        # clean the stage dir
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    def upsert(self, source: DataFrame, keys: list[str]) -> None:
        self._replace(upsert(self.read(), source, keys))

    def anti_insert(self, source: DataFrame, keys: list[str]) -> None:
        fresh = source.join(
            self.read().select(*keys).distinct(), on=keys, how="left_anti"
        )
        self.append(fresh)

    def delete_where(self, predicate: Column) -> None:
        self._replace(delete_where(self.read(), predicate))

    def compact(self, target_files: int | None = None) -> int:
        """Rewrite the table into ``target_files`` files (default: sized by
        ``spark.sql.files.maxPartitionBytes``).  Streaming/append-heavy
        pipelines accumulate small files — the classic small-files problem
        that degrades every later scan (one task + one footer read per
        file); periodic compaction is the steady-state fix.  Returns the
        file count after compaction."""
        import glob

        df = self.read()
        if target_files is None:
            raw = self.spark.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            )
            max_bytes = int(raw) if raw.isdigit() else 128 * 1024 * 1024
            size = sum(
                os.path.getsize(p)
                for p in glob.glob(os.path.join(self.path, "*.parquet"))
            )
            target_files = max(1, size // max_bytes + 1)
        self._replace(df.coalesce(int(target_files)))
        return len(glob.glob(os.path.join(self.path, "*.parquet")))
