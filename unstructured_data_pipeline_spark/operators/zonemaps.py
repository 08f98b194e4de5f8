"""Zone-map (min/max statistics) file-skipping index over plain parquet.

The data-skipping pattern every lakehouse table format leads with
(Delta `stats`, Iceberg manifest `lower_bounds`/`upper_bounds`, Snowflake
micro-partition pruning — the reference platform prunes micro-partitions
the same way, `app/Auto-Magic Document AI.py` relies on it implicitly for
every WHERE): keep per-FILE min/max of the clustering columns, answer a
range predicate by first intersecting it with the file bounds, and scan
only the files whose zone overlaps.  On 100 TB the index is O(files)
metadata (kilobytes per thousand files), the pruning decision is
metadata-only on the driver, and the scan cost becomes proportional to the
SELECTED data, not the table size — provided the layout clusters the
column (see `queries.zorder_layout_report` for the layout half of the
story; this module is the *skipping* half).

Build cost: ONE scan of the table computing per-file aggregates (grouped
on `input_file_name()` — an embarrassingly parallel map-side combine).  A
production deployment would persist the index next to the table and
maintain it incrementally on append (each new file contributes its own
row independently); `collect_zone_maps` returns it as a DataFrame so it
can be written wherever the catalog lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_zone_maps(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max/count for ``cols`` over the parquet files under
    ``path``: one scan, map-side partial aggregation, O(files) output."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )


def prune_files(zone_maps: DataFrame, col: str, lo, hi) -> tuple[list[str], int]:
    """Metadata-only pruning: files whose [min,max] zone intersects
    [lo, hi].  Returns (selected file paths, total file count).  The zone
    map is O(files) — collecting it to the driver is the same size class
    as the file listing Spark's own scan planning already holds."""
    rows = zone_maps.select("_file", f"min_{col}", f"max_{col}").collect()
    # NULL bounds mean the file's column is entirely NULL (min/max of an
    # all-NULL column): no row there can satisfy a range predicate, so the
    # file is SKIPPED rather than crashing the comparison (ADVICE r6).
    keep = [
        r["_file"]
        for r in rows
        if r[f"max_{col}"] is not None
        and r[f"min_{col}"] is not None
        and r[f"max_{col}"] >= lo
        and r[f"min_{col}"] <= hi
    ]
    return keep, len(rows)


def pruned_read(
    spark: SparkSession, zone_maps: DataFrame, col: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """Read only the files whose zone overlaps [lo, hi]; the residual
    filter still applies (zones are necessary, not sufficient).  Returns
    (dataframe, files_read, files_total)."""
    keep, total = prune_files(zone_maps, col, lo, hi)
    if total == 0:
        # zero files in the index: spark.read.parquet() with no paths would
        # raise, so degrade to an empty frame typed from the zone-map's own
        # min_/max_ stat columns — the only schema knowledge the index holds
        # (indexed columns only, documented degradation; ADVICE r6).
        fields = [
            (f.name[len("min_"):], f.dataType)
            for f in zone_maps.schema.fields
            if f.name.startswith("min_")
        ]
        from pyspark.sql import types as T

        return (
            spark.createDataFrame([], T.StructType(
                [T.StructField(n, t) for n, t in fields]
            )),
            0,
            0,
        )
    if not keep:
        # empty selection: preserve schema by reading all then filtering false
        df = spark.read.parquet(*[r["_file"] for r in zone_maps.select("_file").collect()])
        return df.filter(F.lit(False)), 0, total
    df = spark.read.parquet(*keep).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return df, len(keep), total
