"""Unit tests for the round-8 operators: the EXECUTED GDPR erasure
lifecycle (real deletes on scratch warehouse tables) and DOULION
edge-sampled triangle counting.  Registry-level oracle parity is covered
by test_oracle_parity; these pin what the hash gate can't see — above
all that the orphan audits are FALSIFIABLE (VERDICT r7 #2 flagged the r7
probe as zero-by-construction): a skipped delete and a planted dangling
FK must each produce a NONZERO orphan count."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators.dml import ParquetTable
from unstructured_data_pipeline_spark.queries import (
    _events,
    _t,
    gdpr_erasure_cascade,
    gdpr_erasure_lifecycle,
    triangle_count_sampled,
)


def test_gdpr_lifecycle_disk_state_matches_cascade_plan(spark, sf_dir):
    """The executed lifecycle must land exactly the row counts the
    planning query predicts — same cohort, same FK walk, one computed
    from anti-join plans, the other from parquet files on disk."""
    plan = {r["table_name"]: r for r in gdpr_erasure_cascade(spark, sf_dir).collect()}
    disk = {r["table_name"]: r for r in gdpr_erasure_lifecycle(spark, sf_dir).collect()}
    assert set(plan) == set(disk) == {"customer", "orders", "lineitem", "events"}
    for t in plan:
        for col in ["n_before", "n_erased", "n_after", "n_orphans_after"]:
            assert plan[t][col] == disk[t][col], (t, col)
        assert disk[t]["n_orphans_after"] == 0, t


def test_gdpr_lifecycle_orphan_audit_catches_a_skipped_delete(spark, sf_dir):
    """Run the same cascade on scratch tables but SKIP the lineitem
    delete: the on-disk orphan probe (lineitem anti-join surviving
    orders) must flag every line item of an erased order — proving the
    audit can actually fail, which the r7 planning probe could not."""
    root = tempfile.mkdtemp(prefix="udp_gdpr_test_")
    try:
        orders_src = _t(spark, sf_dir, "orders")
        li_src = _t(spark, sf_dir, "lineitem")
        to = ParquetTable(spark, root, "orders", orders_src.schema)
        to.append(orders_src)
        tl = ParquetTable(spark, root, "lineitem", li_src.schema)
        tl.append(li_src)

        n_li_of_erased = (
            tl.read()
            .join(
                to.read().filter(F.col("o_custkey") % 97 == 0).select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_semi",
            )
            .count()
        )
        assert n_li_of_erased > 0, "fixture must give the cascade something to erase"

        to.delete_where(F.col("o_custkey") % 97 == 0)  # parent erased...
        # ...and the lineitem delete is "forgotten"
        orphan_li = (
            tl.read()
            .join(
                to.read().select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            )
            .count()
        )
        assert orphan_li == n_li_of_erased
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_gdpr_lifecycle_orphan_audit_catches_wrong_delete_order(spark, sf_dir):
    """The lifecycle docstring claims reordering the lineitem delete
    AFTER the orders delete flips the audit: the MOR frontier is then
    computed from the already-erased orders table, comes back empty, and
    every line item of an erased order survives as an orphan.  Prove it."""
    root = tempfile.mkdtemp(prefix="udp_gdpr_order_")
    try:
        orders_src = _t(spark, sf_dir, "orders")
        li_src = _t(spark, sf_dir, "lineitem")
        to = ParquetTable(spark, root, "orders", orders_src.schema)
        to.append(orders_src)
        tl = ParquetTable(spark, root, "lineitem", li_src.schema)
        tl.append(li_src)

        n_li_of_erased = (
            tl.read()
            .join(
                to.read().filter(F.col("o_custkey") % 97 == 0).select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_semi",
            )
            .count()
        )
        assert n_li_of_erased > 0

        # WRONG order: parent first, THEN compute the frontier from disk
        to.delete_where(F.col("o_custkey") % 97 == 0)
        frontier = (
            to.read()
            .filter(F.col("o_custkey") % 97 == 0)
            .select(F.col("o_orderkey").alias("l_orderkey"))
        )
        assert frontier.count() == 0  # the erased parents are gone
        tl.delete_keys_mor(frontier, ["l_orderkey"])  # tombstones nothing

        orphan_li = (
            tl.read()
            .join(
                to.read().select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            )
            .count()
        )
        assert orphan_li == n_li_of_erased  # the audit catches the reorder
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_gdpr_cascade_orphans_catch_a_planted_dangling_fk(spark, tmp_path):
    """The de-circularized planning probe anti-joins surviving children
    against SURVIVING parents, so a dangling FK in the source data — an
    order whose customer does not exist — must surface as a nonzero
    orphan count (the r7 probe reported 0 unconditionally)."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (97, "erased")], "c_custkey long, c_name string"
    ).write.parquet(os.path.join(d, "customer.parquet"))
    # order 20's customer 999 does not exist -> orphan after erasure
    spark.createDataFrame(
        [(10, 1), (11, 97), (20, 999)], "o_orderkey long, o_custkey long"
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [(10, 5), (11, 6)], "l_orderkey long, l_partkey long"
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts")).write.parquet(
        os.path.join(d, "events.parquet")
    )
    rows = {r["table_name"]: r for r in gdpr_erasure_cascade(spark, d).collect()}
    assert rows["orders"]["n_orphans_after"] == 1  # order 20 -> customer 999
    assert rows["lineitem"]["n_orphans_after"] == 0
    assert rows["customer"]["n_erased"] == 1  # custkey 97


def test_triangle_sampled_estimator_shape_and_determinism(spark, sf_dir):
    """p = 1/2 sampling: the estimate is exactly 8x the sampled count,
    the sampled edge set is a md5-deterministic subset (two runs agree
    bit-for-bit), and the fixture graph is dense enough that the sample
    actually contains triangles."""
    r1 = triangle_count_sampled(spark, sf_dir).collect()[0]
    r2 = triangle_count_sampled(spark, sf_dir).collect()[0]
    assert r1 == r2
    assert r1["est_triangles"] == 8 * r1["n_triangles_sampled"]
    assert 0 < r1["n_edges_sampled"] < r1["n_edges_total"]
    assert r1["n_triangles_sampled"] > 0
    # ~half the edges should survive a fair per-edge coin (loose 3-sigma)
    import math

    n, k = r1["n_edges_total"], r1["n_edges_sampled"]
    assert abs(k - n / 2) < 3 * math.sqrt(n / 4) + 1


def test_events_ts_contract_in_scratch_fixture(spark, tmp_path):
    """_events must normalize a plain-timestamp events.parquet (as written
    by the dangling-FK test) to BIGINT micros — pin it so the scratch
    fixture pattern stays valid if the nanos handling shifts again."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(7, "2024-01-02 03:04:05")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts")).write.parquet(
        os.path.join(d, "events.parquet")
    )
    row = _events(spark, d).collect()[0]
    assert isinstance(row["ts"], int)
    assert row["ts"] == 1704164645000000
