"""The sf-scaling fixture generator (tools/make_sf1.py) underwrites the
SCALE.md sf1/sf10 probes — these tests pin the invariants an honest scale
probe needs: exact Nx row growth, replica-disjoint keys with referential
integrity preserved, and CONTENT DECORRELATION across replicas (round 7's
first sf10 build shipped near-identical twins and the dedup operators
correctly flagged the fixture, SCALE.md)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_build_scales_rows_keys_and_decorrelates(spark, sf_dir, tmp_path):
    from make_sf1 import STRIDE, build

    out = str(tmp_path / "sf2x")
    build(spark, sf_dir, out, replicas=2)

    rd = lambda t: spark.read.parquet(os.path.join(out, f"{t}.parquet"))  # noqa: E731
    src = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731

    # exact 2x fact rows; fixed dims copied through
    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        assert rd(t).count() == 2 * src(t).count(), t
    assert rd("nation").count() == src("nation").count()

    # replica key spaces are disjoint and referential integrity holds
    # inside the shifted replica
    orders = rd("orders")
    assert orders.filter(
        (F.col("o_orderkey") >= STRIDE) != (F.col("o_custkey") >= STRIDE)
    ).count() == 0
    cust_keys = rd("customer").select(F.col("c_custkey").alias("k"))
    assert orders.join(cust_keys, orders["o_custkey"] == cust_keys["k"], "left_anti").count() == 0
    li = rd("lineitem").select("l_orderkey")
    assert li.join(orders.select("o_orderkey"), li["l_orderkey"] == orders["o_orderkey"], "left_anti").count() == 0

    # content decorrelation: replica-1 text differs from replica-0 beyond
    # the tag token (vowel/consonant rotation applied), n_chars maintained
    docs = rd("documents")
    a = docs.filter(F.col("doc_id") < STRIDE).select("doc_id", F.col("text").alias("t0"))
    b = docs.filter(F.col("doc_id") >= STRIDE).select(
        (F.col("doc_id") - STRIDE).alias("doc_id"),
        F.regexp_replace("text", r" rep\d+$", "").alias("t1"),
    )
    j = a.join(b, "doc_id")
    n_pairs = j.count()
    assert n_pairs == src("documents").count()
    # every doc pair must differ (rotation changed at least one letter);
    # tolerate the rare vowelless/consonantless doc by demanding >= 99%
    assert j.filter(F.col("t0") != F.col("t1")).count() >= n_pairs * 0.99
    assert docs.filter(F.length("text") != F.col("n_chars")).count() == 0

    # embeddings: replica-1 vectors are a rotation (same norm, different
    # direction) of replica-0's
    emb = rd("embeddings")
    e0 = emb.filter(F.col("vec_id") < STRIDE).select("vec_id", F.col("embedding").alias("v0"))
    e1 = emb.filter(F.col("vec_id") >= STRIDE).select(
        (F.col("vec_id") - STRIDE).alias("vec_id"), F.col("embedding").alias("v1")
    )
    je = e0.join(e1, "vec_id").select(
        "vec_id",
        (F.col("v0") != F.col("v1")).alias("differs"),
        F.abs(
            F.aggregate("v0", F.lit(0.0), lambda acc, x: acc + x * x)
            - F.aggregate("v1", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm2_delta"),
    )
    assert je.filter(~F.col("differs")).count() == 0
    assert je.filter(F.col("norm2_delta") > 1e-3).count() == 0
