"""Bloom-filter join pruning (operators/bloom.py): no false negatives ever,
false-positive rate near the sizing target, and the pruned semi join is
row-for-row the plain semi join."""

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom,
    might_contain,
    optimal_params,
)


def test_optimal_params_sane():
    m, k = optimal_params(1000, fpr=0.01)
    assert m % 64 == 0
    assert m >= 9000  # ~9.6 bits/key at 1% fpr
    assert 5 <= k <= 10
    assert optimal_params(0) == (64, 1)
    # tighter fpr -> more bits
    assert optimal_params(1000, 0.001)[0] > m


def test_no_false_negatives_and_fpr(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    m, k = optimal_params(2000, fpr=0.01)
    filt = build_bloom(keys, "k", m, k)
    # every inserted key must test positive
    n_in = keys.where(might_contain(filt, F.col("k"), m, k)).count()
    assert n_in == 2000
    # disjoint probe set: positives are false positives; allow 3x headroom
    probe = spark.range(100000, 120000).select(F.col("id").alias("k"))
    n_fp = probe.where(might_contain(filt, F.col("k"), m, k)).count()
    assert n_fp / 20000 < 0.03


def test_bit63_mask_is_reachable(spark):
    # tiny filter where positions hit word-boundary bits incl. bit 63
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    filt = build_bloom(keys, "k", m_bits=64, k=3)  # single word saturates
    assert filt[0] != 0
    n = keys.where(might_contain(filt, F.col("k"), 64, 3)).count()
    assert n == 500


def test_bloom_semi_join_matches_plain_semi(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    got = bloom_semi_join(orders, cust, "o_custkey", "c_custkey")
    want = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_probe_is_scan_side_predicate(spark, sf_dir):
    """The membership test must appear as a Filter under the scan (before
    the exact join), i.e. pure arithmetic — no extra join/shuffle for the
    Bloom probe itself."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    plan = bloom_semi_join(
        orders, cust, "o_custkey", "c_custkey"
    )._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan  # probe expression inlined in the plan
    # exactly the one (semi) join — probe adds none
    assert plan.count("Join") <= plan.lower().count("leftsemi") + 1
