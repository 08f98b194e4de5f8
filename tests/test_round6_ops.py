"""Unit tests for the round-6 operators: zone-map skipping, binary
quantization / Hamming, theta set ops, pseudonymization, correlated-sample
join cardinality.  Registry-level oracle parity is covered by
test_oracle_parity; these pin the operator-level invariants the hash gate
can't see (pruning really skips files, packing really matches numpy signs,
sampling really is correlated)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators import similarity as SIM
from unstructured_data_pipeline_spark.operators import zonemaps as ZM


def test_zonemap_prunes_and_preserves_answer(spark, tmp_path):
    """Pruned read must skip non-overlapping files AND return exactly the
    full-scan answer on the overlapping range."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("v")
    )
    path = str(tmp_path / "t")
    (
        df.withColumn("b", F.expr("k div 100"))
        .repartition("b")
        .write.partitionBy("b")
        .parquet(path)
    )
    zones = ZM.collect_zone_maps(spark, path, ["k"])
    picked, files_read, files_total = ZM.pruned_read(spark, zones, "k", 250, 449)
    assert files_total == 10
    assert files_read == 3  # zones [200,299], [300,399], [400,499] overlap
    got = sorted(r["k"] for r in picked.select("k").collect())
    assert got == list(range(250, 450))


def test_zonemap_empty_selection(spark, tmp_path):
    df = spark.range(100).select(F.col("id").alias("k"))
    path = str(tmp_path / "t2")
    df.coalesce(2).write.parquet(path)
    zones = ZM.collect_zone_maps(spark, path, ["k"])
    picked, files_read, files_total = ZM.pruned_read(
        spark, zones, "k", 10_000, 20_000
    )
    assert files_read == 0 and files_total == 2
    assert picked.count() == 0


def test_zonemap_null_stats_file_skipped(spark, tmp_path):
    """A file whose indexed column is entirely NULL has NULL min/max stats;
    a range predicate can't match NULL rows, so the file must be SKIPPED —
    not crash the None>=int comparison (ADVICE r6)."""
    good = spark.createDataFrame([(i,) for i in range(50)], "k long")
    nulls = spark.createDataFrame([(None,)] * 10, "k long")
    path = str(tmp_path / "t3")
    good.coalesce(1).write.parquet(path)
    nulls.coalesce(1).write.mode("append").parquet(path)
    zones = ZM.collect_zone_maps(spark, path, ["k"])
    keep, total = ZM.prune_files(zones, "k", 10, 20)
    assert total == 2 and len(keep) == 1
    picked, files_read, _ = ZM.pruned_read(spark, zones, "k", 10, 20)
    assert files_read == 1
    assert sorted(r["k"] for r in picked.collect()) == list(range(10, 21))


def test_zonemap_zero_file_index(spark):
    """An empty zone-map index (no files at all) degrades to an empty,
    stat-typed frame instead of a zero-path spark.read crash (ADVICE r6)."""
    zones = spark.createDataFrame(
        [], "_file string, n_rows long, min_k long, max_k long"
    )
    picked, files_read, files_total = ZM.pruned_read(spark, zones, "k", 0, 10)
    assert (files_read, files_total) == (0, 0)
    assert picked.count() == 0 and picked.columns == ["k"]


def test_sign_bit_words_match_numpy(spark, sf_dir):
    """Packed sign words must equal numpy's sign pattern bit-for-bit."""
    np = pytest.importorskip("numpy")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(16)
    w0, w1 = SIM.sign_bit_words("embedding", dim=64, word_bits=32)
    rows = emb.select("vec_id", "embedding", w0.alias("w0"), w1.alias("w1")).collect()
    assert rows
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        bits = (v > 0).astype(np.int64)
        exp0 = int((bits[:32] << np.arange(32)).sum())
        exp1 = int((bits[32:] << np.arange(32)).sum())
        assert (r["w0"], r["w1"]) == (exp0, exp1)


def test_hamming_words_is_xor_popcount(spark):
    df = spark.createDataFrame(
        [(0b1010, 0b0110, 0b1111, 0b1111)], "a0 long, a1 long, b0 long, b1 long"
    )
    got = df.select(
        SIM.hamming_words(["a0", "a1"], ["b0", "b1"]).alias("h")
    ).first()["h"]
    assert got == bin(0b1010 ^ 0b1111).count("1") + bin(0b0110 ^ 0b1111).count("1")


def test_pseudonym_consistency_and_masking(spark):
    """Same salt+key -> same token (referential integrity); different salt
    -> unlinkable; raw key never appears in the token."""
    from unstructured_data_pipeline_spark.functions.scalars import pseudonym

    df = spark.createDataFrame([(42,), (42,), (7,)], "k long")
    toks = df.select(pseudonym("k", "s1").alias("a"), pseudonym("k", "s2").alias("b"))
    rows = toks.collect()
    assert rows[0]["a"] == rows[1]["a"]  # consistent within a salt
    assert rows[0]["a"] != rows[2]["a"]  # injective across keys
    assert rows[0]["a"] != rows[0]["b"]  # salt rotation breaks linkability
    # default width is 96 bits (24 hex chars): the birthday bound makes
    # 64-bit tokens collide with ~39% odds at 2^32 keys (ADVICE r6)
    assert all(len(r["a"]) == 24 for r in rows)


def test_join_cardinality_sampling_is_correlated(spark, sf_dir):
    """The invariant that makes the estimator work: a key is sampled on
    side A iff it is sampled on side B (same hash threshold on the key) —
    so sampled pairs survive.  Also: the estimate of a PERFECTLY uniform
    1:1 self-join is exact (every key has cnt 1, sample mean == population
    mean scaled by 1/p is unbiased; determinism pins one value)."""
    from unstructured_data_pipeline_spark.queries import join_cardinality_estimate

    out = {r["join_name"]: r for r in join_cardinality_estimate(spark, sf_dir).collect()}
    for name, r in out.items():
        assert r["n_keys_sampled"] <= r["n_keys_common"]
        assert r["exact_pairs"] > 0, name
        # estimate is a sum over sampled keys / p: nonnegative, and zero
        # only if no key fell under the threshold
        assert r["est_r"] >= 0.0
        if r["n_keys_sampled"] > 0:
            assert r["est_r"] > 0.0


def test_theta_setops_identities(spark, sf_dir):
    """Exact columns must satisfy set algebra: |A| + |B| = |A∪B| + |A∩B|
    and |A\\B| = |A| - |A∩B|; estimates satisfy the same identities by
    construction (shared theta), which is the POINT of theta sketches vs
    independent KMVs."""
    from unstructured_data_pipeline_spark.queries import theta_sketch_setops

    rows = {r["op"]: r for r in theta_sketch_setops(spark, sf_dir).collect()}
    e = {k: rows[k]["exact"] for k in rows}
    assert e["A"] + e["B"] == e["union"] + e["intersect"]
    assert e["a_minus_b"] == e["A"] - e["intersect"]
    s = {k: rows[k]["n_sample"] for k in rows}
    assert s["A"] + s["B"] == s["union"] + s["intersect"]
    assert s["a_minus_b"] == s["A"] - s["intersect"]


def test_dpp_plan_has_dynamic_pruning(spark, sf_dir, tmp_path):
    """The fact scan of a partition-key join against a filtered dimension
    must carry a dynamicpruningexpression partition filter — the runtime
    pruning mechanism dynamic_partition_pruning_report's docstring claims.
    Reproduces the report's layout inline so the plan can be inspected
    before the report's scratch dir is cleaned up."""
    from unstructured_data_pipeline_spark.queries import _cents, _events

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", _cents(F.col("value")).alias("cents"), "event_type"
    )
    root = str(tmp_path / "dpp_fact")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(root)
    fact = spark.read.parquet(root)
    from pyspark.sql import Window

    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("pri", F.row_number().over(Window.orderBy("event_type")))
        .filter(F.col("pri") <= 2)
    )
    out = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]
