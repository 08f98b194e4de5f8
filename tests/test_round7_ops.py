"""Unit tests for the round-7 operators: blocked fuzzy record linkage,
GDPR erasure cascade, join-key skew advisor, CUBE grouping sets.
Registry-level oracle parity is covered by test_oracle_parity; these pin
the operator-level invariants the hash gate can't see (the linkage really
recovers the planted truth, the cascade really leaves zero orphans, the
cube really partitions the total)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.queries import (
    _t,
    cube_returnflag_status,
    fuzzy_record_linkage,
    gdpr_erasure_cascade,
    skew_advisor_report,
)


def test_fuzzy_linkage_recovers_planted_truth(spark, sf_dir):
    """Every 10th customer is dirtied at edit distance 1 (matchable) and
    every 100th is reversed (unmatchable): the per-segment rollup must
    account for exactly that cohort, every match must be CORRECT, and the
    unmatched count must equal the reversed sliver."""
    cust = _t(spark, sf_dir, "customer")
    n_dirty = cust.filter(F.col("c_custkey") % 10 == 3).count()
    n_reversed = cust.filter(F.col("c_custkey") % 100 == 3).count()
    rows = fuzzy_record_linkage(spark, sf_dir).collect()
    assert sum(r["n_dirty"] for r in rows) == n_dirty
    assert sum(r["n_unmatched"] for r in rows) == n_reversed
    for r in rows:
        assert r["n_correct"] == r["n_matched"]  # no wrong master ever wins
        assert r["n_matched"] + r["n_unmatched"] == r["n_dirty"]


def test_gdpr_cascade_zero_orphans_and_conservation(spark, sf_dir):
    out = {r["table_name"]: r for r in gdpr_erasure_cascade(spark, sf_dir).collect()}
    assert set(out) == {"customer", "orders", "lineitem", "events"}
    for r in out.values():
        assert r["n_orphans_after"] == 0
        assert r["n_before"] - r["n_erased"] == r["n_after"]
    assert out["customer"]["n_erased"] > 0  # the cohort is non-empty
    # cascade is monotone: erased orders imply erased lineitems
    if out["orders"]["n_erased"]:
        assert out["lineitem"]["n_erased"] > 0


def test_skew_advisor_bounds_and_hot_key(spark, sf_dir):
    out = {r["key_name"]: r for r in skew_advisor_report(spark, sf_dir).collect()}
    li_n = _t(spark, sf_dir, "lineitem").count()
    assert out["lineitem.l_partkey"]["n_rows"] == li_n
    for r in out.values():
        assert 1 <= r["salt_factor"] <= 32
        assert 0 <= r["top1_permille"] <= 1000
        assert r["top1_cnt"] * r["n_keys"] >= r["n_rows"]  # max >= mean
    # event_type has ~5 values -> its hottest key overflows an ideal
    # 32-way partition and MUST trigger a salt recommendation; l_partkey
    # is near-uniform and must not.
    assert out["events.event_type"]["salt_factor"] > 1
    assert out["lineitem.l_partkey"]["salt_factor"] == 1


def test_cube_partitions_the_total(spark, sf_dir):
    rows = cube_returnflag_status(spark, sf_dir).collect()
    total = _t(spark, sf_dir, "lineitem").count()
    by_gid: dict[int, list] = {}
    for r in rows:
        by_gid.setdefault(r["grouping_id"], []).append(r)
    # gid 3 = grand total (both dims rolled up): exactly one row
    assert len(by_gid[3]) == 1
    assert by_gid[3][0]["n_rows"] == total
    assert by_gid[3][0]["returnflag"] == "ALL" and by_gid[3][0]["linestatus"] == "ALL"
    # every grouping set partitions the same total (rows and cents)
    cents = by_gid[3][0]["sum_price_cents"]
    for gid in (0, 1, 2):
        assert sum(r["n_rows"] for r in by_gid[gid]) == total
        assert sum(r["sum_price_cents"] for r in by_gid[gid]) == cents


def test_window_rank_quartiles_balanced(spark, sf_dir):
    """NTILE must split each priority into quartiles whose sizes differ by
    at most 1; the last quartile's cumulative distribution must reach
    exactly 1000 permille, and every permille stays in [0, 1000]."""
    from unstructured_data_pipeline_spark.queries import window_rank_functions_suite

    rows = window_rank_functions_suite(spark, sf_dir).collect()
    by_prio: dict[str, list] = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], []).append(r)
    for prio, qs in by_prio.items():
        sizes = [r["n_rows"] for r in qs]
        assert max(sizes) - min(sizes) <= 1, (prio, sizes)
        last = max(qs, key=lambda r: r["quartile"])
        assert last["max_cd_permille"] == 1000
        for r in qs:
            assert 0 <= r["max_pr_permille"] <= 1000
            assert 0 <= r["max_cd_permille"] <= 1000
        # quartile value ranges never overlap going upward
        ordered = sorted(qs, key=lambda r: r["quartile"])
        for lo, hi in zip(ordered, ordered[1:]):
            assert lo["max_cents"] <= hi["min_cents"] or lo["max_cents"] == hi["min_cents"]
