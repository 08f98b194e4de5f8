#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.  Each query is materialized with a full
collect (outputs are small aggregates or bounded row sets) after a warm-up
of the input scans.

Artifact protocol (VERDICT r6 #1 — the driver records only a 2000-char
tail of combined stdout+stderr and parses the LAST JSON line in it):

* the LAST stdout line is a COMPACT (<1 kB) summary —
  ``{"metric","value","unit","queries":{headline only, 2-decimal},"sf",
  "pipeline_docs_per_sec","n_extra_ok","n_err","partial"}`` — emitted via
  ``atexit`` so it lands AFTER any crash traceback;
* the FULL record (cold runs, ~190 EXTRA timings, error map) checkpoints
  atomically to ``bench_full_latest.json`` after the headline and every 8
  extras — a dead JVM can no longer erase measured numbers;
* ``spark.stop()`` is guarded and ``__main__`` exits 0 whenever the
  headline was measured, so a tail-of-run JVM death (r2/r5/r6) degrades to
  ``partial: true`` instead of rc=1 with ``parsed: null``.

``SPARK_GRAFT_HEADLINE_ONLY=1`` times the frozen 28-query headline and
skips the EXTRA marathon (used by the sf1 scale probe, SCALE.md).

Headline timings are the MEDIAN of ``SPARK_GRAFT_HEADLINE_RUNS`` warm runs
(default 3; scale probes default to 1) with the raw run lists in the
sidecar — VERDICT r8 #6: same-code headline totals swung 19.99-26.4 s on
host noise, so the round-over-round comparison now rides the median.
"""

from __future__ import annotations

import atexit
import json
import os
import sys
import time
import traceback
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

from unstructured_data_pipeline_spark import get_spark
from unstructured_data_pipeline_spark.queries import DEMOS, REGISTRY

# Shared mutable run state so the atexit hook / __main__ guard can emit the
# final compact line no matter where the run died (VERDICT r6 #1: the driver
# keeps only a 2000-char tail of combined stdout+stderr and parses the LAST
# JSON line in it; the old cumulative ~200-key line could never fit).
STATE: dict = {
    "timings": {},       # headline per-query sec: MEDIAN of the warm runs
    "headline_runs": {}, # headline per-query raw warm-run list (sidecar)
    "cold": {},          # headline cold-run sec
    "extra": {},         # EXTRA per-query sec (sidecar only)
    "errors": {},        # name -> first line of exception
    "docs_per_sec": None,
    "total": 0.0,
    "sf": None,
    "done": False,  # set only when main() reached its natural end
    "final_emitted": False,
}

SIDECAR = Path(__file__).resolve().parent / "bench_full_latest.json"


def compact_line(partial: bool) -> str:
    """The ONE line the driver parses.  Headline queries only, 2-decimal,
    compact separators — must stay well under the driver's 2000-char tail
    window even after the traceback of a dead JVM lands on stderr first.
    ``tests/test_units.py::test_bench_compact_line_fits_tail`` pins the
    budget so the r2-r6 artifact-outgrows-capture bug class can't return."""
    return json.dumps(
        {
            "metric": "headline_query_suite_total",
            "value": round(STATE["total"], 3),
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in STATE["timings"].items()},
            "sf": STATE["sf"],
            "pipeline_docs_per_sec": STATE["docs_per_sec"],
            "n_extra_ok": len(STATE["extra"]),
            "n_err": len(STATE["errors"]),
            "partial": partial,
        },
        separators=(",", ":"),
    )


def emit_full(partial: bool) -> None:
    """Write the FULL cumulative result (headline + cold + extras + errors)
    to the sidecar file, atomically, at every checkpoint.  This is the
    human/judge-facing record; stdout gets only progress notes and the
    compact final line."""
    payload = {
        "metric": "headline_query_suite_total",
        "value": round(STATE["total"], 3),
        "unit": "sec",
        "queries": STATE["timings"],
        "headline_runs": STATE["headline_runs"],
        "cold_queries": STATE["cold"],
        "extra_queries": STATE["extra"],
        "pipeline_docs_per_sec": STATE["docs_per_sec"],
        "sf": STATE["sf"],
        "partial": partial,
        "errors": STATE["errors"],
    }
    tmp = SIDECAR.with_suffix(".tmp")
    tmp.write_text(json.dumps(payload, indent=1))
    tmp.replace(SIDECAR)


def emit_final() -> None:
    """Print the compact summary as the very last stdout line.  Registered
    with atexit so it runs AFTER any unhandled-exception traceback has been
    printed — the driver's tail parser then still sees valid JSON last."""
    if STATE["final_emitted"] or not STATE["timings"]:
        return
    STATE["final_emitted"] = True
    print(compact_line(partial=not STATE["done"]), flush=True)


atexit.register(emit_final)

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_volume",
    "customer_order_stats",
    "latest_event_per_user",
    "event_type_summary",
    "pivot_event_values",
    "events_hourly_counts",
    "sessionize_summary",
    "asof_purchase_last_view",
    "pipeline_extract_eav",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "doc_fingerprint_rolling",
    "text_quality_metrics",
    "emb_cosine_topk",
    "ann_ivf_topk",
    "q6_forecast_revenue",
    "q7_nation_pair_volume",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "q18_big_orders",
    "percentiles_by_segment",
    "funnel_signup_view_purchase",
    "retention_cohorts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Shuffle/spill files go to a repo-local scratch dir instead of /tmp:
    # round 5's driver bench died mid-run when a /tmp reaper deleted live
    # blockmgr shuffle files (BENCH_r05 rc=1, zero parsed numbers).
    scratch = str(Path(__file__).resolve().parent / ".spark-scratch")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        app_name="udp-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.local.dir": scratch},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (excluded from timings): ship the package to executors, spin up
    # the Python worker pool, JIT the codegen paths.  Measures steady-state
    # throughput, not JVM/worker cold start.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from unstructured_data_pipeline_spark.dist import ensure_shipped

    ensure_shipped(spark)

    @F.pandas_udf(T.LongType())
    def _noop(x: pd.Series) -> pd.Series:
        return x

    spark.range(10_000).repartition(int(cpus)).select(_noop("id")).count()
    REGISTRY["pipeline_extract_eav"][0](spark, "/root/testdata/sf0.001").count()
    # warm every input scan (parquet footer reads + filesystem cache), so
    # per-query timings measure the operator, not first-touch I/O
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    # warm events via the normalizing reader (handles nanos parquet across
    # Spark versions — see queries._events)
    from unstructured_data_pipeline_spark.queries import _events

    _events(spark, sf_dir).count()

    timings = STATE["timings"]
    cold = STATE["cold"]
    extra = STATE["extra"]
    errors = STATE["errors"]
    # trailing sf<number> of the dir name; handles both /testdata/sf0.1 and
    # the synthetic .testdata-sf10 probe fixtures (whose old .replace parse
    # landed "sf": null in probe artifacts)
    import re

    m = re.search(r"sf([\d.]+)$", os.path.basename(sf_dir.rstrip("/")))
    try:
        STATE["sf"] = float(m.group(1)) if m else None
    except ValueError:
        STATE["sf"] = None

    # VERDICT r8 #6: the headline is a MEDIAN of N warm runs (default 3) so
    # the 19.99-26.4 s same-code host band stops dominating round-over-round
    # comparison; the raw runs land in the sidecar.  Scale probes
    # (SPARK_GRAFT_HEADLINE_ONLY) default to a single warm run to keep the
    # sf1/sf10 tables comparable with prior rounds and affordable;
    # SPARK_GRAFT_HEADLINE_RUNS overrides either default.
    # ADVICE r9: clamp to >=1 and survive a non-numeric env value — a 0 or
    # garbage SPARK_GRAFT_HEADLINE_RUNS must not crash the whole bench via an
    # empty median list / ValueError outside the per-query try block.
    try:
        n_runs = int(
            os.environ.get("SPARK_GRAFT_HEADLINE_RUNS")
            or (1 if os.environ.get("SPARK_GRAFT_HEADLINE_ONLY") else 3)
        )
    except ValueError:
        print(
            "# SPARK_GRAFT_HEADLINE_RUNS is not an integer: "
            f"{os.environ['SPARK_GRAFT_HEADLINE_RUNS']!r}; using 1",
            file=sys.stderr,
        )
        n_runs = 1
    n_runs = max(1, n_runs)
    runs = STATE["headline_runs"]
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        # steady-state methodology: run once to JIT the generated code for
        # this plan shape (timed separately as "cold"), then time N FRESH
        # plan builds + executions.  Each rebuild gets a new QueryExecution,
        # so nothing is reused across runs except compiled codegen classes —
        # every warm run re-scans, re-shuffles, and re-computes everything.
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            cold[name] = round(time.perf_counter() - t0, 3)
            raw = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                n = len(fn(spark, sf_dir).collect())
                raw.append(round(time.perf_counter() - t0, 3))
        except Exception as e:  # keep measuring; record and move on
            errors[name] = str(e).split("\n")[0][:200]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        runs[name] = raw
        dt = sorted(raw)[len(raw) // 2]  # median (upper on even n)
        timings[name] = dt
        STATE["total"] += dt
        print(
            f"# {name}: {dt:.3f}s median-of-{n_runs} {raw} "
            f"cold {cold[name]:.3f}s ({n} rows)",
            file=sys.stderr,
        )

    emit_full(partial=True)  # headline numbers are now crash-safe on disk

    if os.environ.get("SPARK_GRAFT_HEADLINE_ONLY"):
        # scale probes (tools/make_sf1.py fixtures) time the frozen headline
        # without the ~130-query EXTRA marathon
        STATE["done"] = True
        try:
            spark.stop()
        except Exception:
            pass
        return

    # round-2 additions, timed SEPARATELY — the headline set above stays
    # frozen for round-over-round comparability (VERDICT r1 #10)
    EXTRA = [
        "dedup_ngram_jaccard_prefix",  # the scale-safe SSJoin path
        "ann_lsh_recall",              # LSH ANN + exact baseline + recall join
        "pdf_ocr_pipeline_demo",       # render->sniff->extract binary path
        "streaming_intake_eav",        # full streaming intake drain
        "corpus_curation_report",      # end-to-end curation funnel
        "decontam_benchmark_overlap",  # 8-gram benchmark-overlap join
        "kmeans_embeddings_clusters",  # 3 distributed Lloyd's passes
        "pack_context_windows",        # greedy packing via applyInPandas
        "stratified_sample_documents", # per-stratum hash sampling
        # round-3 additions
        "incremental_dedup_report",    # 3-batch stateful dedup vs band index
        "text_knn_hashed_embedding",   # text -> hashed embedding -> top-k
        "dedup_end_to_end_report",     # LSH pairs -> components -> keep/drop
        "ann_lsh_topk_contract",       # LSH top-5 rank contract
        # round-4: expression-tree near-dup variant, timed against the
        # blocked-BLAS registry default (dedup_embedding_cosine in HEADLINE)
        # so the docstring's "BLAS wins" claim carries a tracked number
        "emb_neardup_expression",
        # round-4 additions
        "merge_partitioned_lifecycle",   # partition-pruned MERGE table layer
        "semdedup_report",               # cluster-blocked embedding dedup
        "boilerplate_removal_report",    # paragraph-df stripping + rebuild
        "table_time_travel_report",      # snapshot retention + AS-OF reads
        "heavy_hitters_contract",        # Misra-Gries top-k error contract
        "catalog_counts_report",         # S4 catalog counts via table layer
        "warehouse_bootstrap_report",    # S8 bootstrap + seed idempotence
        "prompt_normalization_contract", # AI6 normalization spec contract
        "session_defaults_contract",     # context fns + timestamp defaults
        "bloom_join_prune_report",       # Bloom scan-side join pruning
        "lm_perplexity_filter",          # CCNet bigram-LM quality scoring
        "exact_substring_dedup",         # duplicated-span coverage report
        "rrf_hybrid_fusion",             # lexical+semantic RRF top-5
        "training_shard_manifest",       # deterministic shuffle+shard gate
        "quality_classifier_filter",     # linear-model quality inference
        "skew_salted_join_report",       # hot-key salted join + rollup
        "table_changes_stream_report",   # CDC snapshot-diff accounting
        "ann_pq_topk_contract",          # PQ train->encode->ADC top-k
        "ivm_rollup_maintenance",        # delta-only view maintenance
        "schema_evolution_report",       # metadata-only ADD COLUMN
        "bpe_tokenize_report",           # fixed-merge-table BPE apply
        "domain_quota_cap",              # bucket-pruned per-source top-N
        "ann_pq_recall",                 # PQ recall@5 vs exact L2
        "ann_pq_subspace_topk",          # classic per-subspace PQ
        "pq_subspace_recall",            # quality: per-subspace vs shared
        "dedup_containment_pairs",       # asymmetric containment SSJoin
        "quality_weighted_sample",       # score-proportional acceptance
        # round-5 additions
        "dsir_importance_sample",        # DSIR unigram importance selection
        "bm25_topk_contract",            # BM25 length-normalized top-10
        "unimax_language_budgets",       # UniMax epoch-capped water-fill
        "count_min_sketch_contract",     # CMS point-estimate contract
        "c4_quality_filter_report",      # C4 rule cascade with reasons
        "table_profile_report",          # one-scan column profiling
        "table_clone_report",            # zero-copy clone + divergence
        "bucketed_join_report",          # write-bucketed exchange-free join
        "jl_projection_topk",            # JL sketch + projected-space top-k
        "pagerank_part_copurchase",      # bounded-iteration integer PageRank
        "vocab_coverage_report",         # vocabulary OOV coverage audit
        "train_val_test_split_report",   # hash split + stratum audit
        "mor_delete_lifecycle_report",   # merge-on-read deletes + fold
        "event_pattern_match_report",    # MATCH_RECOGNIZE-style row patterns
        "outlier_mad_report",            # robust MAD outliers, one Exchange
        "scd2_dimension_pit_report",     # SCD2 intervals + point-in-time join
        "recursive_bom_closure_report",  # WITH RECURSIVE parity via iteration
        "interval_concurrency_report",   # hourly active sessions, bounded explode
        "expectations_audit_report",     # data-quality gate, one pass per table
        "mutual_nn_pairs",               # bitext mutual top-1 pair mining
        "ols_trend_by_segment",          # exact OLS from integer power sums
        "user_streaks_report",           # gaps-and-islands longest streaks
        "table_fingerprint_report",      # order-independent reconciliation sums
        "rfm_segmentation_report",       # RFM quartile segment histogram
        "association_rules_report",      # basket rules: support/confidence/lift
        "largest_remainder_allocation",  # exact integer proration
        "twap_user_daily",               # time-weighted average per user-day
        # round-6 additions
        "zonemap_pruning_report",        # per-file min/max skipping index
        "binary_quant_hamming_topk",     # 1-bit sign packing + xor/popcount
        "theta_sketch_setops",           # KMV-merge union/intersect/diff
        "orc_roundtrip_report",          # ORC sink native-type roundtrip
        "pseudonymize_consistent_report",  # salted-token referential integrity
        "colbert_maxsim_topk",           # late-interaction MaxSim retrieval
        "join_cardinality_estimate",     # correlated-hash-sample join stats
        "compaction_report",             # 16-file ingest -> OPTIMIZE to 2
        "dynamic_partition_pruning_report",  # runtime fact-scan pruning
        "inverted_index_report",         # postings-list IR index stats
        "bigram_collocations_topk",      # PMI collocations, integer-exact
        "event_transition_matrix",       # Markov first-order transitions
        "events_gap_filled_hourly",      # spine-join time densification
        "triangle_count_copurchase",     # degree-ordered wedge join
        "skyline_parts_2d",              # 2-D Pareto frontier
        "equidepth_histogram_orders",    # planner equi-depth buckets
        "weighted_median_by_flag",       # exact weighted median, integer
        "referential_integrity_audit",   # 7 FK orphan anti-join probes
        "benford_first_digit_audit",     # first-digit permille vs Benford
        "drift_share_report",            # half-vs-half event-mix drift
        "cusum_changepoint_hourly",      # argmax |n*S_k - k*S_n|
        "frequent_event_sequences",      # distinct-user trigram support
        "kcore_decomposition",           # 3-round k=3 peeling
        "encoding_advisor_report",       # RLE runs natural vs sorted
        "rake_keyphrases",               # RAKE phrase milli-scores
        "bitmap_index_report",           # popcount word-algebra counts
        "fd_violation_audit",            # functional-dependency discovery
        "k_anonymity_audit",             # QI equivalence-class audit
        "ndcg_mrr_eval",                 # int8 ranker vs exact-cosine truth
        "vocab_growth_report",           # Heaps-law decile curve
        "event_interarrival_histogram",  # power-of-two gap buckets
        "nation_profile_similarity",     # cos^2 permille profile pairs
        # round-7 additions
        "fuzzy_record_linkage",          # blocked levenshtein entity match
        "gdpr_erasure_cascade",          # FK-cascade erasure + orphan audit
        "skew_advisor_report",           # hot-key stats + salt fan-out
        "cube_returnflag_status",        # CUBE + GROUPING_ID one-pass
        "window_rank_functions_suite",   # ntile/percent_rank/cume_dist
        # round-8 additions
        "gdpr_erasure_lifecycle",        # executed cascade + on-disk orphan audit
        "triangle_count_sampled",        # DOULION p=1/2 sampled triangles
        "fingerprint_xxhash64",          # A/B: xxhash64 vs md5 k-gram hashing
        # round-9 additions
        "streaming_interval_join_attribution",  # stream-stream interval join e2e
        "pipeline_flaky_transport_recovery",    # C4 retry recovery, oracle-gated
    ]

    def _emb_neardup_expression(spark, sf_dir):
        """dedup_embedding_cosine's corpus through the expression-path
        embedding_near_dup (blocked equi-join + fold-left dot) instead of
        the applyInPandas BLAS matmul — bench-only comparison entry."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        from unstructured_data_pipeline_spark.operators import similarity as SIM
        from unstructured_data_pipeline_spark.queries import _t

        emb = _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
        )
        planted = emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                "emb", lambda x, i: F.when(i == 0, x + F.lit(0.25)).otherwise(x)
            ).alias("emb"),
            "label",
        )
        corpus = emb.unionByName(planted)
        out = SIM.embedding_near_dup(
            corpus, id_col="vec_id", vec_col="emb", block_col="label", threshold=0.9
        )
        return out.select("a", "b", F.round("cos", 6).alias("cos_r"))

    def _pq_subspace_recall(spark, sf_dir):
        """Bench-only quality row: recall@5 (vs exact L2) of the classic
        per-subspace codebooks next to the shared codebook — the number
        that justifies per-subspace's extra encode joins.  Both averages
        print to stderr; the timing covers the per-subspace fit+search+
        recall join."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        from unstructured_data_pipeline_spark.operators import pq as PQ
        from unstructured_data_pipeline_spark.operators.clustering import (
            quantize_vec,
        )
        from unstructured_data_pipeline_spark.queries import (
            REGISTRY,
            _exact_l2_top5,
            _heavy,
        )

        emb = _heavy(spark, sf_dir, "embeddings")
        codes, cbs, dsub = PQ.pq_fit_encode_subspace(
            emb, "vec_id", "embedding", dim=64, m=4, k=16, iters=2, scale=1000
        )
        qrows = (
            emb.filter(F.col("vec_id") < 4)
            .select("vec_id", quantize_vec(F.col("embedding"), 1000).alias("qx"))
            .collect()
        )
        queries = sorted((r["vec_id"], list(r["qx"])) for r in qrows)
        adc = PQ.pq_adc_topk(codes, cbs, queries, m=4, dsub=dsub, topk=5)
        exact = {
            (r["qid"], r["vid"])
            for r in _exact_l2_top5(spark, emb, queries).collect()
        }
        sub_hits = adc.select("qid", "id").collect()
        sub_recall = sum(
            1 for r in sub_hits if (r["qid"], r["id"]) in exact
        ) / max(1, len(sub_hits))
        shared_recall = (
            REGISTRY["ann_pq_recall"][0](spark, sf_dir)
            .agg(F.avg("recall_r").alias("r"))
            .collect()[0]["r"]
        )
        print(
            f"# pq recall@5: per-subspace {sub_recall:.3f} "
            f"vs shared {shared_recall:.3f}",
            file=sys.stderr,
        )
        return adc

    def _fingerprint_xxhash64(spark, sf_dir):
        """doc_fingerprint_rolling with xxhash64 in place of md5 — the
        SCALE.md-documented production hash swap, measured instead of
        claimed (VERDICT r7 Next #7).  md5 stays the registry default
        because it is the cross-engine parity hash (DuckDB has no
        xxhash64); this bench-only A/B row quantifies what the swap buys.
        Compare its EXTRA time against doc_fingerprint_rolling's
        headline time at the same sf."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        from unstructured_data_pipeline_spark.functions import text as TX
        from unstructured_data_pipeline_spark.queries import _heavy

        d = _heavy(spark, sf_dir, "documents")
        u = d.select(
            "doc_id",
            F.greatest(F.length("text") - 7, F.lit(0)).cast("long").alias("n_grams"),
            F.array_distinct(TX.rolling_kgrams("text", k=8)).alias("_u"),
        )
        return u.select(
            "doc_id",
            "n_grams",
            F.size("_u").cast("long").alias("n_uniq_grams"),
            F.array_min(F.transform("_u", lambda g: F.xxhash64(g))).alias("fp_min"),
        )

    BENCH_ONLY = {
        "emb_neardup_expression": _emb_neardup_expression,
        "pq_subspace_recall": _pq_subspace_recall,
        "fingerprint_xxhash64": _fingerprint_xxhash64,
    }
    for i, name in enumerate(EXTRA):
        if name in BENCH_ONLY:
            fn = BENCH_ONLY[name]
        elif name in REGISTRY:
            fn = REGISTRY[name][0]
        else:
            fn = DEMOS[name]  # rows-only demos retired from REGISTRY in r4
        try:
            fn(spark, sf_dir).collect()  # warm/JIT
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            extra[name] = round(time.perf_counter() - t0, 3)
            print(f"# extra {name}: {extra[name]:.3f}s ({n} rows)", file=sys.stderr)
        except Exception as e:
            errors[name] = str(e).split("\n")[0][:200]
            print(f"# extra {name}: FAILED {errors[name]}", file=sys.stderr)
        if (i + 1) % 8 == 0:
            emit_full(partial=True)  # checkpoint the sidecar every 8 extras

    # document-pipeline throughput (BASELINE.md: docs/sec, stub AI backends,
    # full classify->extract->EAV): documents count / wall time of the EAV run.
    # Drop the EXTRA queries' persisted state first (several table-layer and
    # PQ entries legitimately cache intermediates): the throughput number
    # should measure the pipeline, not the GC pressure of 40 earlier queries.
    emit_full(partial=True)
    try:
        spark.catalog.clearCache()
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        t0 = time.perf_counter()
        REGISTRY["pipeline_extract_eav"][0](spark, sf_dir).count()
        STATE["docs_per_sec"] = round(n_docs / (time.perf_counter() - t0), 1)
    except Exception as e:
        errors["pipeline_docs_per_sec"] = str(e).split("\n")[0][:200]

    STATE["done"] = True
    emit_full(partial=False)
    try:
        # A dead JVM makes stop() raise ConnectionRefusedError; that must
        # not flip a fully-measured run to rc=1 (it did in BENCH_r06).
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    rc = 1
    try:
        main()
        rc = 0
    except BaseException:
        traceback.print_exc()
        # headline measured -> the run produced its numbers; report success
        # so the driver records them instead of a bare rc=1.
        rc = 0 if STATE["timings"] else 1
    emit_final()
    sys.exit(rc)
