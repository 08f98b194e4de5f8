"""Round-14 interleaved A/B for `incremental_dedup_report`'s operator path.

A = round-13 shape (take(1) index probe per batch, per-branch candidate
distincts, batch re-shingled from text), replicated inline from the same
public primitives; B = the round-14 `IncrementalLshDedup.process_batch`
(intent-marker replay probe, single candidate distinct, batch signatures
semi-joined from the shared corpus shingles).  Runs interleave A,B,A,B...
in one Spark session after a shared warm-up; per-arm medians + raw lists
print as one JSON line.  Output rows are asserted identical every round.

Usage: python tools/incdedup_ab.py [n_rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark.operators.dedup import (
    IncrementalLshDedup,
    jaccard_pairs_arr,
    lsh_band_keys,
    minhash_signature_cols,
    shingle_arrays,
)
from unstructured_data_pipeline_spark.queries._common import _t
from unstructured_data_pipeline_spark.session import get_spark


def corpus_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    exact_extra = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near_extra = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 2, 1000000), " "
        ).alias("text"),
    )
    return d.unionByName(exact_extra).unionByName(near_extra)


def process_batch_old(inc, docs, batch_id, corpus_shingles):
    """The round-13 process_batch, verbatim shape."""
    d = docs.select(F.col("doc_id").alias("id"), F.col("text").alias("text"))
    sig = minhash_signature_cols(
        shingle_arrays(d, "id", "text", inc.n), inc.num_hashes
    )
    bands_new = lsh_band_keys(sig, inc.num_hashes, inc.bands).persist()
    if inc.table.read().filter(F.col("batch_id") == batch_id).take(1):
        inc.table.delete_where(F.col("batch_id") == batch_id)
    prior = inc.table.read().filter(F.col("batch_id") < batch_id)
    cross = (
        bands_new.join(
            prior.select(F.col("doc_id").alias("a"), "band", "sig"),
            ["band", "sig"],
        )
        .select("a", F.col("id").alias("b"))
        .distinct()
    )
    x, y = bands_new.alias("x"), bands_new.alias("y")
    within = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    cand = cross.unionByName(within).distinct()
    dup_ids = (
        jaccard_pairs_arr(corpus_shingles, cand)
        .filter(F.col("jaccard") >= inc.threshold)
        .select(F.col("b").alias("id"))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    flags = (
        d.select("id")
        .join(dup_ids, "id", "left")
        .select(
            F.col("id").alias("doc_id"), F.col("_d").isNotNull().alias("is_dup")
        )
    )
    flags = flags.localCheckpoint(eager=True)
    inc.table.append(
        bands_new.select(
            F.col("id").alias("doc_id"),
            F.lit(batch_id).cast("long").alias("batch_id"),
            "band",
            "sig",
        )
    )
    bands_new.unpersist()
    return flags


def run(spark, sf_dir, new: bool):
    corpus = corpus_df(spark, sf_dir).persist()
    corpus_sh = shingle_arrays(corpus, "doc_id", "text", 3).persist()
    root = tempfile.mkdtemp(prefix="udp_ab_")
    t0 = time.monotonic()
    try:
        inc = IncrementalLshDedup(
            spark, root, num_hashes=8, bands=4, n=3, threshold=0.5
        )
        frames = []
        for b in (0, 1, 2):
            batch = corpus.filter(F.col("doc_id") % 3 == b)
            if new:
                flags = inc.process_batch(
                    batch, corpus, b, corpus_shingles=corpus_sh
                )
            else:
                flags = process_batch_old(inc, batch, b, corpus_sh)
            frames.append(flags.withColumn("batch_id", F.lit(b).cast("long")))
        allf = frames[0].unionByName(frames[1]).unionByName(frames[2])
        out = (
            allf.groupBy("batch_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
                F.sum((~F.col("is_dup")).cast("long")).alias("n_kept"),
            )
            .orderBy("batch_id")
        )
        rows = [tuple(r) for r in out.collect()]
        dt = time.monotonic() - t0
    finally:
        corpus_sh.unpersist()
        corpus.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return dt, rows


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # shared warm-up
    run(spark, sf_dir, new=False)
    run(spark, sf_dir, new=True)
    a, b = [], []
    ref = None
    for _ in range(rounds):
        dt, rows = run(spark, sf_dir, new=False)
        a.append(round(dt, 3))
        ref = ref or rows
        assert rows == ref, ("OLD rows diverged", rows, ref)
        dt, rows = run(spark, sf_dir, new=True)
        b.append(round(dt, 3))
        assert rows == ref, ("NEW rows diverged", rows, ref)

    def med(xs):
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)

    print(
        json.dumps(
            {
                "probe": "incdedup_r13_vs_r14",
                "sf_dir": sf_dir,
                "rounds": rounds,
                "old_runs": a,
                "new_runs": b,
                "old_median": med(a),
                "new_median": med(b),
                "rows": ref,
                "loadavg": open("/proc/loadavg").read().split()[:3],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
