#!/usr/bin/env python
"""End-to-end training-data curation: raw corpus -> curated, deduplicated,
decontaminated, mixture-balanced, packed training sequences.

    corpus -> quality metrics -> exact dedup -> MinHash-LSH near-dup
           -> benchmark decontamination -> stratified sample
           -> semantic clusters (k-means) -> context-window packing
           -> mixture report

Run:  python examples/curation_pipeline.py [sf_dir]
Every step is a distributed DataFrame op (see SCALE.md for the 100 TB
shape of each); the same steps are oracle-checked as registry queries.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark import get_spark
from unstructured_data_pipeline_spark.functions import text as TX
from unstructured_data_pipeline_spark.operators import dedup as DD
from unstructured_data_pipeline_spark.operators.clustering import kmeans_embeddings
from unstructured_data_pipeline_spark.operators.packing import pack_greedy


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="udp-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. quality gate: length + lexical diversity (Gopher-style rules)
    w = docs.select("doc_id", "lang", "text", TX.tokens_ws("text").alias("w"))
    quality = w.select(
        "doc_id",
        "lang",
        "text",
        F.size("w").alias("n_words"),
        (F.size(F.array_distinct("w")) / F.size("w")).alias("uniq_ratio"),
    )
    kept = quality.filter((F.col("n_words") >= 15) & (F.col("uniq_ratio") >= 0.5))
    print(f"after quality gate: {kept.count()}")

    # 2. exact dedup (md5 fingerprint, keep lowest id per group)
    fp = kept.withColumn("fp", TX.fingerprint("text"))
    first = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact = fp.join(F.broadcast(first), "fp").filter(
        F.col("doc_id") == F.col("keep_id")
    ).drop("fp", "keep_id")
    print(f"after exact dedup: {exact.count()}")

    # 3. near-dup removal: MinHash-LSH candidate pairs, drop the higher id
    pairs = DD.near_dup_pairs(
        exact.select("doc_id", "text"), "doc_id", "text", threshold=0.5
    )
    drop = pairs.select(F.col("b").alias("doc_id")).distinct()
    near = exact.join(drop, "doc_id", "left_anti")
    print(f"after near-dup removal: {near.count()}")

    # 4. benchmark decontamination: drop docs sharing an 8-gram with the
    #    held-out split (doc_id % 17 == 0 stands in for the benchmark)
    def grams8(df):
        return df.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    TX.word_shingles_from_tokens(TX.tokens_ws("text"), 8)
                )
            ).alias("s"),
        )

    bench = near.filter(F.col("doc_id") % 17 == 0)
    train = near.filter(F.col("doc_id") % 17 != 0)
    contaminated = (
        grams8(train)
        .join(F.broadcast(grams8(bench).select("s").distinct()), "s")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(contaminated, "doc_id", "left_anti")
    print(f"after decontamination: {clean.count()}")

    # 5. semantic clusters for diversity-aware mixing
    clusters = kmeans_embeddings(emb, "vec_id", "embedding", k=8, iters=2)
    print("cluster sizes:", [r["n_points"] for r in clusters.collect()])

    # 6. pack into 256-token context windows, sharded by language
    sized = clean.select(
        F.col("lang").alias("shard"),
        F.col("doc_id").alias("id"),
        TX.token_count_ws("text").cast("long").alias("sz"),
    )
    packs = pack_greedy(sized, "shard", "id", "sz", budget=256)
    summary = packs.groupBy("shard").agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("sz").alias("tokens"),
    )

    # 7. mixture report
    print("packing / mixture report:")
    for r in summary.orderBy("shard").collect():
        print(f"  {r['shard']}: {r['n_packs']} packs, {r['tokens']} tokens")

    spark.stop()


if __name__ == "__main__":
    main()
