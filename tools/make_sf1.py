#!/usr/bin/env python
"""Synthesize an sf1 fixture (~6 M lineitem) from the driver's sf0.1 tables.

VERDICT r6 #5 asks for one 100x-of-gate scale probe; no generator or network
is available in the sandbox, so sf1 is built as 10 KEY-SHIFTED replicas of
sf0.1 with referential integrity preserved inside each replica:

* fact/dim keys (custkey, orderkey, partkey, suppkey, doc_id, vec_id,
  event_id, user_id) get a per-replica offset of STRIDE = 10^9, far above
  any sf0.1 key, so joins never cross replicas and key cardinality scales
  exactly 10x;
* region/nation are fixed-cardinality dimensions and stay as-is (exactly
  like real TPC-H scaling);
* document text gets a per-replica vowel rotation and a replica tag token —
  WITHOUT this, every doc would have 9 verbatim near-duplicates and the
  dedup/LSH workloads would degenerate into quadratic pair blow-ups that
  say nothing about honest 10x scaling;
* embeddings get a per-replica cyclic rotation of the vector (JVM-side
  slice+concat), which preserves norms but decorrelates replicas, keeping
  ANN/top-k workloads honest;
* event timestamps keep their range (the stream gets denser, like a busier
  service), user/event ids shift.

Output: $OUT (default /root/repo/.testdata-sf1), one parquet dir per table.
Run:  python tools/make_sf1.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from unstructured_data_pipeline_spark import get_spark

SRC = os.environ.get("SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT", "/root/repo/.testdata-sf1")
REPLICAS = int(os.environ.get("REPLICAS", "10"))
STRIDE = 1_000_000_000

VOWEL_ROTS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
              "aeiou"[::-1], "eioua"[::-1], "iouae"[::-1], "ouaei"[::-1], "uaeio"[::-1]]
CONS_ROTS = ["rstln", "stlnr", "tlnrs", "lnrst", "nrstl",
             "rstln"[::-1], "stlnr"[::-1], "tlnrs"[::-1], "lnrst"[::-1], "nrstl"[::-1]]


def shifted(df, r: int, key_cols: list[str]):
    out = df
    for c in key_cols:
        out = out.withColumn(c, (F.col(c) + F.lit(r * STRIDE)).cast("long"))
    return out


def build(spark, src: str, out: str, replicas: int) -> None:
    """Write the scaled fixture (see module docstring).  Split from main()
    so tests can drive it against the session fixture (one JVM) with a
    tiny REPLICAS count."""
    os.makedirs(out, exist_ok=True)
    t_all = time.perf_counter()

    rd = lambda t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))  # noqa: E731

    # fixed-cardinality dims: copy through
    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))

    plans = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in plans.items():
        base = rd(t)
        parts = [shifted(base, r, keys) for r in range(replicas)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"# {t}: written", file=sys.stderr)

    # documents: per-replica vowel rotation + tag token breaks verbatim
    # near-duplication across replicas (see module docstring)
    docs = rd("documents")
    parts = []
    for r in range(replicas):
        d = shifted(docs, r, ["doc_id"])
        if r > 0:
            # two independent rotation axes (vowels x consonants) give
            # len(VOWEL_ROTS)^2 = 100 distinct transforms: without the
            # second axis, replicas 10 apart were near-identical and an
            # sf10 build degenerated into ~10-copy near-dup groups (4M+
            # LSH pairs — a fixture artifact, not a corpus property)
            cons = CONS_ROTS[(r // len(VOWEL_ROTS)) % len(CONS_ROTS)]
            d = d.withColumn(
                "text",
                F.concat(
                    F.translate(
                        F.col("text"),
                        "aeiourstln",
                        VOWEL_ROTS[r % len(VOWEL_ROTS)] + cons,
                    ),
                    F.lit(f" rep{r}"),
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(d)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    print("# documents: written", file=sys.stderr)

    # embeddings: cyclic vector rotation per replica (norm-preserving)
    emb = rd("embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for r in range(replicas):
        e = shifted(emb, r, ["vec_id"])
        k = r % dim
        if k:
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, dim - k),
                    F.slice("embedding", 1, k),
                ).cast("array<float>"),
            )
        if r >= dim:
            # second decorrelation axis once rotations wrap (REPLICAS can
            # exceed dim): whole-vector negation preserves norms and
            # WITHIN-replica structure but flips the sign of any
            # cross-replica cosine against an unflipped twin — without it
            # replica r and r-dim were identical and near-dup/ANN outputs
            # exploded at sf10
            e = e.withColumn(
                "embedding",
                F.transform("embedding", lambda x: -x).cast("array<float>"),
            )
        parts.append(e)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    print("# embeddings: written", file=sys.stderr)

    for t in list(plans) + ["documents", "embeddings", "region", "nation"]:
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"# {t}: {n} rows", file=sys.stderr)
    print(f"# total {time.perf_counter() - t_all:.1f}s", file=sys.stderr)


def main() -> None:
    spark = get_spark(app_name="make-sf1", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, SRC, OUT, REPLICAS)
    spark.stop()


if __name__ == "__main__":
    main()
