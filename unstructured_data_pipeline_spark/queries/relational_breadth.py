"""36-43: exact jaccard, near-dup, DML upsert, TPC-H q6/q10/q14/q18

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import DD, F, SIM, TX, Window, _c, _cents, _docs_pipeline_eav, _events, _heavy, _par, _t
from .dedup_text import _kmeans_sql
from .similarity_events import _DOT

# ---------------------------------------------------------------------------
# 36-43: exact n-gram jaccard, embedding near-dup, rolling fingerprint,
# DML upsert, TPC-H q6/q10/q14/q18 (relational breadth)


def history_documents_sparksql(spark, sf_dir):
    """The same History documents query expressed through the ``spark.sql``
    surface in the reference's OWN shape — correlated scalar COUNT subquery
    (J2) and EXISTS semi-join (P5/J3), which Catalyst decorrelates into the
    aggregate+join plan the DataFrame variant builds by hand
    (`app.py:698-741`; SURVEY §2.3, §4)."""
    eav = _docs_pipeline_eav(spark, sf_dir)
    eav.createOrReplaceTempView("udp_sql_eav")
    docs = _t(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("string").alias("file_ref")
    ).createOrReplaceTempView("udp_sql_ocr")
    return spark.sql(
        """
        SELECT DISTINCT e.file_ref,
               e.class_name,
               regexp_replace(split_part(e.file_url, '/', 1), '^@', '') AS stage,
               (SELECT COUNT(*) FROM udp_sql_eav d2
                WHERE d2.file_ref = e.file_ref
                  AND d2.class_name = e.class_name) AS fields_extracted,
               EXISTS(SELECT 1 FROM udp_sql_ocr o
                      WHERE o.file_ref = e.file_ref) AS has_ocr
        FROM udp_sql_eav e
        """
    )


def dedup_ngram_jaccard(spark, sf_dir):
    """EXACT word-3-gram Jaccard near-dup pairs via the prefix-filtered
    SSJoin (no LSH) — same planted near-dups as the minhash query, so the
    two methods are directly comparable."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 2, 1000000), " ").alias("text"),
    )
    corpus = d.unionByName(near)
    # prefix_filter=True is the operator default and the 100 TB shape: the
    # |s| - ceil(t*|s|) + 1 rarest shingles bound the posting self-join, so
    # ultra-common shingles never explode it.  The exhaustive inverted-index
    # variant (slightly faster at fixture scale, quadratic in posting-list
    # length at corpus scale) survives as a fixture-only parity check —
    # tests/test_units.py asserts both paths return IDENTICAL pairs.
    return DD.ngram_jaccard_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.5, prefix_filter=True
    )


def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric containment dedup (`dedup.containment_pairs`): directed
    pairs where >= 80% of doc A's 3-gram shingles appear in doc B — the
    truncated-mirror / quoted-article / boilerplate-wrapped case symmetric
    Jaccard misses (a fully-contained short doc scores Jaccard ~|A|/|B|
    but containment 1.0).  Planted: every 7th doc gets a 12-word truncated
    copy whose shingle set is a subset of the original's.  Scale shape:
    only the CONTAINED side indexes a rarest-shingles prefix (the
    pigeonhole needs just floor((1-t)|A|)+1 of A's shingles), the other
    side keeps full postings, and a |B| >= t*|A| length filter prunes
    impossible pairs before the aggregation.  The oracle is the exhaustive
    intersect-count form — candidates are only an optimization, so the
    hash gate proves the prefix path loses nothing."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    trunc = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 12), " ").alias(
            "text"
        ),
    )
    corpus = d.unionByName(trunc)
    out = DD.containment_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.8, min_shingles=5
    )
    return out.select(
        "a", "b", F.round("containment", 6).alias("containment_r")
    ).orderBy("a", "b")


DEDUP_CONTAINMENT_SQL = """
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 5000000, array_to_string(string_split(text, ' ')[1:12], ' ')
  FROM documents WHERE doc_id % 7 = 0
),
toks AS (SELECT id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT DISTINCT id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM toks
),
cnt AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT x.id AS a, y.id AS b, COUNT(*) AS i
  FROM sh x JOIN sh y ON y.s = x.s AND x.id <> y.id
  GROUP BY 1, 2
)
SELECT a, b, round(CAST(i AS DOUBLE) / na.n, 6) AS containment_r
FROM inter JOIN cnt na ON na.id = a
WHERE na.n >= 5 AND CAST(i AS DOUBLE) / na.n >= 0.8
ORDER BY a, b
"""


def dedup_ngram_jaccard_prefix(spark, sf_dir):
    """EXACT word-3-gram Jaccard near-dup pairs via the PREFIX-FILTERED
    SSJoin (the operator default and the 100 TB shape): shingles ranked by
    global frequency, only the |s| - ceil(t*|s|) + 1 rarest shingles of each
    doc are indexed, so ultra-common shingles never explode the posting
    join.  Identical output to ``dedup_ngram_jaccard`` (identity-tested);
    registered separately so the scale path carries its own oracle hash
    gate and bench number (VERDICT r1 #3)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    near = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 2, 1000000), " ").alias("text"),
    )
    corpus = d.unionByName(near)
    return DD.ngram_jaccard_pairs(
        corpus, "doc_id", "text", n=3, threshold=0.5, prefix_filter=True
    )


DEDUP_NGRAM_SQL = """
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000, array_to_string(string_split(text, ' ')[2:], ' ')
  FROM documents WHERE doc_id % 5 = 0
),
toks AS (SELECT id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT DISTINCT id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM toks
),
cnt AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT x.id AS a, y.id AS b, COUNT(*) AS i
  FROM sh x JOIN sh y ON y.s = x.s AND x.id < y.id
  GROUP BY 1, 2
)
SELECT a, b, CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
FROM inter JOIN cnt na ON na.id = a JOIN cnt nb ON nb.id = b
WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.5
"""


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label (sum-of-block^2
    join, the 10^9-vector shape).  The fixture has no natural near-dups
    (max within-label cos ~0.51), so every vec_id % 10 == 0 re-appears
    under id+100000 with +0.25 on its first coordinate (all-double
    arithmetic -> bit-identical in both engines); threshold 0.9 cleanly
    separates planted pairs from the natural background."""
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
    out = SIM.embedding_near_dup_blocked(
        corpus, id_col="vec_id", vec_col="emb", block_col="label", threshold=0.9
    )
    return out.select("a", "b", F.round("cos", 6).alias("cos_r"))


EMB_NEARDUP_SQL = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb, label
  FROM embeddings
),
corpus AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(generate_series(1, 64),
                        i -> CASE WHEN i = 1 THEN emb[i] + 0.25 ELSE emb[i] END),
         label
  FROM base WHERE vec_id % 10 = 0
),
unitv AS (
  SELECT vec_id, label,
         list_transform(emb, x -> x / sqrt({_DOT.format(a='emb', b='emb')})) AS u
  FROM corpus
)
SELECT x.vec_id AS a, y.vec_id AS b,
       round({_DOT.format(a='x.u', b='y.u')}, 6) AS cos_r
FROM unitv x JOIN unitv y ON x.label = y.label AND x.vec_id < y.vec_id
WHERE {_DOT.format(a='x.u', b='y.u')} >= 0.9
"""


def boilerplate_removal_report(spark, sf_dir):
    """Cross-document boilerplate removal (the CCNet / RefinedWeb line-
    dedup step): split each document into paragraphs, compute every
    paragraph's DOCUMENT FREQUENCY across the corpus, strip paragraphs
    appearing in >= 5 documents (headers / footers / cookie banners), and
    rebuild each document from its surviving paragraphs in original order.
    The fixture corpus plants the boilerplate: every doc_id % 3 == 0 doc
    gets a canned header paragraph, every doc_id % 4 == 0 a canned footer
    (unique bodies stay df=1).  Output hash-gates the REBUILT text via
    md5, so a wrong paragraph order, a lost paragraph, or an unstripped
    banner all flip the row.  Scale shape: one explode, one groupBy on the
    paragraph (df counts partial-aggregate map-side), one equi-join back,
    one per-doc rebuild — nothing quadratic, no driver loop."""
    header = "subscribe to the newsletter for updates"
    footer = "all rights reserved contact us terms of service"
    docs = _heavy(spark, sf_dir, "documents").select("doc_id", "text")
    with_hdr = F.when(
        F.col("doc_id") % 3 == 0, F.concat_ws("\n", F.lit(header), F.col("text"))
    ).otherwise(F.col("text"))
    text2 = F.when(
        F.col("doc_id") % 4 == 0, F.concat_ws("\n", with_hdr, F.lit(footer))
    ).otherwise(with_hdr)
    paras = docs.select(
        "doc_id", F.posexplode(F.split(text2, "\n")).alias("pos", "para")
    )
    df_freq = paras.groupBy("para").agg(
        F.countDistinct("doc_id").alias("df")
    )
    kept = paras.join(df_freq, "para").filter(F.col("df") < 5)
    n_paras = paras.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_paras"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("txt"),
    )
    return (
        n_paras.join(rebuilt, "doc_id")
        .select(
            "doc_id",
            "n_paras",
            "n_kept",
            F.md5(F.col("txt")).alias("rebuilt_md5"),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_SQL = """
WITH bp AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN h || chr(10)
              || 'all rights reserved contact us terms of service'
              ELSE h END AS text2
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN 'subscribe to the newsletter for updates' || chr(10) || text
                ELSE text END AS h
    FROM documents
  )
),
paras AS (
  SELECT doc_id, u.pos AS pos, u.para AS para
  FROM (
    SELECT doc_id,
           unnest(list_transform(string_split(text2, chr(10)),
                  (x, i) -> struct_pack(pos := i, para := x))) AS u
    FROM bp
  )
),
df AS (SELECT para, COUNT(DISTINCT doc_id) AS df FROM paras GROUP BY 1),
kept AS (SELECT p.* FROM paras p JOIN df USING (para) WHERE df.df < 5),
np AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras FROM paras GROUP BY 1),
rb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(para, chr(10) ORDER BY pos)) AS rebuilt_md5
  FROM kept GROUP BY 1
)
SELECT np.doc_id, n_paras, n_kept, rebuilt_md5
FROM np JOIN rb ON rb.doc_id = np.doc_id
ORDER BY np.doc_id
"""


def semdedup_report(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    cluster-then-pairwise — k-means over the embedding corpus, cosine
    near-dup search ONLY within each cluster, keep the lower-id row of
    every near-dup pair.  Clustering caps the quadratic pair search at
    sum(|cluster|^2) with clusters sized by k — the shape that makes
    embedding dedup tractable at 10^9 vectors (vs all-pairs); the
    blocked-BLAS kernel then does each cluster's similarity matrix as one
    matmul.  The fixture corpus is the dedup_embedding_cosine planting
    (every vec_id % 10 == 0 re-appears +0.25 on dim 1 under id+100000), so
    planted pairs co-cluster and score >= 0.9 while the natural background
    tops out ~0.51.  The ENTIRE pipeline — iterative Lloyd's, blocking,
    pair scoring, survivor rule — is mirrored exactly in DuckDB (kmeans
    exactness contract in operators/clustering.py).  Output: per-cluster
    corpus size, dropped count, kept count."""
    from unstructured_data_pipeline_spark.operators import clustering as CL
    from unstructured_data_pipeline_spark.operators import similarity as SIM

    emb = _heavy(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "emb", lambda x, i: F.when(i == 0, x + F.lit(0.25)).otherwise(x)
        ).alias("emb"),
    )
    corpus = emb.unionByName(planted)
    assign = CL.kmeans_assignments(
        corpus, "vec_id", "emb", k=8, iters=2, scale=1000, train_cap=800
    ).select(F.col("id").alias("vec_id"), "k")
    blocked = corpus.join(assign, "vec_id")
    pairs = SIM.embedding_near_dup_blocked(
        blocked, id_col="vec_id", vec_col="emb", block_col="k", threshold=0.9
    )
    # survivor rule: the lower id of each near-dup pair wins, so a row is
    # dropped iff it appears as the pair's `b` (pairs have a < b)
    dropped = pairs.select(F.col("b").alias("vec_id")).distinct()
    flagged = blocked.join(
        dropped.withColumn("_drop", F.lit(1)), "vec_id", "left"
    )
    return (
        flagged.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("_drop").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("_drop")).alias("n_kept"),
        )
        .orderBy("k")
    )


_SEMDEDUP_SOURCE = """
SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
FROM embeddings
UNION ALL
SELECT vec_id + 100000,
       list_transform(generate_series(1, 64),
                      i -> CASE WHEN i = 1 THEN embedding[i]::DOUBLE + 0.25
                           ELSE embedding[i]::DOUBLE END)
FROM embeddings WHERE vec_id % 10 = 0
"""

_SEMDEDUP_TAIL = f"""
, unitv AS (
  SELECT s.vec_id, a.k,
         list_transform(s.embedding,
           x -> x / sqrt({_DOT.format(a='s.embedding', b='s.embedding')})) AS u
  FROM src s JOIN a3 a ON a.id = s.vec_id
),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM unitv x JOIN unitv y ON x.k = y.k AND x.vec_id < y.vec_id
  WHERE {_DOT.format(a='x.u', b='y.u')} >= 0.9
),
dropped AS (SELECT DISTINCT b AS vec_id FROM pairs)
SELECT u.k,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept
FROM unitv u LEFT JOIN dropped d ON d.vec_id = u.vec_id
GROUP BY u.k ORDER BY u.k
"""

SEMDEDUP_SQL = _kmeans_sql(
    source_sql=_SEMDEDUP_SOURCE, tail_sql=_SEMDEDUP_TAIL, train_cap=800
)


def bloom_join_prune_report(spark, sf_dir):
    """Bloom-filter join pruning (operators/bloom.py): a selective
    customer-segment filter builds a few-KiB Bloom filter (one tiny agg +
    bounded driver round-trip), whose membership test prunes the orders
    scan BEFORE the shuffle; the exact left-semi join then removes Bloom
    false positives, so output == plain semi join (the oracle).  The
    explicit form of Spark's runtime row-level bloom pruning — composable,
    reusable across jobs, scan-side at 100 TB.  Reference counterpart: the
    warehouse's sideways scan pruning the app relies on implicitly
    (app/Auto-Magic Document AI.py:233-260)."""
    from unstructured_data_pipeline_spark.operators.bloom import bloom_semi_join

    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    pruned = bloom_semi_join(orders, cust, "o_custkey", "c_custkey", fpr=0.01)
    return (
        pruned.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


BLOOM_PRUNE_SQL = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM({_c('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def lm_perplexity_filter(spark, sf_dir):
    """CCNet-style n-gram language-model quality scoring: train a bigram
    LM on the corpus itself (token/bigram count tables — two groupBys),
    then score every document by its per-bigram cross-entropy under
    add-one smoothing, ``-avg ln((c(w1,w2)+1)/(c(w1)+V))``; high scores ==
    improbable text (gibberish / OCR noise), the signal CCNet thresholds
    into head/middle/tail quality buckets.  All counts integer-exact until
    one final ln/avg (rounded, the entropy-query determinism pattern);
    train + score is 3 shuffles (unigram agg, bigram agg, score join) —
    nothing quadratic, LM tables shuffle-join against doc bigrams so a
    100 TB corpus never broadcasts or collects them.  Buckets use FIXED
    calibration thresholds (how CCNet deploys: cutoffs come from a
    held-out calibration pass, scoring stays row-local) — no global sort
    or single-partition window anywhere in the plan."""
    d = _heavy(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
        ).alias("toks"),
    ).filter(F.size("toks") >= 2)
    # bigrams feeds FOUR consumers (unigram counts, bigram counts, vocab,
    # score join) — persist so the tokenize+explode runs once, not four
    # times; MEMORY_AND_DISK spills at corpus scale (or recompute by
    # dropping the persist — a scan-cost-vs-memory knob, not a plan change)
    from pyspark import StorageLevel

    bigrams = (
        toks.select(
            "doc_id",
            F.posexplode(F.slice("toks", 1, F.size("toks") - 1)).alias(
                "pos", "w1"
            ),
            F.col("toks"),
        )
        .select(
            "doc_id", "w1", F.element_at("toks", F.col("pos") + 2).alias("w2")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    uni = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = bigrams.select(F.col("w1").alias("w")).union(
        bigrams.select("w2")
    ).distinct().count()
    scored = (
        bigrams.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(
                    F.log(
                        (F.col("c2") + 1).cast("double")
                        / (F.col("c1") + F.lit(vocab)).cast("double")
                    )
                ),
                6,
            ).alias("cross_entropy"),
        )
    )
    bucket = (
        F.when(F.col("cross_entropy") < _LM_HEAD_MAX, F.lit("head"))
        .when(F.col("cross_entropy") < _LM_MIDDLE_MAX, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "cross_entropy",
        bucket.alias("quality_bucket"),
    ).orderBy("doc_id")


# CCNet-style calibration cutoffs (fixed at scoring time; see docstring).
# Placed between the fixture corpus's observed score modes so all three
# buckets are populated at every SF; both engines compare the identically
# rounded value against the identical literal, so no float-boundary risk.
_LM_HEAD_MAX = 3.39
_LM_MIDDLE_MAX = 3.41

LM_PERPLEXITY_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     t -> t <> '') AS toks
  FROM documents
), toks2 AS (SELECT * FROM toks WHERE len(toks) >= 2),
bigrams AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
  FROM (
    SELECT doc_id,
           unnest(list_transform(toks[2:],
                  (x, i) -> struct_pack(w1 := toks[i], w2 := x))) AS u
    FROM toks2
  )
),
uni AS (SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY 1),
bi  AS (SELECT w1, w2, COUNT(*) AS c2 FROM bigrams GROUP BY 1, 2),
v   AS (SELECT COUNT(*) AS vocab FROM
        (SELECT w1 AS w FROM bigrams UNION SELECT w2 FROM bigrams)),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         round(-AVG(ln(CAST(c2 + 1 AS DOUBLE)
                       / CAST(c1 + vocab AS DOUBLE))), 6) AS cross_entropy
  FROM bigrams JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams, cross_entropy,
       CASE WHEN cross_entropy < {_LM_HEAD_MAX} THEN 'head'
            WHEN cross_entropy < {_LM_MIDDLE_MAX} THEN 'middle'
            ELSE 'tail' END AS quality_bucket
FROM scored ORDER BY doc_id
"""


def exact_substring_dedup_report(spark, sf_dir):
    """Exact duplicated-span detection (the Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better' substring-dedup step,
    re-expressed relationally): find every 8-token span occurring in >= 2
    documents and report, per affected doc, how many spans and what
    fraction of its tokens sit inside duplicated text.  The suffix-array
    the paper builds is a single-machine structure; the Spark-native
    equivalent is rolling W-token shingles -> one groupBy for cross-doc
    counts -> join back -> positional coverage union, all linear in corpus
    size with W-bounded blowup, no suffix sort.  The fixture corpus has
    little natural cross-doc overlap, so every doc_id % 11 == 0 doc gets a
    canned 12-token sentence appended — a planted duplicated span the
    report must cover (5 spans, 12 covered tail tokens per planted doc)."""
    W = 8
    canned = (
        "the quick brown fox jumps over the lazy dog near the riverbank"
    )
    d = _heavy(spark, sf_dir, "documents").select("doc_id", "text")
    text2 = F.when(
        F.col("doc_id") % 11 == 0, F.concat_ws(" ", F.col("text"), F.lit(canned))
    ).otherwise(F.col("text"))
    toks = d.select("doc_id", TX.tokens_ws(text2).alias("w"))
    spans = toks.select(
        "doc_id",
        F.posexplode(TX.word_shingles_from_tokens(F.col("w"), W)).alias(
            "pos", "s"
        ),
    )
    dup = (
        spans.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("docs"))
        .filter(F.col("docs") >= 2)
        .select("s")
    )
    hit = spans.join(dup, "s")
    n_spans = hit.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_spans"))
    covered = (
        hit.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + W - 1)).alias(
                "tp"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    totals = toks.select("doc_id", F.size("w").alias("n_tokens"))
    return (
        totals.join(n_spans, "doc_id")
        .join(covered, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_spans",
            "covered_tokens",
            F.round(
                F.col("covered_tokens") / F.col("n_tokens"), 6
            ).alias("dup_coverage"),
        )
        .orderBy("doc_id")
    )


EXACT_SUBSTRING_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text ||
              ' the quick brown fox jumps over the lazy dog near the riverbank'
              ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
spans AS (
  SELECT doc_id, u.pos AS pos, u.s AS s
  FROM (
    SELECT doc_id,
           unnest(list_transform(w[8:],
                  (x, i) -> struct_pack(pos := i - 1,
                                        s := array_to_string(w[i:i+7], ' ')))) AS u
    FROM toks
  )
),
dup AS (SELECT s FROM spans GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
hit AS (SELECT p.doc_id, p.pos FROM spans p JOIN dup USING (s)),
ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans FROM hit GROUP BY 1),
cov AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS covered_tokens
  FROM (SELECT DISTINCT doc_id, pos + g.i AS tp
        FROM hit, generate_series(0, 7) AS g(i))
  GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens FROM toks)
SELECT tot.doc_id, n_tokens, n_dup_spans, covered_tokens,
       round(CAST(covered_tokens AS DOUBLE) / n_tokens, 6) AS dup_coverage
FROM tot JOIN ns ON ns.doc_id = tot.doc_id JOIN cov ON cov.doc_id = tot.doc_id
ORDER BY tot.doc_id
"""


def fuzzy_name_dedup(spark, sf_dir):
    """Fuzzy entity dedup: blocked edit-distance join.  Every c_custkey %
    97 == 0 customer re-appears with a typo'd name; blocking on the name's
    last-4 chars (untouched by the typo) keeps the candidate join tiny, and
    exact Levenshtein <= 2 verifies — the record-linkage standard
    (block -> compare), never an all-pairs scan."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    typo = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 20000000).alias("c_custkey"),
        F.regexp_replace("c_name", "Customer", "Custoner").alias("c_name"),
    )
    corpus = c.unionByName(typo).withColumn("blk", F.substring("c_name", -4, 4))
    a = corpus.select(
        F.col("c_custkey").alias("a"), F.col("c_name").alias("name_a"), "blk"
    )
    b = corpus.select(
        F.col("c_custkey").alias("b"), F.col("c_name").alias("name_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev") <= 2)
        .select("a", "b", "lev")
    )


FUZZY_NAME_SQL = """
WITH corpus AS (
  SELECT c_custkey, c_name FROM customer
  UNION ALL
  SELECT c_custkey + 20000000, replace(c_name, 'Customer', 'Custoner')
  FROM customer WHERE c_custkey % 97 = 0
),
blocked AS (SELECT c_custkey, c_name, right(c_name, 4) AS blk FROM corpus)
SELECT x.c_custkey AS a, y.c_custkey AS b, levenshtein(x.c_name, y.c_name) AS lev
FROM blocked x JOIN blocked y ON x.blk = y.blk AND x.c_custkey < y.c_custkey
WHERE levenshtein(x.c_name, y.c_name) <= 2
"""


def doc_fingerprint_rolling(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing-lite): all char
    8-gram hashes per doc; emit gram count, distinct-gram count, and the
    MIN-hash fingerprint.

    Hash-minimizing formulation: gram count is pure arithmetic
    (len - k + 1), the raw substrings are DISTINCTed first, and md5 runs
    once per distinct gram (min over distinct == min over all; distinct
    md5s == distinct grams absent collisions, identically in both
    engines).  Materialized as its own projection so the distinct array is
    computed once, not re-inlined per consuming expression."""
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
        F.array_min(F.transform("_u", lambda g: F.md5(g))).alias("fp_min"),
    )


FINGERPRINT_SQL = """
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(text) - 7, 0)),
                        i -> md5(substr(text, i, 8))) AS grams
  FROM documents
)
SELECT doc_id, len(grams) AS n_grams,
       len(list_distinct(grams)) AS n_uniq_grams,
       list_min(grams) AS fp_min
FROM g ORDER BY doc_id
"""


def dml_upsert_customers(spark, sf_dir):
    """MERGE-semantics upsert (D1) without Delta: source rows (every 100th
    customer re-balanced into segment 'UPDATED', plus brand-new keys) win on
    key collision, unmatched target rows survive.  Verified compactly via a
    per-segment rollup of the merged table."""
    from unstructured_data_pipeline_spark.operators.dml import upsert

    cust = _t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 100 == 0).withColumns(
        {
            "c_acctbal": F.col("c_acctbal") + 1000.0,
            "c_mktsegment": F.lit("UPDATED"),
        }
    )
    fresh = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("FRESH").alias("c_mktsegment"),
    )
    merged = upsert(cust, updates.unionByName(fresh), keys=["c_custkey"])
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
    )


def dml_delete_append_lifecycle(spark, sf_dir):
    """DELETE WHERE (D3) + append (D4) through the REAL table layer
    (`operators/dml.ParquetTable`: versioned snapshots, atomic CURRENT
    pointer): customers land in a scratch table, negative-balance
    AUTOMOBILE rows are deleted, zeroed ARCHIVED replacements appended,
    and the per-segment rollup is read back from the published snapshot —
    so the driver row covers the delete->publish->append->read path, not
    just the DataFrame algebra."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.operators.dml import ParquetTable

    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="udp_dml_")
    gone = (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") < 0)
    t = ParquetTable(spark, root, "customers_scratch", cust.schema)
    t.append(cust)
    t.delete_where(gone)
    archived = cust.filter(gone).select(
        (F.col("c_custkey") + 20000000).alias("c_custkey"),
        F.concat(F.lit("ARCH#"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("ARCHIVED").alias("c_mktsegment"),
    )
    t.append(archived)
    out = (
        t.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
        .cache()
    )
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


DML_DELETE_APPEND_SQL = f"""
WITH gone AS (
  SELECT * FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0
),
final AS (
  SELECT * FROM customer
  WHERE NOT (c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0)
  UNION ALL
  SELECT c_custkey + 20000000, 'ARCH#' || c_name, c_nationkey, 0.0, 'ARCHIVED'
  FROM gone
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       SUM({_c('c_acctbal')}) / 100.0 AS sum_acctbal
FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def merge_partitioned_lifecycle(spark, sf_dir):
    """Partition-pruned MERGE + DELETE through the REAL partitioned table
    layer (`operators/dml.PartitionedParquetTable`): customers land in a
    scratch table hive-partitioned by market segment, a MERGE batch
    updates/inserts ONLY the BUILDING partition (untouched partitions are
    carried over as hardlinks — zero data rewritten, asserted by unit
    tests in tests/test_partitioned_table.py), a pruned DELETE drops
    negative balances from MACHINERY only, and the per-segment rollup is
    read back from the published snapshot.  This is the scale-grade MERGE
    shape (VERDICT r3 "What's missing" #3): cost is O(touched partitions
    + batch), not O(table), per call.  Reference upsert targets:
    `app.py:185-195,548-554,920-926`."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.operators.dml import (
        PartitionedParquetTable,
    )

    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="udp_pmerge_")
    t = PartitionedParquetTable(
        spark, root, "customers_part", cust.schema, partition_by=["c_mktsegment"]
    )
    t.ensure()
    t.append(cust)
    # MERGE batch: bump every 50th BUILDING customer's balance by 1000 and
    # insert fresh BUILDING rows — keys include the partition column, so
    # the merge is statically partition-local (no complement scan)
    upd = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 50 == 0)
    ).withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
    ins = (
        cust.filter(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 97 == 0)
        )
        .select(
            (F.col("c_custkey") + 30000000).alias("c_custkey"),
            F.concat(F.lit("NEW#"), F.col("c_name")).alias("c_name"),
            "c_nationkey",
            F.lit(10.0).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    t.upsert(upd.unionByName(ins), keys=["c_custkey", "c_mktsegment"])
    t.delete_where(F.col("c_acctbal") < 0, partitions=[("MACHINERY",)])
    out = (
        t.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
        .cache()
    )
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


MERGE_PARTITIONED_SQL = f"""
WITH upd AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey % 50 = 0
),
ins AS (
  SELECT c_custkey + 30000000, 'NEW#' || c_name, c_nationkey, 10.0,
         c_mktsegment
  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey % 97 = 0
),
merged AS (
  SELECT * FROM customer
  WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 50 = 0)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
),
final AS (
  SELECT * FROM merged
  WHERE NOT (c_mktsegment = 'MACHINERY' AND c_acctbal < 0)
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       SUM({_c('c_acctbal')}) / 100.0 AS sum_acctbal
FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def session_defaults_contract(spark, sf_dir):
    """Driver-checked contract for the session/metadata surfaces the
    reference leans on: CURRENT_ROLE/DATABASE-style context functions
    (`app.py` queries them for display; here the Spark equivalents are
    current_catalog()/current_database(), whose vanilla-session values are
    fixed) and the DDL's DEFAULT CURRENT_TIMESTAMP() columns
    (`setup_database.sql:49-50,59,71,80,89`): the pipeline's
    processed_at/extracted_at must arrive non-null and current (within a
    generous ±2h of the engines' wall clocks — both engines observe the
    same host clock, so the boolean is environment-stable).  Upgrades the
    last metadata rows of SURVEY §2.7 from unit-only to driver evidence."""
    from unstructured_data_pipeline_spark.pipelines.batch import (
        run_document_pipeline,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").cast("string").alias("file_ref"),
            F.lit("").alias("file_url"),
            "text",
        )
    )
    out = run_document_pipeline(docs, with_ocr=False)
    lo = F.current_timestamp().cast("timestamp_ntz") - F.expr("INTERVAL 2 HOURS")
    hi = F.current_timestamp().cast("timestamp_ntz") + F.expr("INTERVAL 2 HOURS")
    ts_ok = out.processed.agg(
        (
            (F.count(F.lit(1)) == F.count("processed_at"))
            & (F.min("processed_at") > lo)
            & (F.max("processed_at") < hi)
        ).alias("ok")
    )
    eav_ok = out.extracted_fields.agg(
        (F.count(F.lit(1)) == F.count("extracted_at")).alias("ok")
    )
    checks = spark.range(1).select(
        (F.expr("current_catalog()") == "spark_catalog").alias("catalog_ok"),
        (F.current_database() == "default").alias("database_ok"),
    )
    return (
        checks.select(F.lit("catalog_is_spark_catalog").alias("check_name"),
                      F.col("catalog_ok").alias("ok"))
        .unionByName(
            checks.select(F.lit("database_is_default").alias("check_name"),
                          F.col("database_ok").alias("ok"))
        )
        .unionByName(
            ts_ok.select(F.lit("default_timestamps_current").alias("check_name"),
                         "ok")
        )
        .unionByName(
            eav_ok.select(F.lit("eav_timestamps_nonnull").alias("check_name"),
                          "ok")
        )
        .orderBy("check_name")
    )


SESSION_DEFAULTS_SQL = """
SELECT * FROM (VALUES
  ('catalog_is_spark_catalog', TRUE),
  ('database_is_default', TRUE),
  ('default_timestamps_current', TRUE),
  ('eav_timestamps_nonnull', TRUE)
) AS t(check_name, ok)
ORDER BY check_name
"""


def prompt_normalization_contract(spark, sf_dir):
    """AI6 prompt-schema normalization as a driver-checked contract: the
    eight canonical input shapes from the reference's normalizer
    (`app.py:162-183` — plain dict, class-wrapped dict, ["q", ...] list,
    bare string, JSON text, non-string values, empty, list-of-questions)
    run through the REAL normalizer inside an Arrow-batched mapInPandas
    (the same engine path the extraction pipeline uses), emitting
    (case_id, kind, n_fields, normalized) rows.  The oracle states the
    spec's expected outputs literally, so a normalizer regression on any
    shape flips the hash.  Edge-case depth beyond these eight stays in the
    hypothesis property suite (tests/test_units.py)."""
    from typing import Iterator

    import pandas as pd

    cases = [
        (1, '{"total": "T?", "date": "D?"}', "invoice"),
        (2, '{"invoice": {"total": "T?"}}', "invoice"),
        (3, '["q", "Summarize."]', "invoice"),
        (4, "What is it?", "contract"),
        (5, '{"a": "b"}', "contract"),
        (6, '{"a": 3}', "contract"),
        (7, "", "contract"),
        (8, '["one", "two"]', "contract"),
    ]
    df = spark.createDataFrame(cases, "case_id int, raw string, cls string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from unstructured_data_pipeline_spark.functions.prompts import (
            normalize_prompt_schema,
            prompt_fields,
        )
        from unstructured_data_pipeline_spark.functions.variant import (
            canonical_json,
        )

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                schema = normalize_prompt_schema(r["raw"], r["cls"])
                rows.append(
                    {
                        "case_id": int(r["case_id"]),
                        "kind": "dict" if isinstance(schema, dict) else "q",
                        "n_fields": len(prompt_fields(schema)),
                        "normalized": canonical_json(schema),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["case_id", "kind", "n_fields", "normalized"]
            )

    return df.mapInPandas(
        run, "case_id int, kind string, n_fields int, normalized string"
    ).orderBy("case_id")


PROMPT_NORM_SQL = """
SELECT * FROM (VALUES
  (1, 'dict', 2, '{"date":"D?","total":"T?"}'),
  (2, 'dict', 1, '{"total":"T?"}'),
  (3, 'q',    1, '["q","Summarize."]'),
  (4, 'q',    1, '["q","What is it?"]'),
  (5, 'dict', 1, '{"a":"b"}'),
  (6, 'q',    1, '["q","Extract key facts for class contract."]'),
  (7, 'q',    1, '["q","Extract key facts for class contract."]'),
  (8, 'q',    1, '["q","one; two"]')
) AS t(case_id, kind, n_fields, normalized)
ORDER BY case_id
"""


def warehouse_bootstrap_report(spark, sf_dir):
    """S8 DDL bootstrap end-to-end: `catalog.bootstrap_warehouse` (CREATE
    IF NOT EXISTS for the five pipeline tables, `app.py:38-81` /
    `setup_database.sql:46-90`), `seed_invoice_prompts` (the static
    invoice seed, `setup_database.sql:129-142`, via D2 anti-insert — run
    TWICE to prove idempotence), then the reference's post-setup
    verification block (`setup_database.sql:145-168`) read back as
    (object_type, count) rows.  The expected counts are structural
    constants of the DDL (5 tables, 1 seeded class, 1 prompt row), so the
    oracle states them literally — a bootstrap that loses a table, double-
    seeds, or fails to seed flips the hash."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.catalog import (
        bootstrap_warehouse,
        seed_invoice_prompts,
        setup_verification,
    )

    root = tempfile.mkdtemp(prefix="udp_boot_")
    tables = bootstrap_warehouse(spark, root)
    seed_invoice_prompts(spark, tables)
    seed_invoice_prompts(spark, tables)  # idempotent: second run is a no-op
    out = setup_verification(spark, tables).cache()
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


WAREHOUSE_BOOTSTRAP_SQL = """
SELECT 'Tables' AS object_type, CAST(5 AS BIGINT) AS count
UNION ALL SELECT 'Stages', 0
UNION ALL SELECT 'Document Classes', 1
UNION ALL SELECT 'Prompt Rows', 1
ORDER BY object_type
"""


def catalog_counts_report(spark, sf_dir):
    """S4 catalog/metadata scan through the REAL warehouse layer: region /
    nation / customer land in scratch `ParquetTable`s and
    `catalog.verify_table_counts` (the INFORMATION_SCHEMA-style post-setup
    check, `setup_database.sql:148-161`) reports one (table_name,
    row_count) row per table.  Upgrades S4 from unit-only to driver-
    checked: the oracle recomputes each count straight from the fixture
    parquet, so a bootstrap/append/catalog-count bug flips the hash."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.catalog import verify_table_counts
    from unstructured_data_pipeline_spark.operators.dml import ParquetTable

    root = tempfile.mkdtemp(prefix="udp_cat_")
    tables = {}
    loads = []
    for name in ("region", "nation", "customer"):
        df = _t(spark, sf_dir, name)
        t = ParquetTable(spark, root, name, df.schema)
        tables[name] = t
        loads.append(lambda t=t, df=df: (t.ensure(), t.append(df)))
    # round 13: three independent scratch-table loads — overlap (guide §2.6)
    _par(*loads)
    out = verify_table_counts(spark, tables).cache()
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


CATALOG_COUNTS_SQL = """
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS row_count FROM customer
UNION ALL
SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
UNION ALL
SELECT 'region', CAST(COUNT(*) AS BIGINT) FROM region
ORDER BY table_name
"""


def table_time_travel_report(spark, sf_dir):
    """Snapshot retention + AS-OF reads through the REAL table layer
    (`operators/dml.ParquetTable(retain=3)`): the customer table is seeded
    (snapshot 1), a MERGE bumps every 100th customer's balance by 500
    (snapshot 2), negative balances are deleted (snapshot 3), and the
    report reads ALL THREE retained snapshots back — per-snapshot row
    count and balance sum — so the driver row covers publish, retention
    GC, and time-travel reads, not just the final state.  Reference-
    platform parity: Snowflake time travel / DATA_RETENTION (the
    reference's warehouse default); the versioned-snapshot layout gets it
    for free by keeping the last N immutable version dirs."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.operators.dml import ParquetTable

    cust = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="udp_tt_")
    t = ParquetTable(spark, root, "customers_tt", cust.schema, retain=3)
    t.ensure()
    t.append(cust)  # snapshot 1 (seed lands in the live version)
    t.upsert(
        cust.filter(F.col("c_custkey") % 100 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 500.0
        ),
        keys=["c_custkey"],
    )  # snapshot 2
    t.delete_where(F.col("c_acctbal") < 0)  # snapshot 3
    snaps = t.versions()
    assert len(snaps) == 3, snaps
    out = None
    for i, v in enumerate(snaps, start=1):
        s = (
            t.read_version(v)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
            )
            .select(F.lit(i).alias("snap_no"), "n_rows", "sum_acctbal")
        )
        out = s if out is None else out.unionByName(s)
    out = out.orderBy("snap_no").cache()
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


TIME_TRAVEL_SQL = f"""
WITH s1 AS (SELECT c_custkey, c_acctbal FROM customer),
s2 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 100 = 0 THEN c_acctbal + 500.0 ELSE c_acctbal END
           AS c_acctbal
  FROM customer
),
s3 AS (SELECT * FROM s2 WHERE c_acctbal >= 0),
r AS (
  SELECT 1 AS snap_no, CAST(COUNT(*) AS BIGINT) AS n_rows,
         SUM({_c('c_acctbal')}) / 100.0 AS sum_acctbal FROM s1
  UNION ALL
  SELECT 2, CAST(COUNT(*) AS BIGINT), SUM({_c('c_acctbal')}) / 100.0 FROM s2
  UNION ALL
  SELECT 3, CAST(COUNT(*) AS BIGINT), SUM({_c('c_acctbal')}) / 100.0 FROM s3
)
SELECT snap_no, n_rows, sum_acctbal FROM r ORDER BY snap_no
"""


def table_changes_stream_report(spark, sf_dir):
    """CDC / table-STREAMS parity (`operators/dml.snapshot_diff`): the
    customer table goes through the same real `ParquetTable` lifecycle as
    the time-travel report — seed (v1), a MERGE that UPDATES every 100th
    balance (+500) and INSERTS a synthetic row per 250th customer (v2),
    then a DELETE of negative balances (v3) — and the report is the
    row-level change accounting between consecutive retained snapshots:
    FULL OUTER key join + null-safe compare labels every key INSERT /
    UPDATE / DELETE / NOOP, exactly what a Snowflake stream on the table
    would emit per transition (reference platform's CDC surface; retention
    DDL `database/setup_database.sql:16-23`).  Scale: one key-shuffle per
    transition, row-local compares; downstream consumers read only the
    non-NOOP rows."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.operators.dml import (
        ParquetTable,
        snapshot_diff,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    root = tempfile.mkdtemp(prefix="udp_cdc_")
    t = ParquetTable(spark, root, "customers_cdc", cust.schema, retain=3)
    t.ensure()
    t.append(cust)  # v1
    bumped = cust.filter(F.col("c_custkey") % 100 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 500.0
    )
    inserted = cust.filter(F.col("c_custkey") % 250 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    t.upsert(bumped.unionByName(inserted), keys=["c_custkey"])  # v2
    t.delete_where(F.col("c_acctbal") < 0)  # v3
    v1, v2, v3 = t.versions()
    out = None
    for trans, (a, b) in enumerate(((v1, v2), (v2, v3)), start=1):
        d = snapshot_diff(
            t.read_version(a), t.read_version(b), keys=["c_custkey"]
        )
        s = d.groupBy("action").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c_custkey").alias("min_key"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
        ).select(F.lit(trans).alias("transition"), "action", "n_rows", "min_key", "sum_acctbal")
        out = s if out is None else out.unionByName(s)
    out = out.orderBy("transition", "action").cache()
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


TABLE_CHANGES_SQL = f"""
WITH s1 AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
s2 AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 100 = 0 THEN c_acctbal + 500.0 ELSE c_acctbal END
           AS c_acctbal
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_acctbal FROM customer
  WHERE c_custkey % 250 = 0
),
s3 AS (SELECT * FROM s2 WHERE c_acctbal >= 0),
d12 AS (
  SELECT 1 AS transition,
         CASE WHEN s1.c_custkey IS NULL THEN 'INSERT'
              WHEN s2.c_custkey IS NULL THEN 'DELETE'
              WHEN s1.c_name IS DISTINCT FROM s2.c_name
                OR s1.c_acctbal IS DISTINCT FROM s2.c_acctbal THEN 'UPDATE'
              ELSE 'NOOP' END AS action,
         COALESCE(s2.c_custkey, s1.c_custkey) AS k,
         COALESCE(s2.c_acctbal, s1.c_acctbal) AS bal
  FROM s1 FULL OUTER JOIN s2 ON s1.c_custkey = s2.c_custkey
),
d23 AS (
  SELECT 2 AS transition,
         CASE WHEN s2.c_custkey IS NULL THEN 'INSERT'
              WHEN s3.c_custkey IS NULL THEN 'DELETE'
              WHEN s2.c_name IS DISTINCT FROM s3.c_name
                OR s2.c_acctbal IS DISTINCT FROM s3.c_acctbal THEN 'UPDATE'
              ELSE 'NOOP' END AS action,
         COALESCE(s3.c_custkey, s2.c_custkey) AS k,
         COALESCE(s3.c_acctbal, s2.c_acctbal) AS bal
  FROM s2 FULL OUTER JOIN s3 ON s2.c_custkey = s3.c_custkey
),
u AS (SELECT * FROM d12 UNION ALL SELECT * FROM d23)
SELECT transition, action, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_key,
       SUM({_c('bal')}) / 100.0 AS sum_acctbal
FROM u GROUP BY transition, action ORDER BY transition, action
"""


def ivm_rollup_maintenance(spark, sf_dir):
    """Incremental view maintenance (`operators/ivm.py`): a per-segment
    (count, balance-sum) view of the customer base is maintained through an
    arbitrary CDC batch — in-place balance UPDATEs (every 100th customer
    +500), group-move UPDATEs (every 97th customer reassigned to
    MACHINERY), INSERTs (a clone per 250th customer), and DELETEs (negative
    balances) — purely from the change set: `snapshot_diff(before=True)`
    turns each change into signed retract/assert delta rows, and the view
    is refreshed by one groupBy over |view| + |changes| rows.  The base
    table is NEVER re-scanned — the whole point at 100 TB.  The oracle
    recomputes the view from scratch over the post-change state, so a hash
    match PROVES maintained == recomputed, including the group moves
    (MIN/MAX are deliberately out of scope: not self-maintainable under
    deletes)."""
    from unstructured_data_pipeline_spark.operators.dml import snapshot_diff
    from unstructured_data_pipeline_spark.operators.ivm import maintain_grouped_agg

    v1 = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        _cents(F.col("c_acctbal")).alias("bal_cents"),
    )
    changed = v1.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 97 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(
            F.col("c_custkey") % 100 == 0, F.col("bal_cents") + 50000
        )
        .otherwise(F.col("bal_cents"))
        .alias("bal_cents"),
    )
    inserts = v1.filter(F.col("c_custkey") % 250 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1000000
    )
    v2 = changed.unionByName(inserts).filter(F.col("bal_cents") >= 0)
    diff = snapshot_diff(v1, v2, keys=["c_custkey"], before=True)
    base = v1.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("bal_cents").alias("sum_measure"),
    )
    view = maintain_grouped_agg(
        base, diff, group_col="c_mktsegment", measure_col="bal_cents"
    )
    return view.select(
        "c_mktsegment",
        "n_rows",
        (F.col("sum_measure") / 100.0).alias("sum_acctbal"),
    ).orderBy("c_mktsegment")


IVM_ROLLUP_SQL = f"""
WITH v1 AS (
  SELECT c_custkey, c_mktsegment, {_c('c_acctbal')} AS bal FROM customer
),
v2 AS (
  SELECT * FROM (
    SELECT c_custkey,
           CASE WHEN c_custkey % 97 = 0 THEN 'MACHINERY' ELSE c_mktsegment END
             AS seg,
           CASE WHEN c_custkey % 100 = 0 THEN bal + 50000 ELSE bal END AS bal2
    FROM v1
    UNION ALL
    SELECT c_custkey + 1000000, c_mktsegment, bal FROM v1
    WHERE c_custkey % 250 = 0
  ) t WHERE bal2 >= 0
)
SELECT seg AS c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(bal2) AS BIGINT) / 100.0 AS sum_acctbal
FROM v2 GROUP BY seg ORDER BY seg
"""


def schema_evolution_report(spark, sf_dir):
    """Metadata-only ALTER TABLE ADD COLUMN through the real table layer
    (`ParquetTable.add_column`): half the customers land BEFORE the ALTER
    (their parquet files never carry the column and are NEVER rewritten —
    the only viable ALTER at 100 TB), the other half after, with a real
    tier value; the read backfills the pre-ALTER cohort to the column
    default.  Reference parity: the app/DDL schema drift the reference
    handles at query time (`database/setup_database.sql:49-50` vs
    `app.py:45-78`) — here as an explicit evolution surface.  The rollup
    over the merged read is hash-gated against the union-with-default
    mirror."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from unstructured_data_pipeline_spark.operators.dml import ParquetTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", _cents(F.col("c_acctbal")).alias("bal_cents")
    )
    root = tempfile.mkdtemp(prefix="udp_evolve_")
    t = ParquetTable(spark, root, "cust_evolve", cust.schema)
    t.ensure()
    t.append(cust.filter(F.col("c_custkey") % 2 == 0))  # pre-ALTER cohort
    t.add_column("loyalty_tier", T.StringType(), default="STANDARD")
    t.append(
        cust.filter(F.col("c_custkey") % 2 == 1).withColumn(
            "loyalty_tier",
            F.when(F.col("bal_cents") > 500000, F.lit("GOLD")).otherwise(
                F.lit("BASIC")
            ),
        )
    )
    out = (
        t.read()
        .groupBy("loyalty_tier")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("bal_cents") / 100.0).alias("sum_acctbal"),
            F.min("c_custkey").alias("min_key"),
        )
        .orderBy("loyalty_tier")
        .cache()
    )
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


SCHEMA_EVOLUTION_SQL = f"""
WITH base AS (SELECT c_custkey, {_c('c_acctbal')} AS bal FROM customer),
v AS (
  SELECT c_custkey, bal, 'STANDARD' AS tier FROM base WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey, bal,
         CASE WHEN bal > 500000 THEN 'GOLD' ELSE 'BASIC' END
  FROM base WHERE c_custkey % 2 = 1
)
SELECT tier AS loyalty_tier, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(bal) AS BIGINT) / 100.0 AS sum_acctbal,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key
FROM v GROUP BY tier ORDER BY tier
"""


def export_roundtrip_report(spark, sf_dir):
    """S7 export evidence through the DISTRIBUTED sink: the customer table
    is written out as headered CSV (the scale export shape), read back with
    an explicit schema, and rolled up per segment — so the driver row
    covers write->read CSV fidelity (quoting, numeric text round-trip of
    doubles), not just the DataFrame in memory."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.sources.export import export_csv_dir

    cust = _t(spark, sf_dir, "customer")
    out_dir = tempfile.mkdtemp(prefix="udp_export_")
    export_csv_dir(cust, out_dir)
    back = spark.read.option("header", "true").schema(cust.schema).csv(out_dir)
    out = (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("sum_acctbal"),
            F.min("c_name").alias("first_name"),
        )
        .orderBy("c_mktsegment")
        .cache()
    )
    out.count()  # materialize before the export dir is removed
    shutil.rmtree(out_dir, ignore_errors=True)
    return out


EXPORT_ROUNDTRIP_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       SUM({_c('c_acctbal')}) / 100.0 AS sum_acctbal,
       MIN(c_name) AS first_name
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def zorder_layout_report(spark, sf_dir):
    """Z-order (Morton) clustering audit: events keyed by the interleave of
    (user_id, whole-dollar value), bucketed into 16 z-ranges — the
    write-layout that gives parquet row groups tight min/max envelopes on
    BOTH dimensions (multi-column data skipping; the OPTIMIZE ZORDER idea
    as a plain sort key).  The per-bucket min/max report IS the
    data-skipping evidence: every bucket spans a narrow box in (user,
    dollar) space instead of the full range.  Pure div/mod integer
    arithmetic -> bit-identical cross-engine."""
    from unstructured_data_pipeline_spark.operators.partitioning import morton_key

    ev = _events(spark, sf_dir)
    dims = ev.select(
        F.least(F.col("user_id").cast("long"), F.lit(255)).alias("xq"),
        F.least(
            F.floor(_cents(F.col("value")) / 100).cast("long"), F.lit(255)
        ).alias("yq"),
    )
    keyed = dims.withColumn("z", morton_key(F.col("xq"), F.col("yq"), bits=8))
    return (
        keyed.groupBy((F.col("z") / F.lit(4096)).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("xq").alias("user_min"),
            F.max("xq").alias("user_max"),
            F.min("yq").alias("dollar_min"),
            F.max("yq").alias("dollar_max"),
        )
        .orderBy("z_bucket")
    )


def _morton_sql(x: str, y: str, bits: int = 8) -> str:
    terms = []
    for j in range(bits):
        p = 2**j
        terms.append(f"(({x}) // {p}) % 2 * {4 ** j}")
        terms.append(f"(({y}) // {p}) % 2 * {2 * 4 ** j}")
    return "(" + " + ".join(terms) + ")"


ZORDER_SQL = f"""
WITH dims AS (
  SELECT LEAST(CAST(user_id AS BIGINT), 255) AS xq,
         LEAST(CAST(FLOOR({_c('value')} / 100) AS BIGINT), 255) AS yq
  FROM events
),
keyed AS (SELECT xq, yq, {_morton_sql('xq', 'yq')} AS z FROM dims)
SELECT CAST(z // 4096 AS BIGINT) AS z_bucket, COUNT(*) AS n_events,
       MIN(xq) AS user_min, MAX(xq) AS user_max,
       MIN(yq) AS dollar_min, MAX(yq) AS dollar_max
FROM keyed GROUP BY z_bucket ORDER BY z_bucket
"""


DML_UPSERT_SQL = f"""
WITH source AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
         'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT c_custkey + 10000000, 'NEW#' || c_name, c_nationkey, 0.0, 'FRESH'
  FROM customer WHERE c_custkey % 97 = 0
),
merged AS (
  SELECT * FROM source
  UNION ALL
  SELECT t.* FROM customer t ANTI JOIN source s ON t.c_custkey = s.c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       SUM({_c('c_acctbal')}) / 100.0 AS sum_acctbal
FROM merged GROUP BY 1 ORDER BY 1
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: tight scan-side filter + ungrouped sum — the
    predicate-pushdown showcase (explain shows PushedFilters on all three)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))) / 100.0).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = f"""
SELECT SUM({_c('l_extendedprice * l_discount')}) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue in a quarter.  Join
    order: filtered lineitem x filtered orders shuffle-join (both big),
    then broadcast customer-side dims."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "_cents"
            )
        )
    )
    out = (
        rev.join(F.broadcast(c), rev["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            (F.col("_cents") / 100.0).alias("revenue"),
        )
    )
    return out.orderBy(F.desc("revenue"), "c_custkey").limit(20)


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name AS nation,
       SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact x dim join
    (part broadcasts)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
    return j.agg(
        F.round(100.0 * promo / F.sum(cents), 6).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q14_SQL = f"""
SELECT round(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_c('l_extendedprice * (1 - l_discount)')} ELSE 0 END)
             / SUM({_c('l_extendedprice * (1 - l_discount)')}), 6) AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
"""


def q18_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — HAVING on a big groupBy, then
    joined back to orders + customer (broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    out = (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            (_cents(F.col("o_totalprice")) / 100.0).alias("totalprice"),
            "sum_qty",
        )
    )
    return out.orderBy(F.desc("sum_qty"), "o_orderkey").limit(100)


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       {_c('o_totalprice')} / 100.0 AS totalprice, sum_qty
FROM (SELECT l_orderkey, SUM({_c('l_quantity')}) / 100.0 AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM({_c('l_quantity')}) / 100.0 > 150) t
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey LIMIT 100
"""


def ann_ivf_topk(spark, sf_dir):
    """IVF ANN: coarse centroids = the first 10 corpus vectors (fixed, so
    the whole index is deterministic and oracle-checkable — unlike sampled
    k-means); nprobe=2 probed lists per query, exact rerank inside them."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("vec")
    )
    q = emb.filter(F.col("vec_id") < 8)
    out = SIM.ivf_topk(emb, q, cent, k=5, nprobe=2)
    return out.select(
        "q_id", "neighbor_id", F.col("rank").alias("rnk"), F.round("cos", 6).alias("cos_r")
    ).orderBy("q_id", "rnk")


ANN_IVF_SQL = f"""
WITH cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 10),
lists AS (
  SELECT neighbor_id, c_vec, cent_id FROM (
    SELECT e.vec_id AS neighbor_id, e.embedding AS c_vec, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {_DOT.format(a='e.embedding', b='c.cv')}
             / (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})
                * sqrt({_DOT.format(a='c.cv', b='c.cv')})) DESC, c.cent_id) AS r
    FROM embeddings e CROSS JOIN cent c) t
  WHERE r = 1
),
probes AS (
  SELECT q_id, q_vec, cent_id FROM (
    SELECT e.vec_id AS q_id, e.embedding AS q_vec, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {_DOT.format(a='e.embedding', b='c.cv')}
             / (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})
                * sqrt({_DOT.format(a='c.cv', b='c.cv')})) DESC, c.cent_id) AS r
    FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 8) t
  WHERE r <= 2
),
scored AS (
  SELECT p.q_id, l.neighbor_id,
         {_DOT.format(a='l.c_vec', b='p.q_vec')}
         / (sqrt({_DOT.format(a='l.c_vec', b='l.c_vec')})
            * sqrt({_DOT.format(a='p.q_vec', b='p.q_vec')})) AS cos
  FROM lists l JOIN probes p ON l.cent_id = p.cent_id
  WHERE l.neighbor_id <> p.q_id
)
SELECT q_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk, round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored) t
WHERE rnk <= 5 ORDER BY q_id, rnk
"""


def ann_pq_topk_contract(spark, sf_dir):
    """Product-quantization ADC top-k (`operators/pq.py` — Jégou et al.
    2011), completing the ANN family (brute -> LSH -> IVF -> PQ): every
    64-dim embedding is stored as 4 small codes against a shared 16-entry
    codebook trained by the SAME deterministic Lloyd's chain the k-means
    query uses (all subvector slices feed one run under a composite id);
    search never touches a float vector — per-(query, subspace, code)
    squared distances are precomputed into a tiny literal table and each
    document scores as 4 lookups + 3 adds feeding TakeOrderedAndProject.
    The ENTIRE train -> encode -> ADC-search pipeline is hash-gated against
    an unrolled DuckDB mirror (codebook = exact integer (sum, count) state;
    distances = the sequential-fold IEEE sequence of clustering.py; ties
    break on document id).  Scale: codes are m ints/vector (the compression
    that keeps a 100 TB corpus hot), training is one map-side-combinable
    agg per iteration, the codebook is a bounded k-row collect, and top-k
    is per-partition heaps — no crossJoin, no global sort."""
    from unstructured_data_pipeline_spark.operators import pq as PQ
    from unstructured_data_pipeline_spark.operators.clustering import quantize_vec

    emb = _heavy(spark, sf_dir, "embeddings")
    codes, codebook, dsub = PQ.pq_fit_encode(
        emb, "vec_id", "embedding", dim=64, m=4, k=16, iters=2, scale=1000
    )
    qrows = (
        emb.filter(F.col("vec_id") < 4)
        .select("vec_id", quantize_vec(F.col("embedding"), 1000).alias("qx"))
        .collect()
    )  # bounded: 4 query vectors
    queries = [
        (r["vec_id"], list(r["qx"])) for r in sorted(qrows, key=lambda r: r["vec_id"])
    ]
    out = PQ.pq_adc_topk(codes, codebook, queries, m=4, dsub=dsub, topk=5)
    w = Window.partitionBy("qid").orderBy("dist", "id")
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .select(
            "qid",
            "rnk",
            F.col("id").alias("neighbor_id"),
            F.round("dist", 6).alias("dist_r"),
        )
        .orderBy("qid", "rnk")
    )


_PQ_SOURCE_SQL = """
SELECT vec_id * 4 + g.s AS vec_id,
       list_slice(embedding, g.s * 16 + 1, g.s * 16 + 16) AS embedding
FROM embeddings, generate_series(0, 3) AS g(s)
"""

# shared PQ oracle plumbing: codebook state, per-doc codes, query slices,
# distance table, ADC distances — consumed by both the top-k contract tail
# and the recall tail
_PQ_CORE_SQL = """,
s3 AS (
  SELECT k, g.i AS pos, CAST(SUM(x[g.i]) AS BIGINT) AS sv,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM a3, generate_series(1, 16) AS g(i) GROUP BY k, g.i
),
cb AS (
  SELECT k AS code, list(sv ORDER BY pos) AS s, CAST(MAX(cnt) AS BIGINT) AS n
  FROM s3 GROUP BY k
),
codes AS (
  SELECT CAST(id // 4 AS BIGINT) AS vid,
         MAX(CASE WHEN id % 4 = 0 THEN k END) AS c0,
         MAX(CASE WHEN id % 4 = 1 THEN k END) AS c1,
         MAX(CASE WHEN id % 4 = 2 THEN k END) AS c2,
         MAX(CASE WHEN id % 4 = 3 THEN k END) AS c3
  FROM a3 GROUP BY id // 4
),
qsub AS (
  SELECT CAST(id // 4 AS BIGINT) AS qid, CAST(id % 4 AS INTEGER) AS sub, x AS qx
  FROM pts WHERE id // 4 < 4
),
dtab AS (
  SELECT q.qid, q.sub, c.code,
         list_reduce(list_transform(generate_series(1, 16),
           i -> (q.qx[i] - c.s[i]/c.n) * (q.qx[i] - c.s[i]/c.n)),
           (acc, v) -> acc + v) AS dd
  FROM qsub q CROSS JOIN cb c
),
dists AS (
  SELECT codes.vid, t0.qid, ((t0.dd + t1.dd) + t2.dd) + t3.dd AS dist
  FROM codes
  JOIN dtab t0 ON t0.sub = 0 AND t0.code = codes.c0
  JOIN dtab t1 ON t1.sub = 1 AND t1.code = codes.c1 AND t1.qid = t0.qid
  JOIN dtab t2 ON t2.sub = 2 AND t2.code = codes.c2 AND t2.qid = t0.qid
  JOIN dtab t3 ON t3.sub = 3 AND t3.code = codes.c3 AND t3.qid = t0.qid
)"""

_PQ_TOPK_TAIL_SQL = _PQ_CORE_SQL + """
SELECT qid, CAST(rnk AS INTEGER) AS rnk, vid AS neighbor_id,
       round(dist, 6) AS dist_r
FROM (SELECT qid, vid, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rnk
      FROM dists) t
WHERE rnk <= 5 ORDER BY qid, rnk
"""

ANN_PQ_SQL = _kmeans_sql(
    k=16, d=16, iters=2, scale=1000,
    source_sql=_PQ_SOURCE_SQL, tail_sql=_PQ_TOPK_TAIL_SQL, train_cap=1600,
)

# recall tail: exact L2 top-5 on the full quantized vectors (same metric the
# quantizer approximates, so recall isolates quantization loss), intersected
# with the ADC top-5 per query.  The exact fold is the same sequential
# IEEE sequence as everywhere else (list_reduce terms >= +0.0).
_PQ_RECALL_TAIL_SQL = _PQ_CORE_SQL + """,
pq_top AS (
  SELECT qid, vid FROM (
    SELECT qid, vid,
           row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rnk
    FROM dists) t
  WHERE rnk <= 5
),
fullpts AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           v -> CAST(floor(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS x
  FROM embeddings
),
exact_top AS (
  SELECT qid, vid FROM (
    SELECT q.id AS qid, p.id AS vid,
           row_number() OVER (PARTITION BY q.id ORDER BY
             list_reduce(list_transform(generate_series(1, 64),
               i -> CAST(p.x[i] - q.x[i] AS DOUBLE)
                    * CAST(p.x[i] - q.x[i] AS DOUBLE)),
               (acc, v) -> acc + v) ASC, p.id ASC) AS rnk
    FROM fullpts p CROSS JOIN (SELECT * FROM fullpts WHERE id < 4) q) t
  WHERE rnk <= 5
)
SELECT p.qid, CAST(COUNT(e.vid) AS BIGINT) AS n_hits,
       round(CAST(COUNT(e.vid) AS DOUBLE) / 5.0, 6) AS recall_r
FROM pq_top p LEFT JOIN exact_top e ON e.qid = p.qid AND e.vid = p.vid
GROUP BY p.qid ORDER BY p.qid
"""

ANN_PQ_RECALL_SQL = _kmeans_sql(
    k=16, d=16, iters=2, scale=1000,
    source_sql=_PQ_SOURCE_SQL, tail_sql=_PQ_RECALL_TAIL_SQL, train_cap=1600,
)


def _pq_subspace_sql(m: int = 4, dsub: int = 16, k: int = 16) -> str:
    """Per-subspace PQ oracle: m independent prefixed Lloyd's chains (one
    per slice relation), codebook + distance table per subspace, ADC
    distances joined across the m code columns."""
    chains = []
    for s in range(m):
        src = (
            f"SELECT vec_id, list_slice(embedding, {s * dsub + 1}, "
            f"{(s + 1) * dsub}) AS embedding FROM embeddings"
        )
        chains.append(
            _kmeans_sql(
                k=k, d=dsub, iters=2, scale=1000,
                source_sql=src, tail_sql="",
                prefix=f"p{s}_", with_clause=(s == 0),
                train_cap=100 * k,
            )
        )
    cb_parts = []
    for s in range(m):
        cb_parts.append(f""",
p{s}_sf AS (
  SELECT k, g.i AS pos, CAST(SUM(x[g.i]) AS BIGINT) AS sv,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM p{s}_a3, generate_series(1, {dsub}) AS g(i) GROUP BY k, g.i
),
p{s}_cb AS (
  SELECT k AS code, list(sv ORDER BY pos) AS s, CAST(MAX(cnt) AS BIGINT) AS n
  FROM p{s}_sf GROUP BY k
),
dtab{s} AS (
  SELECT q.id AS qid, c.code,
         list_reduce(list_transform(generate_series(1, {dsub}),
           i -> (q.x[i] - c.s[i]/c.n) * (q.x[i] - c.s[i]/c.n)),
           (acc, v) -> acc + v) AS dd
  FROM (SELECT id, x FROM p{s}_pts WHERE id < 4) q CROSS JOIN p{s}_cb c
)""")
    code_cols = ", ".join(f"a{s}.k AS c{s}" for s in range(m))
    code_joins = " ".join(
        f"JOIN p{s}_a3 a{s} ON a{s}.id = a0.id" for s in range(1, m)
    )
    dist_expr = "t0.dd"
    for s in range(1, m):
        dist_expr = f"({dist_expr} + t{s}.dd)"
    dtab_joins = ["JOIN dtab0 t0 ON t0.code = codes.c0"]
    for s in range(1, m):
        dtab_joins.append(
            f"JOIN dtab{s} t{s} ON t{s}.code = codes.c{s} AND t{s}.qid = t0.qid"
        )
    tail = f""",
codes AS (
  SELECT a0.id AS vid, {code_cols}
  FROM p0_a3 a0 {code_joins}
){"".join(cb_parts)},
dists AS (
  SELECT codes.vid, t0.qid, {dist_expr} AS dist
  FROM codes
  {" ".join(dtab_joins)}
)
SELECT qid, CAST(rnk AS INTEGER) AS rnk, vid AS neighbor_id,
       round(dist, 6) AS dist_r
FROM (SELECT qid, vid, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, vid) AS rnk
      FROM dists) t
WHERE rnk <= 5 ORDER BY qid, rnk
"""
    return "".join(chains) + tail


ANN_PQ_SUBSPACE_SQL = _pq_subspace_sql()


def ann_pq_subspace_topk(spark, sf_dir):
    """Classic per-subspace PQ (`pq.pq_fit_encode_subspace` — Jégou et al.
    2011 proper, completing the PQ pair with the shared-codebook contract):
    m=4 INDEPENDENT Lloyd's runs, one codebook per subspace, codes = the
    id-join of the four assignment frames, ADC search identical in shape.
    The oracle unrolls all four chains (CTE-prefixed) plus the cross-
    subspace code join — the heaviest fully-hash-gated iterative mirror in
    the registry.  Scale notes as the shared variant; the extra cost is m
    codebooks (still driver-tiny) and the encode-time id-join (co-located
    after one repartition)."""
    from unstructured_data_pipeline_spark.operators import pq as PQ
    from unstructured_data_pipeline_spark.operators.clustering import quantize_vec

    emb = _heavy(spark, sf_dir, "embeddings")
    codes, codebooks, dsub = PQ.pq_fit_encode_subspace(
        emb, "vec_id", "embedding", dim=64, m=4, k=16, iters=2, scale=1000
    )
    qrows = (
        emb.filter(F.col("vec_id") < 4)
        .select("vec_id", quantize_vec(F.col("embedding"), 1000).alias("qx"))
        .collect()
    )  # bounded: 4 query vectors
    queries = [
        (r["vec_id"], list(r["qx"]))
        for r in sorted(qrows, key=lambda r: r["vec_id"])
    ]
    out = PQ.pq_adc_topk(codes, codebooks, queries, m=4, dsub=dsub, topk=5)
    w = Window.partitionBy("qid").orderBy("dist", "id")
    return (
        out.withColumn("rnk", F.row_number().over(w))
        .select(
            "qid",
            "rnk",
            F.col("id").alias("neighbor_id"),
            F.round("dist", 6).alias("dist_r"),
        )
        .orderBy("qid", "rnk")
    )


def _exact_l2_top5(spark, emb, queries):
    """Exact L2 top-5 per quantized query vector (the same sequential fold
    as the kmeans/PQ distance contract), as ONE scan of the corpus for any
    number of queries: the query vectors ride along as a broadcast
    relation, every corpus row scores against each (|Q|-bounded fan-out),
    and per-qid top-5 is one rank window whose WindowGroupLimit pushdown
    keeps the shuffle at |Q|*partitions*5 rows — the same single-scan
    shape as `pq.pq_adc_topk`, replacing the former per-query
    orderBy/limit union whose scan count grew with |Q|.  Shared by the PQ
    recall query and the bench-side shared-vs-subspace comparison."""
    if not queries:
        return spark.createDataFrame([], "qid long, vid long, dist double")
    from unstructured_data_pipeline_spark.operators.clustering import quantize_vec

    pts = emb.select(
        "vec_id", quantize_vec(F.col("embedding"), 1000).alias("x")
    )
    qdf = spark.createDataFrame(
        [(int(qid), [int(v) for v in qx]) for qid, qx in queries],
        "qid long, qx array<bigint>",
    )

    def step(acc, i):
        diff = (F.element_at("x", i) - F.element_at("qx", i)).cast("double")
        return acc + diff * diff

    dist = F.aggregate(F.sequence(F.lit(1), F.lit(64)), F.lit(0.0), step)
    scored = pts.join(F.broadcast(qdf)).select(
        "qid", F.col("vec_id").alias("vid"), dist.alias("dist")
    )
    w = Window.partitionBy("qid").orderBy("dist", "vid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("qid", "vid", "dist")
    )


def ann_pq_recall(spark, sf_dir):
    """PQ quality evidence (the ADC contract's companion, mirroring
    `ann_lsh_recall`): recall@5 of the ADC top-5 against the EXACT
    L2 top-5 on the full quantized vectors — the same metric the quantizer
    approximates, so the number isolates quantization loss.  Exact baseline
    = broadcast-|Q| brute force (|Q|=4, the documented baseline shape);
    intersection + recall are a bounded 20-row join.  Hash-gated end to end
    (codebook, codes, ADC ranks, exact ranks, recall all recomputed in the
    DuckDB mirror)."""
    from unstructured_data_pipeline_spark.operators import pq as PQ
    from unstructured_data_pipeline_spark.operators.clustering import quantize_vec

    emb = _heavy(spark, sf_dir, "embeddings")
    codes, codebook, dsub = PQ.pq_fit_encode(
        emb, "vec_id", "embedding", dim=64, m=4, k=16, iters=2, scale=1000
    )
    qrows = (
        emb.filter(F.col("vec_id") < 4)
        .select("vec_id", quantize_vec(F.col("embedding"), 1000).alias("qx"))
        .collect()
    )  # bounded: 4 query vectors
    queries = [
        (r["vec_id"], list(r["qx"]))
        for r in sorted(qrows, key=lambda r: r["vec_id"])
    ]
    adc_top = PQ.pq_adc_topk(
        codes, codebook, queries, m=4, dsub=dsub, topk=5
    ).select("qid", F.col("id").alias("vid"))
    exact = _exact_l2_top5(spark, emb, queries)
    hits = adc_top.join(
        exact.select("qid", "vid", F.lit(1).alias("_hit")),
        on=["qid", "vid"],
        how="left",
    )
    return (
        hits.groupBy("qid")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / 5.0, 6).alias("recall_r"),
        )
        .orderBy("qid")
    )


def variant_props_extract(spark, sf_dir):
    """VARIANT path extraction (§2.7 `x:path::TYPE`): JSON props column ->
    typed value via get_json_object + cast, aggregated per event type."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


VARIANT_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def variant_native_extract(spark, sf_dir):
    """The same VARIANT extraction through Spark 4's NATIVE VariantType
    (`parse_json` -> binary variant -> `try_variant_get`), not JSON-string
    functions — the upgrade path SURVEY §1.2 names.  Variant decode is
    columnar and ~an order faster than repeated get_json_object parsing on
    wide payloads; identical results, same oracle as the JSON-path query."""
    ev = _events(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def window_frames_running(spark, sf_dir):
    """Window-function breadth beyond W1: rank, lag delta, and an explicit
    ROWS UNBOUNDED PRECEDING running-total frame, per customer."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    cents = _cents(F.col("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.rank().over(w).alias("rnk"),
        (F.sum(cents).over(wf) / 100.0).alias("running_total"),
        ((cents - F.lag(cents).over(w)) / 100.0).alias("delta_prev"),
    )


WINDOW_FRAMES_SQL = f"""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       rank() OVER w AS rnk,
       SUM({_c('o_totalprice')}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_total,
       ({_c('o_totalprice')} - lag({_c('o_totalprice')}) OVER w) / 100.0 AS delta_prev
FROM orders WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def nation_revenue_share(spark, sf_dir):
    """Percent-of-total analytics: each nation's share of its region's
    revenue via a window SUM over the aggregate (ratio-to-report)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("_c"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        (F.col("_c") / 100.0).alias("revenue"),
        F.round(100.0 * F.col("_c") / F.sum("_c").over(w), 6).alias("share_pct_r"),
    )


NATION_SHARE_SQL = f"""
WITH rev AS (
  SELECT r_name AS region, n_name AS nation,
         SUM({_c('l_extendedprice * (1 - l_discount)')}) AS c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, c / 100.0 AS revenue,
       round(100.0 * c / SUM(c) OVER (PARTITION BY region), 6) AS share_pct_r
FROM rev ORDER BY region, nation
"""


def docs_lang_source_crosstab(spark, sf_dir):
    """Crosstab pivot with a COUNT aggregate (C5 variant): documents by
    language x source, explicit pivot values (no discovery pass — the
    two-job pivot-value scan is the thing to avoid at 100 TB)."""
    srcs = [f"src{i}" for i in range(5)]
    d = _heavy(spark, sf_dir, "documents").filter(F.col("source").isin(srcs))
    return (
        d.groupBy("lang").pivot("source", srcs).agg(F.count(F.lit(1))).na.fill(0)
    )


CROSSTAB_SQL = """
SELECT lang,
  CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
  CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
  CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
  CAST(SUM(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3,
  CAST(SUM(CASE WHEN source = 'src4' THEN 1 ELSE 0 END) AS BIGINT) AS src4
FROM documents
WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
GROUP BY lang ORDER BY lang
"""


def rollup_order_stats(spark, sf_dir):
    """ROLLUP(status, priority) hierarchy totals — subtotal rows labelled
    'ALL' (A-section extension; Spark hash aggregate covers grouping sets)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))) / 100.0).alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
    )


ROLLUP_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       SUM({_c('o_totalprice')}) / 100.0 AS sum_total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY 1, 2
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum-cost supplier via a decorrelated
    min + self-equality join (the reference's correlated-subquery pattern
    J1 at fact scale).  Suppliers priced at their part's regional minimum."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") < 15)
    # fixture has no partsupp: derive a deterministic cost relation
    # cost(part, supplier) = retailprice * (1 + ((partkey*31 + suppkey) % 7) / 100)
    # The pair predicate (p_partkey + s_suppkey) % 10 == 0 is an equi-join in
    # disguise: p_partkey % 10 must equal (10 - s_suppkey % 10) % 10.  Joining
    # on that derived key keeps the exact same pair set while letting Spark
    # hash-join |part| x |supplier| / 10 rows instead of evaluating a
    # BroadcastNestedLoopJoin over every pair (scale-killer at 100x; keys are
    # non-negative so Spark's % matches Python/DuckDB semantics here).
    cost = (
        p.withColumn("_mod10", F.col("p_partkey") % 10)
        .join(
            s.select(
                "s_suppkey",
                "s_name",
                "s_nationkey",
                ((10 - F.col("s_suppkey") % 10) % 10).alias("_mod10"),
            ),
            "_mod10",
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_nationkey",
            (
                _cents(
                    F.col("p_retailprice")
                    * (1 + ((F.col("p_partkey") * 31 + F.col("s_suppkey")) % 7) / 100.0)
                )
                / 100.0
            ).alias("cost"),
        )
    )
    mins = cost.groupBy("p_partkey").agg(F.min("cost").alias("min_cost"))
    out = (
        cost.join(mins, "p_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_name", F.col("n_name").alias("nation"), "cost"
        )
    )
    return out.orderBy("p_partkey", "s_name").limit(100)


Q2_SQL = f"""
WITH cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_nationkey,
         {_c('p_retailprice * (1 + ((p_partkey * 31 + s_suppkey) % 7) / 100.0)')} / 100.0 AS cost
  FROM part CROSS JOIN supplier
  WHERE p_size < 15 AND (p_partkey + s_suppkey) % 10 = 0
),
mins AS (SELECT p_partkey, MIN(cost) AS min_cost FROM cost GROUP BY 1)
SELECT c.p_partkey, c.p_name, c.s_name, n_name AS nation, c.cost
FROM cost c JOIN mins m ON c.p_partkey = m.p_partkey AND c.cost = m.min_cost
JOIN nation ON c.s_nationkey = n_nationkey
ORDER BY c.p_partkey, c.s_name LIMIT 100
"""


def q4_priority_with_late_items(spark, sf_dir):
    """TPC-H Q4 shape: order counts per priority where EXISTS a lineitem
    shipped after the order date (left-semi join, the reference's P5)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY 1 ORDER BY 1
"""


def q7_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between customer-nation pairs by
    ship year (multi-dim join + conditional pair filter)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("sn_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
    )
    return (
        j.groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("volume")
        )
    )


Q7_SQL = f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       SUM({_c('l_extendedprice * (1 - l_discount)')}) / 100.0 AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape: profit rollup by supplier nation x order year over a
    4-way join with a computed measure."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("a"))
    n = _t(spark, sf_dir, "nation")
    profit = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit) / 100.0).alias("profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       SUM({_c('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1')}) / 100.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def full_outer_nation_balance(spark, sf_dir):
    """Full-outer join breadth: customer vs supplier account balances per
    nation — nations missing from either side survive with nulls->0."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.sum(_cents(F.col("c_acctbal"))).alias("_cc"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(F.sum(_cents(F.col("s_acctbal"))).alias("_sc"))
    )
    j = c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer")
    return j.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        (F.coalesce(F.col("_cc"), F.lit(0)) / 100.0).alias("cust_balance"),
        (F.coalesce(F.col("_sc"), F.lit(0)) / 100.0).alias("supp_balance"),
    )


FULL_OUTER_SQL = f"""
WITH c AS (SELECT c_nationkey AS k, SUM({_c('c_acctbal')}) AS cc
           FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
s AS (SELECT s_nationkey AS k, SUM({_c('s_acctbal')}) AS sc
      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(cc, 0) / 100.0 AS cust_balance,
       COALESCE(sc, 0) / 100.0 AS supp_balance
FROM c FULL OUTER JOIN s ON c.k = s.k ORDER BY 1
"""


def doc_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (Schleimer et al.): per sliding window of w consecutive
    k-gram hashes keep the minimum; the distinct kept hashes are the doc's
    fingerprint set.  Guarantees shared substrings >= w+k-1 chars always
    collide — the plagiarism/near-dup fingerprint standard."""
    d = _heavy(spark, sf_dir, "documents")
    grams = TX.rolling_kgram_hashes("text", k=8)
    w = 4
    gcol = F.col("_grams")
    m = F.size(gcol) - (w - 1)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    wins = F.transform(idx, lambda i: F.array_min(F.slice(gcol, i, w)))
    return (
        d.select("doc_id", grams.alias("_grams"))
        .select(
            "doc_id",
            F.size(F.array_distinct(wins)).alias("n_fingerprints"),
            F.array_min(wins).alias("fp_min"),
            F.array_max(wins).alias("fp_max"),
        )
    )


WINNOW_SQL = """
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(text) - 7, 0)),
                        i -> md5(substr(text, i, 8))) AS grams
  FROM documents
),
w AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(grams) - 3, 0)),
                        i -> list_min(grams[i:i+3])) AS wins
  FROM g
)
SELECT doc_id, len(list_distinct(wins)) AS n_fingerprints,
       list_min(wins) AS fp_min, list_max(wins) AS fp_max
FROM w ORDER BY doc_id
"""


def setops_customer_years(spark, sf_dir):
    """Set-operation breadth (O3 extension): customers ordering in BOTH
    1995 and 1996 (INTERSECT), only in 1996 (EXCEPT), and either (UNION) —
    counted per bucket."""
    o = _t(spark, sf_dir, "orders")

    def year_custs(y):
        return o.filter(F.year("o_orderdate") == y).select("o_custkey").distinct()

    c95, c96 = year_custs(1995), year_custs(1996)
    both = c95.intersect(c96).select(F.lit("both").alias("bucket"), "o_custkey")
    only96 = c96.exceptAll(c95).select(F.lit("only_1996").alias("bucket"), "o_custkey")
    either = c95.union(c96).distinct().select(F.lit("either").alias("bucket"), "o_custkey")
    return (
        both.unionByName(only96)
        .unionByName(either)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SETOPS_SQL = """
WITH c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
u AS (
  SELECT 'both' AS bucket, o_custkey FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
  UNION ALL
  SELECT 'only_1996', o_custkey FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c95)
  UNION ALL
  SELECT 'either', o_custkey FROM (SELECT * FROM c95 UNION SELECT * FROM c96)
)
SELECT bucket, COUNT(*) AS n_customers FROM u GROUP BY 1 ORDER BY 1
"""


def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers (left outer join preserving unmatched, then a
    histogram groupBy over the counts)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q15_top_suppliers(spark, sf_dir):
    """TPC-H Q15 shape: suppliers achieving the maximum quarterly revenue —
    aggregate, ungrouped max, equality join back (the view + MAX pattern)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("_r")
    )
    top = rev.agg(F.max("_r").alias("_m"))
    return (
        rev.join(F.broadcast(top), rev["_r"] == top["_m"])
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name", (F.col("_r") / 100.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_c('l_extendedprice * (1 - l_discount)')}) AS r
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, r / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
ORDER BY s_suppkey
"""


def q16_part_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per part attribute, excluding a
    supplier denylist via NOT IN (a left-anti join after Catalyst — the
    null-safe way to express it)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 4, 9, 14, 19))
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_name").like("%7%")).select("s_suppkey")
    pairs = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 4, 9, 14, 19)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from orders below 20%% of the part's average
    quantity — the correlated-AVG subquery decorrelated into a per-part
    aggregate joined back (what Catalyst does to the SQL form)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.avg(_cents(F.col("l_quantity"))).alias("_avgc")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(avg_q, li["l_partkey"] == F.col("_pk"))
        .filter(_cents(F.col("l_quantity")) < 0.2 * F.col("_avgc"))
    )
    return j.agg(
        (F.sum(_cents(F.col("l_extendedprice"))) / 700.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q17_SQL = f"""
SELECT SUM({_c('l_extendedprice')}) / 700.0 AS avg_yearly, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND {_c('l_quantity')} < 0.2 * (
    SELECT AVG({_c('l_quantity')}) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: positive-balance customers with no orders, among
    those above the average positive balance — ungrouped-scalar subquery +
    anti-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(F.avg(_cents(F.col("c_acctbal"))).alias("_a"))
    rich = pos.join(F.broadcast(avg_bal), _cents(F.col("c_acctbal")) > F.col("_a"))
    no_orders = rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    )
    return (
        no_orders.groupBy((F.col("c_custkey") % 10).alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(_cents(F.col("c_acctbal"))) / 100.0).alias("total_bal"),
        )
    )


Q22_SQL = f"""
SELECT c_custkey % 10 AS cust_group, COUNT(*) AS n_cust,
       SUM({_c('c_acctbal')}) / 100.0 AS total_bal
FROM customer
WHERE c_acctbal > 0.0
  AND {_c('c_acctbal')} > (SELECT AVG({_c('c_acctbal')}) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY 1
"""


def profile_customer_columns(spark, sf_dir):
    """Data-profiling operator (ANALYZE-style): one pass computing per-column
    null count, distinct count, and min/max — the pipeline's schema-health
    check, all map-side-combinable aggregates."""
    c = _t(spark, sf_dir, "customer")
    out = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_name").isNull().cast("long")).alias("name_nulls"),
        F.countDistinct("c_nationkey").alias("nation_distinct"),
        F.countDistinct("c_mktsegment").alias("segment_distinct"),
        F.min(_cents(F.col("c_acctbal"))).alias("min_bal_cents"),
        F.max(_cents(F.col("c_acctbal"))).alias("max_bal_cents"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
    return out


PROFILE_SQL = f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS name_nulls,
       COUNT(DISTINCT c_nationkey) AS nation_distinct,
       COUNT(DISTINCT c_mktsegment) AS segment_distinct,
       MIN({_c('c_acctbal')}) AS min_bal_cents,
       MAX({_c('c_acctbal')}) AS max_bal_cents,
       MIN(c_custkey) AS min_key,
       MAX(c_custkey) AS max_key
FROM customer
"""


def orders_value_histogram(spark, sf_dir):
    """Fixed-width histogram via width_bucket over integer cents — the
    one-pass distribution sketch that needs no sort."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.width_bucket(
        _cents(F.col("o_totalprice")), F.lit(0), F.lit(60000000), F.lit(12)
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min(_cents(F.col("o_totalprice"))) / 100.0).alias("min_total"),
            (F.max(_cents(F.col("o_totalprice"))) / 100.0).alias("max_total"),
        )
    )


# DuckDB has no width_bucket; the arithmetic form mirrors its semantics
# exactly (0 below range, n+1 above, floor(x/width)+1 inside)
HISTOGRAM_SQL = f"""
SELECT CASE WHEN {_c('o_totalprice')} < 0 THEN 0
            WHEN {_c('o_totalprice')} >= 60000000 THEN 13
            ELSE {_c('o_totalprice')} // 5000000 + 1 END AS bucket,
       COUNT(*) AS n_orders,
       MIN({_c('o_totalprice')}) / 100.0 AS min_total,
       MAX({_c('o_totalprice')}) / 100.0 AS max_total
FROM orders GROUP BY 1 ORDER BY 1
"""


def percentiles_by_segment(spark, sf_dir):
    """Exact distribution analytics: median / p90 / p99 of order value per
    market segment.  EXACT ``percentile`` (sort-based, linear interpolation
    — same definition as DuckDB's quantile_cont) over integer cents, so the
    result hash-matches across engines; the approx_percentile sketch is the
    drop-in at 100 TB when exactness can be traded for one pass."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", _cents(F.col("o_totalprice")).alias("cents")
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.expr("percentile(cents, 0.5)") / 100.0).alias("p50"),
        (F.expr("percentile(cents, 0.9)") / 100.0).alias("p90"),
        (F.expr("percentile(cents, 0.99)") / 100.0).alias("p99"),
    )


PERCENTILES_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       quantile_cont({_c('o_totalprice')}, 0.5) / 100.0 AS p50,
       quantile_cont({_c('o_totalprice')}, 0.9) / 100.0 AS p90,
       quantile_cont({_c('o_totalprice')}, 0.99) / 100.0 AS p99
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def funnel_signup_view_purchase(spark, sf_dir):
    """Ordered funnel: per user, did a signup happen, then a view AFTER it,
    then a purchase AFTER that view?  Three conditional-min aggregation
    passes, each co-partitioned on user_id (the first shuffle establishes
    the partitioning; the step-N join is a co-located self-join — no pair
    explosion, the standard scalable funnel shape)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.col("ts").alias("us")
    )
    a1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias("t1")
    )
    a2 = (
        ev.join(a1, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("t1").alias("t1"),
            F.min(
                F.when(
                    (F.col("event_type") == "view") & (F.col("us") > F.col("t1")),
                    F.col("us"),
                )
            ).alias("t2"),
        )
    )
    a3 = (
        ev.join(a2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("t1").alias("t1"),
            F.min("t2").alias("t2"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("us") > F.col("t2")),
                    F.col("us"),
                )
            ).alias("t3"),
        )
    )
    return a3.select(
        "user_id",
        F.col("t1").isNotNull().alias("did_signup"),
        F.col("t2").isNotNull().alias("did_view_after"),
        F.col("t3").isNotNull().alias("did_purchase_after"),
    )


FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
a1 AS (SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN us END) AS t1
       FROM e GROUP BY 1),
a2 AS (SELECT e.user_id, MIN(t1) AS t1,
              MIN(CASE WHEN event_type = 'view' AND us > t1 THEN us END) AS t2
       FROM e JOIN a1 USING (user_id) GROUP BY e.user_id),
a3 AS (SELECT e.user_id, MIN(t1) AS t1, MIN(t2) AS t2,
              MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) AS t3
       FROM e JOIN a2 USING (user_id) GROUP BY e.user_id)
SELECT user_id, t1 IS NOT NULL AS did_signup,
       t2 IS NOT NULL AS did_view_after,
       t3 IS NOT NULL AS did_purchase_after
FROM a3 ORDER BY user_id
"""


def retention_cohorts(spark, sf_dir):
    """Retention: users grouped by first-seen day (cohort), counted by how
    many days after the cohort day they were active.  Two aggregations —
    first-seen per user, then (cohort_day, day_offset) distinct users."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.expr("ts DIV 86400000000").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
SELECT cohort_day, day - cohort_day AS day_offset, COUNT(DISTINCT e.user_id) AS n_users
FROM e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def text_token_entropy(spark, sf_dir):
    """Shannon entropy of each doc's token distribution — the repetition/
    gibberish quality signal (low entropy = boilerplate, high = diverse).
    Exact integer counts until the final -sum(p*ln p)."""
    d = _heavy(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens_ws("text")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy_r"))
    )


ENTROPY_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(c) AS n FROM c GROUP BY 1)
SELECT doc_id,
       round(-SUM((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                  * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS entropy_r
FROM c JOIN n USING (doc_id)
GROUP BY doc_id ORDER BY doc_id
"""


def heavy_hitters_contract(spark, sf_dir):
    """Misra-Gries heavy hitters over the token stream, hash-gated the
    sketch_event_stats way (error-bound contract, not raw sketch output):
    the row set is the EXACT top-10 tokens (count desc, token asc — both
    engines agree), and per row the booleans assert the MG sketch (k=256)
    (a) FOUND the token — guaranteed, since every top token's true count
    far exceeds the n/(k+1) survival threshold — and (b) estimated it
    within the mergeable-summaries bound [true - n/(k+1), true] (2x slack
    on the lower edge).  Bounds hold for ANY batch/partitioning of the
    input (operators/sketches.py), so the contract is environment-stable.
    Exact counterpart: corpus_top_terms."""
    from unstructured_data_pipeline_spark.operators.sketches import mg_heavy_hitters

    k = 256
    d = _heavy(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok")).filter(
        F.length("tok") > 0
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    total = exact.agg(F.sum("exact_cnt").alias("n_total"))  # single row
    top10 = exact.orderBy(F.desc("exact_cnt"), F.asc("tok")).limit(10)
    hh = mg_heavy_hitters(toks, "tok", k=k).withColumnRenamed("item", "tok")
    return (
        top10.join(hh, "tok", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "tok",
            "exact_cnt",
            F.col("est").isNotNull().alias("found_by_sketch"),
            (
                (F.col("est") <= F.col("exact_cnt"))
                & (
                    F.col("est")
                    >= F.col("exact_cnt") - 2.0 * F.col("n_total") / (k + 1)
                )
            ).alias("est_in_bound"),
        )
        .orderBy(F.desc("exact_cnt"), "tok")
    )


HEAVY_HITTERS_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
t2 AS (SELECT tok FROM toks WHERE len(tok) > 0),
exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM t2 GROUP BY 1)
SELECT tok, exact_cnt, TRUE AS found_by_sketch, TRUE AS est_in_bound
FROM exact ORDER BY exact_cnt DESC, tok LIMIT 10
"""


def corpus_top_terms(spark, sf_dir):
    """Corpus term statistics: top-20 terms by document frequency (then
    total frequency, then term) — explode+aggregate, the inverted-index
    building block."""
    d = _heavy(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(TX.tokens_ws(F.lower(F.col("text")))).alias("term")
    )
    return (
        toks.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), "term")
        .limit(20)
    )


TOP_TERMS_SQL = """
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents) t
GROUP BY term ORDER BY df DESC, tf DESC, term LIMIT 20
"""


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"


def text_clean_pii(spark, sf_dir):
    """Training-data cleaning: scrub emails and URLs with the same regexes
    in both engines.  The fixture corpus has no PII, so every doc_id % 7 ==
    0 gets a deterministic email + URL appended first; the query counts and
    redacts them."""
    d = _heavy(spark, sf_dir, "documents")
    pii = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via https://ex.com/u/"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.lit(""))
    dirty = d.select("doc_id", F.concat(F.col("text"), pii).alias("text"))
    cleaned = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )
    return dirty.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_URL_RE), F.lit(0)))
        .cast("long")
        .alias("n_urls"),
        F.length(cleaned).cast("long").alias("clean_len"),
        F.md5(cleaned).alias("clean_hash"),
    )


PII_SQL = rf"""
WITH dirty AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' contact user' || CAST(doc_id AS VARCHAR)
                           || '@example.com via https://ex.com/u/' || CAST(doc_id AS VARCHAR)
                      ELSE '' END AS text
  FROM documents
),
c AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_URL_RE}', '<URL>', 'g') AS cleaned
  FROM dirty
)
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_URL_RE}')) AS n_urls,
       CAST(length(cleaned) AS BIGINT) AS clean_len,
       md5(cleaned) AS clean_hash
FROM c ORDER BY doc_id
"""


def doc_chunking_cdc(spark, sf_dir):
    """Content-defined chunking (RAG/dedup chunker): a chunk boundary falls
    wherever the rolling 8-gram hash starts with hex '0' (P=1/16 -> ~16-gram
    expected chunks).  Content-defined means insertions only reshuffle
    neighboring chunks — unlike fixed-width chunking where everything after
    the edit shifts."""
    d = _heavy(spark, sf_dir, "documents")
    grams = TX.rolling_kgram_hashes("text", k=8)
    bounds = F.filter(grams, lambda g: F.substring(g, 1, 1) == "0")
    return d.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        (F.size(bounds) + 1).cast("long").alias("n_chunks"),
        # try_element_at: docs with no boundary have an empty array, and the
        # driver's vanilla session runs ANSI mode where element_at throws
        F.try_element_at(bounds, F.lit(1)).alias("first_boundary_hash"),
    )


CDC_SQL = """
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(text) - 7, 0)),
                        i -> md5(substr(text, i, 8))) AS grams
  FROM documents
),
b AS (SELECT doc_id, grams, list_filter(grams, x -> substr(x, 1, 1) = '0') AS bounds FROM g)
SELECT doc_id, len(grams) AS n_grams,
       len(bounds) + 1 AS n_chunks,
       bounds[1] AS first_boundary_hash
FROM b ORDER BY doc_id
"""


def hybrid_search_topk(spark, sf_dir):
    """Hybrid retrieval: metadata/text-quality filters narrow the corpus
    (lang='en', >=150 chars — pushed to the documents scan), then exact
    cosine top-3 over the surviving vectors.  The compose-operators shape
    every RAG pipeline needs."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _heavy(spark, sf_dir, "documents").filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 150)
    )
    corpus = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    q = emb.filter(F.col("vec_id") < 4)
    out = SIM.cosine_topk(corpus, q, k=3)
    return out.select(
        "q_id", "neighbor_id", F.col("rank").alias("rnk"), F.round("cos", 6).alias("cos_r")
    ).orderBy("q_id", "rnk")


HYBRID_SQL = f"""
WITH corpus AS (
  SELECT e.vec_id AS neighbor_id, e.embedding AS cv
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.lang = 'en' AND d.n_chars >= 150
),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 4),
scored AS (
  SELECT q_id, neighbor_id,
         {_DOT.format(a='cv', b='qv')}
         / (sqrt({_DOT.format(a='cv', b='cv')}) * sqrt({_DOT.format(a='qv', b='qv')})) AS cos
  FROM corpus, q WHERE neighbor_id <> q_id
)
SELECT q_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk, round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored) t
WHERE rnk <= 3 ORDER BY q_id, rnk
"""


def tfidf_top_term_per_doc(spark, sf_dir):
    """TF-IDF: the classic relevance weight composed from two aggregations
    (per-doc term counts x corpus document frequencies).  Emits each doc's
    highest-weighted term; idf = ln(N / df) on exact integer counts, ties
    broken by term."""
    d = _heavy(spark, sf_dir, "documents")
    n_docs = d.count()  # driver-side scalar: one count, broadcast into the plan
    toks = d.select(
        "doc_id", F.explode(TX.tokens_ws(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("w"), "term")
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("w", 6).alias("tfidf_r"))
    )


TFIDF_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf * ln(CAST(n_docs AS DOUBLE) / df) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term AS top_term, round(w, 6) AS tfidf_r
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS r
      FROM scored) t
WHERE r = 1 ORDER BY doc_id
"""


def embedding_label_centroids(spark, sf_dir):
    """Per-label centroid vectors (the k-means/IVF 'train' step as one
    aggregation): element-wise mean via posexplode + groupBy(label, pos) —
    every partial sum map-side-combinable, no vector ever on the driver.
    Emits per-label norm + first components, integer-exactness preserved by
    summing doubles in pos order."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("label", "pos", "x")
    cent = comp.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    return (
        cent.select("label", "pos", (F.col("s") / F.col("n")).alias("m"))
        .filter(F.col("pos") < 4)
        .groupBy("label")
        .pivot("pos", [0, 1, 2, 3])
        .agg(F.round(F.first("m"), 6))
        .select(
            "label",
            F.col("0").alias("c0"),
            F.col("1").alias("c1"),
            F.col("2").alias("c2"),
            F.col("3").alias("c3"),
        )
    )


CENTROIDS_SQL = """
WITH comp AS (
  SELECT label, i - 1 AS pos, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
),
cent AS (SELECT label, pos, SUM(x) / COUNT(*) AS m FROM comp GROUP BY 1, 2)
SELECT label,
  round(MAX(CASE WHEN pos = 0 THEN m END), 6) AS c0,
  round(MAX(CASE WHEN pos = 1 THEN m END), 6) AS c1,
  round(MAX(CASE WHEN pos = 2 THEN m END), 6) AS c2,
  round(MAX(CASE WHEN pos = 3 THEN m END), 6) AS c3
FROM cent WHERE pos < 4 GROUP BY label ORDER BY label
"""


