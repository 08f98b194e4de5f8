"""30-33: similarity search, windowed agg, sessionize, as-of

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, SIM, Window, _c, _cents, _events, _heavy, _t

# ---------------------------------------------------------------------------
# 30-33: similarity search, streaming-shaped windowed agg, sessionize, as-of


def emb_cosine_topk(spark, sf_dir):
    """Brute-force exact top-5 cosine neighbors for query vectors
    (vec_id < 8) — the ANN baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    out = SIM.cosine_topk(emb, q, k=5)
    return out.select(
        "q_id", "neighbor_id", F.col("rank").alias("rnk"), F.round("cos", 6).alias("cos_r")
    ).orderBy("q_id", "rnk")


_DOT = (
    "list_sum(list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)

EMB_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q_id, neighbor_id,
         {_DOT.format(a='cv', b='qv')}
         / (sqrt({_DOT.format(a='cv', b='cv')}) * sqrt({_DOT.format(a='qv', b='qv')})) AS cos
  FROM c, q WHERE neighbor_id <> q_id
)
SELECT q_id, neighbor_id, CAST(rnk AS INTEGER) AS rnk, round(cos, 6) AS cos_r
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored) t
WHERE rnk <= 5 ORDER BY q_id, rnk
"""


def rrf_hybrid_fusion(spark, sf_dir):
    """Reciprocal-rank-fusion hybrid retrieval — the standard way RAG
    stacks combine a lexical and a semantic ranker without score
    calibration (Cormack et al.'s RRF: fused = sum 1/(60+rank)).  Lexical
    list: shared-distinct-token scoring weighted by rarity, score =
    sum(N - df(tok)) — INTEGER arithmetic end-to-end, so ranks are
    cross-engine exact.  Semantic list: exact cosine top-20 over the
    embedding column (the emb_cosine_topk machinery).  Fusion: full outer
    join of the two top-20 lists, 1/(60+rank) contributions (single exact
    division each), top-5 per query.  Scale shape: the 4-query token list
    broadcasts against the corpus token index; df table is one groupBy;
    semantic side broadcasts Q against the corpus — nothing all-pairs,
    ranks via per-query windows (partitionBy q_id, never a global
    window)."""
    k_list, rrf_k = 20, 60
    docs = _heavy(spark, sf_dir, "documents").select("doc_id", "text")
    toksx = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda t: t != "",
                )
            )
        ).alias("tok"),
    )
    df_tab = toksx.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    qtoks = toksx.filter(F.col("doc_id") < 4).select(
        F.col("doc_id").alias("q_id"), "tok"
    )
    lex = (
        F.broadcast(qtoks)
        .join(toksx, "tok")
        .filter(F.col("q_id") != F.col("doc_id"))
        .join(df_tab, "tok")
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.lit(n_docs) - F.col("df")).alias("lex_score"))
    )
    wl = Window.partitionBy("q_id").orderBy(
        F.desc("lex_score"), F.asc("doc_id")
    )
    lexr = (
        lex.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= k_list)
        .select("q_id", "doc_id", "lex_rank")
    )
    emb = _t(spark, sf_dir, "embeddings")
    semr = (
        SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 4), k=k_list)
        .select("q_id", F.col("neighbor_id").alias("doc_id"),
                F.col("rank").alias("sem_rank"))
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.col(r) + rrf_k), F.lit(0.0)
    )
    fused = lexr.join(semr, ["q_id", "doc_id"], "full").withColumn(
        "score", contrib("lex_rank") + contrib("sem_rank")
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 5)
        .select(
            "q_id",
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round("score", 6).alias("rrf_r"),
            "fused_rank",
        )
        .orderBy("q_id", "fused_rank")
    )


RRF_FUSION_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                   t -> t <> '')) AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
dftab AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM docs),
qtok AS (SELECT doc_id AS q_id, tok FROM tok WHERE doc_id < 4),
lexs AS (
  SELECT q.q_id, t.doc_id, SUM(n - df) AS lex_score
  FROM qtok q JOIN tok t USING (tok) JOIN dftab USING (tok) CROSS JOIN nn
  WHERE t.doc_id <> q.q_id
  GROUP BY 1, 2
),
lexr AS (
  SELECT q_id, doc_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY lex_score DESC, doc_id) AS INTEGER) AS lex_rank
  FROM lexs QUALIFY lex_rank <= 20
),
qv AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 4),
cv AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q_id, neighbor_id,
         {_DOT.format(a='cv', b='qv')}
         / (sqrt({_DOT.format(a='cv', b='cv')}) * sqrt({_DOT.format(a='qv', b='qv')})) AS cos
  FROM cv, qv WHERE neighbor_id <> q_id
),
semr AS (
  SELECT q_id, neighbor_id AS doc_id,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, neighbor_id) AS INTEGER) AS sem_rank
  FROM scored QUALIFY sem_rank <= 20
),
fused AS (
  SELECT COALESCE(l.q_id, s.q_id) AS q_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank, s.sem_rank,
         COALESCE(1.0::DOUBLE / (60 + l.lex_rank), 0.0)
         + COALESCE(1.0::DOUBLE / (60 + s.sem_rank), 0.0) AS score
  FROM lexr l FULL OUTER JOIN semr s
    ON s.q_id = l.q_id AND s.doc_id = l.doc_id
)
SELECT q_id, doc_id, lex_rank, sem_rank, round(score, 6) AS rrf_r,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS INTEGER) AS fused_rank
FROM fused QUALIFY fused_rank <= 5 ORDER BY q_id, fused_rank
"""


def events_hourly_counts(spark, sf_dir):
    """Streaming-shaped tumbling-window aggregation (batch equivalent of the
    Structured Streaming windowed agg in streaming/intake.py), on integer
    hour buckets so it is timezone-free."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.expr("ts DIV 3600000000").alias("hour_bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("sum_value"),
        )
    )


HOURLY_SQL = f"""
SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       SUM({_c('value')}) / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type
"""


def sessionize_summary(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) rolled up per user."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    s = ev.withColumn("new_sess", new_sess)
    return (
        s.groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SESSIONIZE_SQL = """
WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
s AS (
  SELECT user_id,
         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
"""


def events_hourly_moving_avg(spark, sf_dir):
    """Time-series resample with GAP FILLING + trailing 3-hour moving
    average: the dense hour axis is generated per event type
    (sequence+explode — no driver loop), missing buckets fill as 0, then a
    ROWS 2 PRECEDING window frame smooths."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            F.col("event_type"), F.expr("ts DIV 3600000000").alias("hb")
        )
        .agg(F.sum(_cents(F.col("value"))).alias("_c"))
    )
    span = hourly.groupBy("event_type").agg(
        F.min("hb").alias("_lo"), F.max("hb").alias("_hi")
    )
    axis = span.select(
        "event_type", F.explode(F.sequence("_lo", "_hi")).alias("hb")
    )
    dense = axis.join(hourly, ["event_type", "hb"], "left").select(
        "event_type", "hb", F.coalesce("_c", F.lit(0)).alias("_c")
    )
    w = Window.partitionBy("event_type").orderBy("hb").rowsBetween(-2, 0)
    return dense.select(
        "event_type",
        "hb",
        (F.col("_c") / 100.0).alias("sum_value"),
        F.round(F.avg(F.col("_c") / 100.0).over(w), 6).alias("mavg3_r"),
    )


HOURLY_MAVG_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hb, SUM({_c('value')}) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, MIN(hb) AS lo, MAX(hb) AS hi FROM hourly GROUP BY 1),
axis AS (SELECT event_type, unnest(generate_series(lo, hi)) AS hb FROM span),
dense AS (
  SELECT a.event_type, a.hb, COALESCE(h.c, 0) AS c
  FROM axis a LEFT JOIN hourly h ON a.event_type = h.event_type AND a.hb = h.hb
)
SELECT event_type, hb, c / 100.0 AS sum_value,
       round(AVG(c / 100.0) OVER (PARTITION BY event_type ORDER BY hb
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg3_r
FROM dense ORDER BY event_type, hb
"""


def asof_purchase_last_view(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent view at
    or before it (union+window implementation — no pair explosion)."""
    from unstructured_data_pipeline_spark.operators.relational import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_us")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vus")
    )
    out = asof_join(purchases, views, on="user_id", left_ts="purchase_us", right_ts="vus")
    return out.select(
        "event_id", "user_id", "purchase_us", F.col("vus_r").alias("last_view_us")
    )


ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS purchase_us FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, epoch_us(ts) AS vus FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.purchase_us,
       (SELECT MAX(v.vus) FROM v WHERE v.user_id = p.user_id AND v.vus <= p.purchase_us)
         AS last_view_us
FROM p ORDER BY p.event_id
"""


