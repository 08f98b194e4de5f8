"""round 6: data-skipping, binary ANN, theta, format/privacy

(split from the flat queries.py, round 10 - content unchanged)"""

from __future__ import annotations

from ._common import F, SIM, Window, _c, _cents, _events, _heavy, _t, os
from .dedup_text import _HEX16_12, _KMV_K, _kmv_val_spark, _kmv_val_sql

# ---------------------------------------------------------------------------
# round 6: data-skipping, binary ANN, theta set ops, format/privacy surface


def zonemap_pruning_report(spark, sf_dir):
    """Zone-map file skipping — the data-skipping half of the layout story
    (`zorder_layout_report` is the clustering half; every lakehouse format
    and the reference platform's micro-partition pruning work this way):
    events are laid out into user_id-clustered files (fixed-width id
    buckets, one file per bucket), a per-file min/max index is built in
    ONE scan (`operators/zonemaps.py`), and a range predicate first
    intersects the file zones so only overlapping files are scanned.  The
    report proves both halves of the contract: the pruned scan's answer
    equals the full-scan answer (n_rows / sum_cents / n_users), and the
    metadata-only decision read strictly fewer files (files_read <
    files_total).  At 100 TB the index is O(files) kilobytes, pruning is
    driver-side metadata, and scan cost tracks the selected range — not
    the table size."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.operators import zonemaps as ZM

    ev = _events(spark, sf_dir).select("user_id", _cents(F.col("value")).alias("cents"))
    mx = ev.agg(F.max("user_id")).first()[0]
    if mx is None:  # empty input: nothing to lay out, nothing to prune
        return spark.range(0).select(
            *(
                F.lit(0).cast("long").alias(c)
                for c in ("files_total", "files_read", "n_rows", "sum_cents", "n_users")
            )
        )
    w = max(1, mx // 8 + 1)  # fixed-width id buckets -> 8-ish clustered files
    root = tempfile.mkdtemp(prefix="udp_zonemap_")
    (
        ev.withColumn("bucket", F.expr(f"user_id div {w}"))
        .repartition("bucket")  # one task per bucket -> one file per dir
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(root)
    )
    zones = ZM.collect_zone_maps(spark, root, ["user_id"])
    lo, hi = w * 2 + w // 2, w * 6 + w // 3
    picked, files_read, files_total = ZM.pruned_read(spark, zones, "user_id", lo, hi)
    agg = (
        picked.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.lit(files_total).cast("long").alias("files_total"),
            F.lit(files_read).cast("long").alias("files_read"),
            F.col("n_rows").cast("long"),
            F.col("sum_cents").cast("long"),
            F.col("n_users").cast("long"),
        )
        .cache()
    )
    agg.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return agg


ZONEMAP_SQL = f"""
WITH e AS (SELECT user_id, {_c('value')} AS cents FROM events),
p AS (SELECT GREATEST(1, (MAX(user_id) // 8) + 1) AS w FROM e),
b AS (SELECT user_id // w AS bucket, user_id, cents FROM e, p),
zones AS (SELECT bucket, MIN(user_id) AS mn, MAX(user_id) AS mxu
          FROM b GROUP BY bucket),
bounds AS (SELECT w * 2 + w // 2 AS lo, w * 6 + w // 3 AS hi FROM p),
pruned AS (SELECT z.bucket FROM zones z, bounds
           WHERE z.mxu >= bounds.lo AND z.mn <= bounds.hi),
sel AS (SELECT b.user_id, b.cents FROM b, bounds
        WHERE b.user_id >= bounds.lo AND b.user_id <= bounds.hi)
SELECT (SELECT COUNT(*) FROM zones) AS files_total,
       (SELECT COUNT(*) FROM pruned) AS files_read,
       COUNT(*) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM sel
"""


def binary_quant_hamming_topk(spark, sf_dir):
    """Binary (1-bit) quantization ANN — the third point on the repo's
    compression/recall curve after float brute force (`emb_cosine_topk`)
    and int8 (`embedding_quantize_int8`) / PQ (`ann_pq_topk_contract`):
    each 64-dim float vector collapses to its 8-byte sign pattern (two
    32-bit words, `similarity.sign_bit_words`), and distance becomes
    XOR+popcount (`hamming_words`) — integer-exact, whole-stage-codegen,
    32x less data scanned per comparison.  Queries (vec_id < 8) broadcast
    against the quantized corpus; per-query rank window takes the Hamming
    top-5 with id tie-breaks.  At 10^9 vectors the quantized corpus is
    8 GB instead of 256 GB and the scan is pure ALU — the standard first
    stage of a two-stage (binary prefilter -> exact rerank) retriever."""
    emb = _t(spark, sf_dir, "embeddings")
    w0, w1 = SIM.sign_bit_words("embedding", dim=64, word_bits=32)
    packed = emb.select("vec_id", w0.alias("w0"), w1.alias("w1"))
    q = packed.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    scored = (
        packed.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            SIM.hamming_words(["q0", "q1"], ["w0", "w1"]).alias("hamming"),
        )
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .orderBy("q_id", "rnk")
    )


_SIGN_WORD_SQL = """list_sum(list_transform(generate_series(1, 32), i ->
  CASE WHEN {v}[i + {off}] > 0 THEN (CAST(1 AS BIGINT) << (i - 1))
       ELSE CAST(0 AS BIGINT) END))"""

BINARY_HAMMING_SQL = f"""
WITH packed AS (
  SELECT vec_id,
         {_SIGN_WORD_SQL.format(v='embedding', off=0)} AS w0,
         {_SIGN_WORD_SQL.format(v='embedding', off=32)} AS w1
  FROM embeddings
),
q AS (SELECT vec_id AS q_id, w0 AS q0, w1 AS q1 FROM packed WHERE vec_id < 8),
scored AS (
  SELECT q.q_id, p.vec_id AS neighbor_id,
         bit_count(xor(p.w0, q.q0)) + bit_count(xor(p.w1, q.q1)) AS hamming
  FROM packed p, q WHERE p.vec_id <> q.q_id
)
SELECT q_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
       CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY hamming, neighbor_id) AS rnk
      FROM scored) t
WHERE rnk <= 5 ORDER BY q_id, rnk
"""


def theta_sketch_setops(spark, sf_dir):
    """Theta-sketch set algebra — the capability that separates a sketch
    LIBRARY from a sketch COLUMN: `kmv_distinct_sketch` estimates one
    set's cardinality; this operator combines two sketches into
    union / intersection / difference estimates WITHOUT rescanning the
    data (Dasgupta et al., "Theta-Sketch Framework", and the DataSketches
    production design).  Sets: distinct purchasing users (A) vs distinct
    viewing users (B).  Each keeps its k smallest md5 hashes; theta is the
    smaller k-th value across the two sketches; every hash below theta is
    a uniform sample of the union, so |sample ∩ op| / theta estimates any
    set expression.  md5 makes the whole thing deterministic, so the
    approximate algorithm still carries an exact oracle hash gate (the
    KMV trick), and the report carries exact counts + rel_error per op.
    At scale: sketches are k values per set — set algebra over 100 TB
    tables becomes arithmetic over kilobytes, the warehouse pattern for
    distinct-overlap dashboards (audience overlap, id-join planning)."""
    k = _KMV_K
    theta_one = _HEX16_12  # "no truncation" theta for sets smaller than k
    ev = _events(spark, sf_dir)
    pairs = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.when(F.col("event_type") == "purchase", "A").otherwise("B").alias("s"),
            F.col("user_id").cast("string").alias("u"),
        )
        .distinct()
    )
    h = pairs.select("s", "u", F.md5(F.col("u")).alias("h"))
    w = Window.partitionBy("s").orderBy("h")
    ranked = h.withColumn("rn", F.row_number().over(w))
    hv = F.greatest(_kmv_val_spark(F.col("h")), F.lit(1))
    per_set = ranked.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rn") == k, hv)).alias("kth"),
    )
    theta = per_set.agg(
        F.min(
            F.when(F.col("n") >= k, F.col("kth")).otherwise(F.lit(theta_one))
        ).alias("theta")
    )
    sketch = ranked.filter(F.col("rn") <= k).select("s", "h", hv.alias("hv"))
    samples = sketch.join(F.broadcast(theta)).filter(F.col("hv") < F.col("theta"))
    marks = (
        samples.groupBy("h")
        .agg(
            F.max(F.when(F.col("s") == "A", 1).otherwise(0)).alias("ia"),
            F.max(F.when(F.col("s") == "B", 1).otherwise(0)).alias("ib"),
        )
        .agg(
            F.sum("ia").alias("sa"),
            F.sum("ib").alias("sb"),
            F.count(F.lit(1)).alias("su"),
            F.sum(F.col("ia") * F.col("ib")).alias("si"),
            F.sum(F.col("ia") * (1 - F.col("ib"))).alias("sd"),
        )
    )
    exact = (
        pairs.groupBy("u")
        .agg(
            F.max(F.when(F.col("s") == "A", 1).otherwise(0)).alias("ia"),
            F.max(F.when(F.col("s") == "B", 1).otherwise(0)).alias("ib"),
        )
        .agg(
            F.sum("ia").alias("ea"),
            F.sum("ib").alias("eb"),
            F.count(F.lit(1)).alias("eu"),
            F.sum(F.col("ia") * F.col("ib")).alias("ei"),
            F.sum(F.col("ia") * (1 - F.col("ib"))).alias("ed"),
        )
    )
    wide = marks.join(exact).join(theta)
    rows = wide.select(
        F.expr(
            "stack(5, 'A', sa, ea, 'B', sb, eb, 'union', su, eu,"
            " 'intersect', si, ei, 'a_minus_b', sd, ed) AS (op, n_sample, exact)"
        ),
        "theta",
    )
    est = (F.col("n_sample").cast("double") * F.lit(float(theta_one))) / F.col(
        "theta"
    ).cast("double")
    return rows.select(
        "op",
        F.col("n_sample").cast("long"),
        F.col("exact").cast("long"),
        F.round(est, 4).alias("est_r"),
        F.round(
            F.abs(est - F.col("exact")) / F.greatest(F.col("exact"), F.lit(1)), 4
        ).alias("rel_err"),
    ).orderBy("op")


THETA_SETOPS_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT CASE WHEN event_type = 'purchase' THEN 'A' ELSE 'B' END AS s,
         CAST(user_id AS VARCHAR) AS u
  FROM events WHERE event_type IN ('purchase', 'view')
),
h AS (SELECT s, u, md5(u) AS h FROM pairs),
ranked AS (
  SELECT s, h, GREATEST({_kmv_val_sql('h')}, 1) AS hv,
         row_number() OVER (PARTITION BY s ORDER BY h) AS rn
  FROM h
),
per_set AS (
  SELECT s, COUNT(*) AS n,
         MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth
  FROM ranked GROUP BY s
),
theta AS (
  SELECT MIN(CASE WHEN n >= {_KMV_K} THEN kth ELSE {_HEX16_12} END) AS theta
  FROM per_set
),
samples AS (
  SELECT r.s, r.h FROM ranked r, theta
  WHERE r.rn <= {_KMV_K} AND r.hv < theta.theta
),
marks AS (
  SELECT SUM(ia) AS sa, SUM(ib) AS sb, COUNT(*) AS su,
         SUM(ia * ib) AS si, SUM(ia * (1 - ib)) AS sd
  FROM (SELECT h, MAX(CASE WHEN s = 'A' THEN 1 ELSE 0 END) AS ia,
               MAX(CASE WHEN s = 'B' THEN 1 ELSE 0 END) AS ib
        FROM samples GROUP BY h)
),
exact AS (
  SELECT SUM(ia) AS ea, SUM(ib) AS eb, COUNT(*) AS eu,
         SUM(ia * ib) AS ei, SUM(ia * (1 - ib)) AS ed
  FROM (SELECT u, MAX(CASE WHEN s = 'A' THEN 1 ELSE 0 END) AS ia,
               MAX(CASE WHEN s = 'B' THEN 1 ELSE 0 END) AS ib
        FROM pairs GROUP BY u)
),
rows5 AS (
  SELECT 'A' AS op, sa AS n_sample, ea AS exact FROM marks, exact
  UNION ALL SELECT 'B', sb, eb FROM marks, exact
  UNION ALL SELECT 'union', su, eu FROM marks, exact
  UNION ALL SELECT 'intersect', si, ei FROM marks, exact
  UNION ALL SELECT 'a_minus_b', sd, ed FROM marks, exact
)
SELECT op, CAST(n_sample AS BIGINT) AS n_sample, CAST(exact AS BIGINT) AS exact,
       round((CAST(n_sample AS DOUBLE) * {float(_HEX16_12)}) / CAST(theta AS DOUBLE), 4)
         AS est_r,
       round(abs((CAST(n_sample AS DOUBLE) * {float(_HEX16_12)}) / CAST(theta AS DOUBLE)
                 - exact) / GREATEST(exact, 1), 4) AS rel_err
FROM rows5, theta ORDER BY op
"""


def orc_roundtrip_report(spark, sf_dir):
    """S7 export through the third sink format: orders written as ORC
    (`sources/export.py:export_orc_dir` — the Hive/Trino-lineage columnar
    interchange format, built into Spark), read back WITHOUT an explicit
    schema (ORC round-trips types natively — the point over CSV), and
    rolled up per order status.  Covers native-type fidelity for BIGINT,
    DOUBLE and TIMESTAMP_NTZ columns across the write->read boundary; the
    oracle computes the same rollup straight from the source table, so any
    type drift in the ORC path breaks the hash.  At scale ORC files carry
    per-stripe min/max (format-level zone maps) and Spark pushes filters
    to stripe level, so the export stays a queryable table."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.sources.export import export_orc_dir

    orders = _t(spark, sf_dir, "orders")
    out_dir = tempfile.mkdtemp(prefix="udp_orc_")
    export_orc_dir(orders, out_dir)
    back = spark.read.orc(out_dir)
    out = (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("sum_cents"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_date"),
            F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_date"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
        .cache()
    )
    out.count()  # materialize before the export dir is removed
    shutil.rmtree(out_dir, ignore_errors=True)
    return out


ORC_ROUNDTRIP_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM({_c('o_totalprice')}) AS BIGINT) AS sum_cents,
       MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_date,
       MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_date,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def pseudonymize_consistent_report(spark, sf_dir):
    """Privacy-preserving pseudonymization with referential integrity —
    the compliance transform a training-data pipeline applies before any
    table leaves the trust boundary (the de-identification sibling of
    `text_clean_pii`, which scrubs free text; this one handles STRUCTURED
    identifiers): direct ids are replaced by salted-md5 tokens
    (`functions.scalars.pseudonym`), names are masked to an initial, and
    — the part that makes it an operator rather than a UDF — BOTH the
    dimension and the fact table are tokenized with the same salt, then
    re-joined ON THE PSEUDONYM.  The per-segment rollup out of that
    pseudonym join hash-matching the oracle's raw-key rollup proves the
    tokenization is injective and consistent across tables: analytics
    survive, identifiers don't.  min_pid pins the token derivation itself
    cross-engine.  Row-local md5 at scan speed; the join shape is
    unchanged (same key cardinality), so plans at 100 TB are identical to
    the raw-key plans."""
    from unstructured_data_pipeline_spark.functions.scalars import pseudonym

    salt = "udp_pepper_v1"
    cust = _t(spark, sf_dir, "customer").select(
        pseudonym("c_custkey", salt).alias("pid"),
        F.concat(F.substring("c_name", 1, 1), F.lit("***")).alias("masked_name"),
        "c_mktsegment",
    )
    orders = _t(spark, sf_dir, "orders").select(
        pseudonym("o_custkey", salt).alias("pid"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    return (
        orders.join(cust, "pid")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("pid").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.countDistinct("masked_name").alias("n_masked_names"),
            F.min("pid").alias("min_pid"),
        )
        .orderBy("c_mktsegment")
    )


PSEUDONYMIZE_SQL = f"""
WITH cust AS (
  SELECT substr(md5('udp_pepper_v1:' || CAST(c_custkey AS VARCHAR)), 1, 24) AS pid,
         substr(c_name, 1, 1) || '***' AS masked_name, c_mktsegment
  FROM customer
),
o AS (
  SELECT substr(md5('udp_pepper_v1:' || CAST(o_custkey AS VARCHAR)), 1, 24) AS pid,
         {_c('o_totalprice')} AS cents
  FROM orders
)
SELECT c_mktsegment, COUNT(DISTINCT o.pid) AS n_customers,
       COUNT(*) AS n_orders, CAST(SUM(cents) AS BIGINT) AS sum_cents,
       COUNT(DISTINCT masked_name) AS n_masked_names, MIN(o.pid) AS min_pid
FROM o JOIN cust ON o.pid = cust.pid
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def _token_sign_pattern_spark(tok_col: str) -> F.Column:
    """8-bit sign pattern of a token's deterministic ±1 vector: bit j-1 is
    md5 nibble j's parity.  Two patterns' dot product (as ±1 vectors) is
    8 - 2*hamming — all integer, identical in DuckDB."""
    from unstructured_data_pipeline_spark.functions.text import hex_nibble_value

    h = F.md5(F.col(tok_col))
    pat = F.lit(0).cast("long")
    for j in range(8):
        pat = pat + (hex_nibble_value(F.substring(h, j + 1, 1)) % 2).cast(
            "long"
        ) * F.lit(1 << j)
    return pat


def _token_sign_pattern_sql(tok: str) -> str:
    terms = [
        f"((strpos('0123456789abcdef', substr(md5({tok}), {j + 1}, 1)) - 1) % 2)"
        f" * {1 << j}"
        for j in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def colbert_maxsim_topk(spark, sf_dir):
    """Late-interaction (ColBERT-style) multi-vector retrieval — the
    retrieval family the single-vector operators here can't express: a
    document is a BAG of token vectors, and relevance is MaxSim
    (Khattab & Zaharia 2020): sum over query tokens of the max similarity
    against any document token.  Token encoder: the deterministic ±1
    md5-sign vector (dim 8), stored as its 8-BIT SIGN PATTERN so the dot
    product collapses to ``8 - 2*popcount(xor)`` — the binary-quantization
    trick (`binary_quant_hamming_topk`) applied per token, making the
    whole late-interaction stack integer-exact and oracle-checkable.
    Queries: docs 0-3, first 8 tokens alphabetically (bounded).  Shape:
    the tiny query-token table broadcasts against the corpus token table;
    per-(query-token, doc) max then per-(query, doc) sum — two keyed
    aggregations, no all-pairs, fan-out per corpus token row bounded by
    |query tokens|.  Swap the md5 encoder for learned token embeddings
    (PQ-coded, `pq.py`) and the plan is production ColBERT."""
    docs = _heavy(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
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
    dtoks = toks.select(
        "doc_id", _token_sign_pattern_spark("tok").alias("dpat")
    )
    wq = Window.partitionBy("q_id").orderBy("tok")
    qtoks = (
        toks.filter(F.col("doc_id") < 4)
        .select(F.col("doc_id").alias("q_id"), "tok")
        .withColumn("qn", F.row_number().over(wq))
        .filter(F.col("qn") <= 8)
        .select("q_id", "tok", _token_sign_pattern_spark("tok").alias("qpat"))
    )
    dot = F.lit(8) - F.lit(2) * F.expr("bit_count(qpat ^ dpat)")
    per_qtok = (
        dtoks.join(F.broadcast(qtoks))
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "tok", "doc_id")
        .agg(F.max(dot).alias("best"))
    )
    scored = per_qtok.groupBy("q_id", "doc_id").agg(
        F.sum("best").alias("maxsim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("maxsim"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "doc_id", F.col("maxsim").cast("long"), "rnk")
        .orderBy("q_id", "rnk")
    )


COLBERT_MAXSIM_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        FROM documents)
  WHERE tok <> ''
),
dtoks AS (SELECT doc_id, {_token_sign_pattern_sql('tok')} AS dpat FROM toks),
qtoks AS (
  SELECT doc_id AS q_id, tok, {_token_sign_pattern_sql('tok')} AS qpat
  FROM (SELECT doc_id, tok,
               row_number() OVER (PARTITION BY doc_id ORDER BY tok) AS qn
        FROM toks WHERE doc_id < 4)
  WHERE qn <= 8
),
per_qtok AS (
  SELECT q.q_id, q.tok, d.doc_id,
         MAX(8 - 2 * bit_count(xor(CAST(q.qpat AS BIGINT),
                                   CAST(d.dpat AS BIGINT)))) AS best
  FROM dtoks d, qtoks q WHERE d.doc_id <> q.q_id
  GROUP BY q.q_id, q.tok, d.doc_id
),
scored AS (
  SELECT q_id, doc_id, SUM(best) AS maxsim FROM per_qtok GROUP BY q_id, doc_id
)
SELECT q_id, doc_id, CAST(maxsim AS BIGINT) AS maxsim, CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY maxsim DESC, doc_id) AS rnk
      FROM scored) t
WHERE rnk <= 5 ORDER BY q_id, rnk
"""


def join_cardinality_estimate(spark, sf_dir):
    """Join-size estimation by correlated hash sampling — the planner
    statistic behind every join-order / broadcast decision (Vengerov et
    al., VLDB'15; the same family AQE consults at runtime): |A ⋈ B| =
    Σ_k cntA(k)·cntB(k), estimated WITHOUT the join by sampling keys with
    md5(key) below a fixed threshold — both sides keep the SAME keys
    (correlated sampling — an independent row sample would almost never
    retain matching pairs), so Σ over sampled keys / p is unbiased.  Two
    join shapes are profiled: the FK fan-out join (orders⋈lineitem) and
    the dimension join (customer⋈orders).  Exact values ride along (two
    groupBys + a key-level join — never the row-level join itself), so
    the report hash-gates the estimator AND documents its rel_error.  At
    100 TB the sampled profile is 1/64 of the DISTINCT KEYS (not rows) —
    the stats collection a warehouse runs nightly to keep its optimizer
    honest."""
    p_inv = 64  # sample keys whose 48-bit md5 value < 2^48/64 -> p = 1/64
    thresh = _HEX16_12 // p_inv

    def profile(a, acol, b, bcol, label):
        ca = a.groupBy(F.col(acol).alias("k")).agg(F.count(F.lit(1)).alias("na"))
        cb = b.groupBy(F.col(bcol).alias("k")).agg(F.count(F.lit(1)).alias("nb"))
        keys = ca.join(cb, "k").withColumn(
            "hv", _kmv_val_spark(F.md5(F.col("k").cast("string")))
        )
        prod = F.col("na") * F.col("nb")
        return keys.agg(
            F.lit(label).alias("join_name"),
            F.count(F.lit(1)).cast("long").alias("n_keys_common"),
            F.sum(prod).cast("long").alias("exact_pairs"),
            F.sum(F.when(F.col("hv") < thresh, 1).otherwise(0))
            .cast("long")
            .alias("n_keys_sampled"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("hv") < thresh, prod)), F.lit(0)
                ).cast("double")
                * p_inv,
                4,
            ).alias("est_r"),
        )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    out = profile(orders, "o_orderkey", li, "l_orderkey", "orders_lineitem").unionByName(
        profile(cust, "c_custkey", orders, "o_custkey", "customer_orders")
    )
    return out.withColumn(
        "rel_err",
        F.round(
            F.abs(F.col("est_r") - F.col("exact_pairs"))
            / F.greatest(F.col("exact_pairs"), F.lit(1)),
            4,
        ),
    ).orderBy("join_name")


_JOINCARD_ONE_SQL = """
SELECT '{label}' AS join_name,
       COUNT(*) AS n_keys_common,
       CAST(SUM(na * nb) AS BIGINT) AS exact_pairs,
       CAST(SUM(CASE WHEN hv < {thresh} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keys_sampled,
       round(CAST(COALESCE(SUM(CASE WHEN hv < {thresh} THEN na * nb END), 0)
                  AS DOUBLE) * {p_inv}, 4) AS est_r
FROM (
  SELECT ca.k, na, nb, {hv} AS hv
  FROM (SELECT {acol} AS k, COUNT(*) AS na FROM {a} GROUP BY 1) ca
  JOIN (SELECT {bcol} AS k, COUNT(*) AS nb FROM {b} GROUP BY 1) cb
    ON ca.k = cb.k
)
"""


def _joincard_sql() -> str:
    thresh = _HEX16_12 // 64
    hv = _kmv_val_sql("md5(CAST(ca.k AS VARCHAR))")
    one = [
        _JOINCARD_ONE_SQL.format(
            label="orders_lineitem", a="orders", acol="o_orderkey",
            b="lineitem", bcol="l_orderkey", thresh=thresh, p_inv=64, hv=hv,
        ),
        _JOINCARD_ONE_SQL.format(
            label="customer_orders", a="customer", acol="c_custkey",
            b="orders", bcol="o_custkey", thresh=thresh, p_inv=64, hv=hv,
        ),
    ]
    return (
        "SELECT join_name, n_keys_common, exact_pairs, n_keys_sampled, est_r,\n"
        "       round(abs(est_r - exact_pairs) / GREATEST(exact_pairs, 1), 4)"
        " AS rel_err\n"
        "FROM (" + " UNION ALL ".join(one) + ") ORDER BY join_name"
    )


JOIN_CARDINALITY_SQL = _joincard_sql()


def compaction_report(spark, sf_dir):
    """The small-files problem and its steady-state fix, as a first-class
    contract: 16 single-file appends (a streaming/micro-batch ingest
    pattern) leave the table at 16 files — 16 tasks and 16 footer reads
    for every later scan — then ``ParquetTable.compact`` rewrites to 2.
    The report hash-gates what compaction must and must not change: file
    count drops 16 -> 2 (must), row count / value sum / per-type rollup
    are byte-identical (must not).  On a real lakehouse this is OPTIMIZE;
    here it's a version-publishing rewrite, so time travel to the
    pre-compaction version still works (`table_time_travel_report`)."""
    import shutil
    import tempfile

    from unstructured_data_pipeline_spark.operators.dml import ParquetTable

    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", _cents(F.col("value")).alias("cents")
    )
    root = tempfile.mkdtemp(prefix="udp_compact_")
    import glob as _glob

    t = ParquetTable(spark, root, "events_ingest", ev.schema)
    t.ensure()
    n_seed = len(_glob.glob(os.path.join(t.data_dir(), "*.parquet")))
    n_chunks = 16
    for i in range(n_chunks):  # micro-batch ingest: one small file each
        t.append(ev.filter(F.col("event_id") % n_chunks == i).coalesce(1))
    # ingest-added files only: ensure()'s empty seed file is bootstrap, not
    # ingest debt (it holds zero rows — the rollup below proves it)
    files_before = (
        len(_glob.glob(os.path.join(t.data_dir(), "*.parquet"))) - n_seed
    )
    files_after = t.compact(target_files=2)
    rollup = (
        t.read()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("sum_cents"))
        .select(
            F.lit(files_before).cast("long").alias("files_before"),
            F.lit(files_after).cast("long").alias("files_after"),
            "event_type",
            F.col("n_rows").cast("long"),
            F.col("sum_cents").cast("long"),
        )
        .orderBy("event_type")
        .cache()
    )
    rollup.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return rollup


COMPACTION_SQL = f"""
SELECT CAST(16 AS BIGINT) AS files_before, CAST(2 AS BIGINT) AS files_after,
       event_type, COUNT(*) AS n_rows,
       CAST(SUM({_c('value')}) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type ORDER BY event_type
"""


def dynamic_partition_pruning_report(spark, sf_dir):
    """Dynamic partition pruning — the run-time half of the pruning story
    (`zonemap_pruning_report` prunes with static metadata; DPP prunes with
    values DISCOVERED DURING EXECUTION): events are laid out
    hive-partitioned by event_type, and a join against a filtered
    dimension (the two alphabetically-first types) lets Spark inject the
    dim's surviving keys into the fact scan as a
    ``dynamicpruningexpression`` partition filter — the fact partitions
    for the other types are never opened.  The plan property is pinned by
    `test_dpp_plan_has_dynamic_pruning`; this report hash-gates the
    result: the DPP'd join's rollup equals the static IN-list oracle.  At
    100 TB this is THE mechanism that keeps star-schema joins from
    scanning the whole fact table when the predicate lives on the
    dimension (date ranges, category slices); it needs only (a) the fact
    partitioned on the join key and (b) a selective dim filter — both
    modeled here."""
    import shutil
    import tempfile

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", _cents(F.col("value")).alias("cents"), "event_type"
    )
    types = ev.select("event_type").distinct()
    if not types.head(1):  # empty input: nothing to partition or prune
        return spark.range(0).select(
            F.lit("").alias("event_type"),
            F.lit(0).cast("long").alias("pri"),
            F.lit(0).cast("long").alias("n_events"),
            F.lit(0).cast("long").alias("sum_cents"),
            F.lit(0).cast("long").alias("n_users"),
        )
    root = tempfile.mkdtemp(prefix="udp_dpp_")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(root)
    fact = spark.read.parquet(root)
    # dimension built from the data: types ranked alphabetically (a 5-row
    # bounded frame — the global window is over the DISTINCT type set, not
    # rows), with the filter pri <= 2 supplying DPP's selective predicate
    dim = types.withColumn(
        "pri",
        F.row_number().over(Window.orderBy("event_type")).cast("long"),
    ).filter(F.col("pri") <= 2)
    out = (
        fact.join(dim, "event_type")
        .groupBy("event_type", "pri")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
        .cache()
    )
    out.count()  # materialize before the scratch dir is removed
    shutil.rmtree(root, ignore_errors=True)
    return out


DPP_SQL = f"""
WITH e AS (SELECT event_id, user_id, {_c('value')} AS cents, event_type
           FROM events),
dim AS (
  SELECT event_type, pri FROM (
    SELECT event_type,
           row_number() OVER (ORDER BY event_type) AS pri
    FROM (SELECT DISTINCT event_type FROM e)
  ) WHERE pri <= 2
)
SELECT e.event_type, CAST(dim.pri AS BIGINT) AS pri, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM e JOIN dim ON e.event_type = dim.event_type
GROUP BY e.event_type, dim.pri ORDER BY e.event_type
"""


