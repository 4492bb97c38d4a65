"""Learning / model-fitting queries (SURVEY §2.7 extension — the
training-side ops a 100 TB data engine feeds): exact distributed OLS via
normal equations, with more to follow (importance weighting, calibration).

Cross-engine determinism: the engine solves the normal equations in
arbitrary-precision rationals over exact int64 sums; the oracle solves the
SAME system with HUGEINT (int128) Cramer determinants — both emit
floor(βᵢ·quant), so the fitted model itself is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table

_LR_QUANT = 10_000


def _floordiv(num: str, den: str) -> str:
    """DuckDB fragment: floor(num/den) for possibly-negative num, positive
    den (the kmeans-oracle floor trick — engine-independent semantics)."""
    return f"(({num}) - ((({num}) % ({den})) + ({den})) % ({den})) // ({den})"


def _linreg_oracle() -> str:
    """Cramer's rule on the 3×3 normal equations in HUGEINT. Magnitudes at
    sf0.1 (600k rows): XᵀX entries ≤ 1.5e9, det ~ 1e27, numerators ~ 3e32,
    ×quant ~ 3e36 < hugeint max 1.7e38 — exact with headroom."""
    q = _LR_QUANT
    fd = _floordiv
    outs = []
    for i, num in enumerate(("n0", "n1", "n2")):
        t = f"(CASE WHEN det < 0 THEN -{num} ELSE {num} END) * {q}"
        outs.append(
            f"CASE WHEN det = 0 THEN NULL ELSE "
            f"CAST({fd(t, 'dpos')} AS BIGINT) END AS beta{i}_q"
        )
    sel = ",\n       ".join(outs)
    return f"""
WITH t AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
                  CAST(l_quantity AS BIGINT) AS x1,
                  CAST(round(l_discount * 100) AS BIGINT) AS x2
           FROM lineitem),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1,
             CAST(sum(x2) AS HUGEINT) AS s2,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x1 * x1) AS HUGEINT) AS s11,
             CAST(sum(x1 * x2) AS HUGEINT) AS s12,
             CAST(sum(x2 * x2) AS HUGEINT) AS s22,
             CAST(sum(x1 * y) AS HUGEINT) AS s1y,
             CAST(sum(x2 * y) AS HUGEINT) AS s2y
      FROM t),
m AS (SELECT n, sy,
  n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s12 - s11 * s2) AS det,
  sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y) AS n0,
  n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2) AS n1,
  n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - s11 * s2) AS n2
 FROM s),
f AS (SELECT *, CASE WHEN det < 0 THEN -det ELSE det END AS dpos FROM m)
SELECT CAST(n AS BIGINT) AS n_rows,
       {sel}
FROM f
"""


@query("linreg_extprice_normal_eq", _linreg_oracle())
def q_linreg_extprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed OLS (price ~ quantity + discount, intercept): one
    partial-aggregate pass emits the integer Gram sums, the driver solves
    the 3×3 system in exact rationals — the fitted coefficients themselves
    hash-match the HUGEINT-Cramer SQL twin. The scan is the ONLY
    data-proportional stage (map-side combine; one row shuffles)."""
    from videos_to_tfrecords_spark.operators.regression import linreg_normal_eq

    li = load_table(spark, sf_dir, "lineitem")
    return linreg_normal_eq(
        li,
        y=F.round(F.col("l_extendedprice") * 100),
        xs=[F.col("l_quantity"), F.round(F.col("l_discount") * 100)],
        quant=_LR_QUANT,
    )


_DSIR_B = 4096


def _dsir_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    h = h15_sql("bgr", salt="dsir")
    lnq = "CAST(floor(1000000000 * ln(CAST({x} AS DOUBLE))) AS BIGINT)"
    return f"""
WITH d AS (SELECT doc_id, (lang = 'en') AS is_t, string_split(text, ' ') AS toks
           FROM documents),
f AS (SELECT doc_id, is_t,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bgr
      FROM d WHERE len(toks) >= 2),
b AS (SELECT doc_id, is_t, CAST({h} % {_DSIR_B} AS BIGINT) AS bkt FROM f),
db AS (SELECT doc_id, bkt, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
g AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cr,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct
      FROM b GROUP BY 1),
tot AS (SELECT {lnq.format(x=f"sum(cr) + {_DSIR_B}")}
               - {lnq.format(x=f"sum(ct) + {_DSIR_B}")} AS norm_q FROM g)
SELECT db.doc_id,
       CAST(sum(db.c) AS BIGINT) AS n_feats,
       CAST(sum(db.c * ({lnq.format(x="g.ct + 1")} - {lnq.format(x="g.cr + 1")}))
            + sum(db.c) * (SELECT norm_q FROM tot) AS BIGINT) AS logw_q
FROM db JOIN g USING (bkt)
GROUP BY db.doc_id
"""


@query("dsir_importance_weights", _dsir_oracle())
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting toward the English slice: hashed-bigram
    bucket distributions for target (lang='en') vs raw corpus, add-one
    smoothed, per-doc quantized log importance weight. Bucket table
    (≤4096 rows) broadcasts; only the (doc,bucket) combine shuffles."""
    from videos_to_tfrecords_spark.operators.text import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs, target=F.col("lang") == "en", n_buckets=_DSIR_B
    )


def _curation_oracle() -> str:
    from videos_to_tfrecords_spark.functions.textfn import shingles_sql

    sh5 = shingles_sql("toks")
    return f"""
WITH RECURSIVE
t0 AS (SELECT doc_id, text, lang, n_chars, string_split(text, ' ') AS toks
       FROM documents WHERE doc_id % 97 != 0),
q AS (SELECT doc_id, text, lang, toks FROM t0
      WHERE n_chars >= 50 AND len(toks) >= 10 AND lang IN ('en', 'de', 'fr')),
k1 AS (SELECT doc_id, lang, toks FROM (
         SELECT doc_id, lang, toks,
                min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM q)
       WHERE doc_id = cid),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({sh5}) AS s FROM k1),
p AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
dup AS MATERIALIZED (SELECT id_a, id_b FROM p JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE floor(1000.0 * common / (sa.n + sb.n - common)) >= 500),
edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM dup
          UNION SELECT id_b, id_a FROM dup),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node),
comp AS MATERIALIZED (SELECT node, min(r) AS component FROM reach GROUP BY node),
k2 AS (SELECT k1.doc_id, k1.lang, k1.toks FROM k1 LEFT JOIN comp
         ON comp.node = k1.doc_id
       WHERE comp.node IS NULL OR comp.component = k1.doc_id),
ev AS MATERIALIZED (SELECT DISTINCT unnest({sh5}) AS s
       FROM (SELECT string_split(text, ' ') AS toks FROM documents
             WHERE doc_id % 97 = 0)),
k2s AS (SELECT DISTINCT doc_id, unnest({sh5}) AS s FROM k2),
cont AS (SELECT DISTINCT k2s.doc_id FROM k2s JOIN ev USING (s)),
fin AS (SELECT doc_id, lang, toks FROM k2
        WHERE doc_id NOT IN (SELECT doc_id FROM cont))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(len(toks)) AS BIGINT) AS tok_sum
FROM fin GROUP BY lang
"""


@query("corpus_curation_e2e", _curation_oracle())
def q_corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END LLM corpus curation — the composition a pretraining data
    team actually runs, as ONE oracle-checked query: hold out the eval
    slice (id%97) → quality gate (length + word count) → language gate →
    EXACT dedup (md5 keep-first) → NEAR dedup (lossless prefix-filtered
    Jaccard pairs → connected components, keep the min-id rep) → benchmark
    DECONTAMINATION (drop docs sharing any 3-shingle with the eval slice)
    → per-language doc/token census. id_sum pins the exact surviving doc
    SET. Every stage is the registry's individually-verified operator;
    this proves the composition.

    Scale: stages chain equi-join/agg shapes only — the dedup candidate
    generation is banded, CC is edge-proportional, decontamination
    broadcasts eval shingles. Nothing quadratic, nothing driver-sided
    beyond CC's bounded union-find."""
    from videos_to_tfrecords_spark.operators.dedup import (
        connected_components,
        decontaminate_overlap,
        exact_dedup,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    n_toks = F.size(F.split(F.col("text"), " "))
    q = train.filter(
        (F.col("n_chars") >= 50)
        & (n_toks >= 10)
        & F.col("lang").isin("en", "de", "fr")
    )
    ex = exact_dedup(q).filter(~F.col("is_duplicate")).select("doc_id")
    # the survivor frames feed 2-3 DAG branches each (pair generation,
    # anti-joins, final census) — materialize once per stage boundary, the
    # 100 TB analog being an intermediate parquet table between stages
    kept1 = q.join(ex, "doc_id").localCheckpoint(eager=True)
    # near-dedup stage uses the LOSSLESS prefix-filtered similarity join
    # (r6 contract fix): this query's oracle computes ALL ≥-threshold pairs
    # exactly, and banded LSH can miss a true near-threshold pair — the r5
    # curation_funnel_census red row. Exact candidate generation makes
    # engine pairs ≡ oracle pairs by theorem, not by band luck.
    pairs = ngram_jaccard_pairs(kept1).select("id_a", "id_b")
    cc = connected_components(pairs)
    dropped = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept2 = kept1.join(dropped, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    contaminated = decontaminate_overlap(
        kept2, docs.filter(F.col("doc_id") % 97 == 0)
    ).select("doc_id")
    fin = kept2.join(contaminated, "doc_id", "left_anti")
    return fin.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("tok_sum"),
    )


@query(
    "mahalanobis_event_outliers",
    """
WITH e AS (SELECT event_id,
                  CAST(round(value) AS BIGINT) AS x,
                  ((epoch_ns(ts) // 1000) // 3600000000) % 24 AS h
           FROM events),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(h) AS HUGEINT) AS sh,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * h) AS sxh,
             sum(CAST(h AS HUGEINT) * h) AS shh
      FROM e),
c AS (SELECT n, sx, sh,
             CAST(n * sxx - sx * sx AS DOUBLE) AS c11,
             CAST(n * sxh - sx * sh AS DOUBLE) AS c12,
             CAST(n * shh - sh * sh AS DOUBLE) AS c22
      FROM s),
d AS (SELECT e.event_id,
             CAST(e.x * c.n - c.sx AS DOUBLE) AS r1,
             CAST(e.h * c.n - c.sh AS DOUBLE) AS r2,
             c.c11, c.c12, c.c22
      FROM e, c),
m AS (SELECT event_id,
             CAST(floor(1000000.0 * ((c22 * r1 * r1) - (2.0 * c12 * r1 * r2)
                        + (c11 * r2 * r2)) / ((c11 * c22) - (c12 * c12)))
                  AS BIGINT) AS d2_x1e6
      FROM d)
SELECT event_id, d2_x1e6 FROM m ORDER BY d2_x1e6 DESC, event_id LIMIT 20
""",
)
def q_mahalanobis_event_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate (Mahalanobis) outlier detection over (value,
    hour-of-day): one integer sufficient-statistics pass builds the exact
    co-moment matrix C = n·Sxx − SxSxᵀ, each row's d² = rᵀ adj(C) r /
    det(C) with r = n·x − Sx evaluates in ONE fixed double expression
    tree on exact integer inputs (bit-identical cross-engine, the
    bigram-LM libm argument), top-20 by quantized d². Complements the
    1-D median/MAD census with correlation-aware distance. Scale: one agg
    pass + one broadcast + TakeOrderedAndProject — no shuffle beyond the
    1-row stats."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        F.round("value").cast("long").alias("x"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("h"),
    )
    # corpus-level sums and their closing co-moment products in
    # DECIMAL(38,0) — n·sxx was within 4x of int64 max at sf1 (the acf
    # overflow class); oracle mirrors with HUGEINT, double cast at the
    # identical point
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    s = e.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("h").cast("long").alias("sh"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x")) * d38(F.col("h"))).alias("sxh"),
        F.sum(d38(F.col("h")) * d38(F.col("h"))).alias("shh"),
    )
    c = s.select(
        "n",
        "sx",
        "sh",
        (d38(F.col("n")) * F.col("sxx") - d38(F.col("sx")) * d38(F.col("sx")))
        .cast("double")
        .alias("c11"),
        (d38(F.col("n")) * F.col("sxh") - d38(F.col("sx")) * d38(F.col("sh")))
        .cast("double")
        .alias("c12"),
        (d38(F.col("n")) * F.col("shh") - d38(F.col("sh")) * d38(F.col("sh")))
        .cast("double")
        .alias("c22"),
    )
    d = e.crossJoin(F.broadcast(c)).select(
        "event_id",
        (F.col("x") * F.col("n") - F.col("sx")).cast("double").alias("r1"),
        (F.col("h") * F.col("n") - F.col("sh")).cast("double").alias("r2"),
        "c11",
        "c12",
        "c22",
    )
    num = (
        (F.col("c22") * F.col("r1") * F.col("r1"))
        - (F.lit(2.0) * F.col("c12") * F.col("r1") * F.col("r2"))
        + (F.col("c11") * F.col("r2") * F.col("r2"))
    )
    den = (F.col("c11") * F.col("c22")) - (F.col("c12") * F.col("c12"))
    m = d.select(
        "event_id",
        F.floor(F.lit(1_000_000.0) * num / den).cast("long").alias("d2_x1e6"),
    )
    return m.orderBy(F.col("d2_x1e6").desc(), "event_id").limit(20)


@query(
    "scd2_point_in_time_join",
    """
WITH o AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority,
         epoch_us(o_orderdate) // 1000 AS ts_ms, o_orderkey
  FROM orders),
flagged AS (
  SELECT *, CASE WHEN lag(priority) OVER w IS DISTINCT FROM priority
                 THEN 1 ELSE 0 END AS chg
  FROM o WINDOW w AS (PARTITION BY custkey ORDER BY ts_ms, o_orderkey)),
seg AS (
  SELECT *, sum(chg) OVER (PARTITION BY custkey ORDER BY ts_ms, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS seg_id
  FROM flagged),
hist0 AS (
  SELECT custkey, seg_id, priority,
         CAST(min(ts_ms) AS BIGINT) AS valid_from_ms
  FROM seg GROUP BY 1, 2, 3),
hist AS (
  SELECT custkey, priority, valid_from_ms,
         CAST(coalesce(lead(valid_from_ms) OVER (PARTITION BY custkey
                                                 ORDER BY seg_id),
                       32503680000000) AS BIGINT) AS valid_to_ms
  FROM hist0),
fact AS (
  SELECT o_custkey AS custkey,
         epoch_us(l_shipdate) // 1000 AS ship_ms,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
pit AS (
  SELECT coalesce(h.priority, 'NONE') AS priority_at_ship, f.cents
  FROM fact f LEFT JOIN hist h
    ON h.custkey = f.custkey
   AND h.valid_from_ms <= f.ship_ms AND f.ship_ms < h.valid_to_ms)
SELECT priority_at_ship,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM pit GROUP BY priority_at_ship
""",
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) lookup against the SCD2 dimension built from
    the order change feed: each shipment joins the priority version VALID
    AT ITS SHIP DATE ([valid_from, valid_to) interval containment) — the
    lakehouse PIT-join that keeps training features leakage-free
    (never joining a future dimension state). Shipments before a
    customer's first version census as 'NONE'. Equi-join on custkey with
    the interval predicate post-filtered; version counts per key are
    bounded, so the join output is fact-proportional."""
    from videos_to_tfrecords_spark.plans.mining_queries import q_scd2_history

    hist = q_scd2_history(spark, sf_dir).select(
        "custkey", "priority", "valid_from_ms", "valid_to_ms"
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.expr("unix_micros(l_shipdate) div 1000").cast("long").alias("ship_ms"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    pit = fact.join(
        hist,
        (hist.custkey == fact.custkey)
        & (hist.valid_from_ms <= fact.ship_ms)
        & (fact.ship_ms < hist.valid_to_ms),
        "left",
    ).select(
        F.coalesce(hist.priority, F.lit("NONE")).alias("priority_at_ship"),
        "cents",
    )
    return pit.groupBy("priority_at_ship").agg(
        F.count("*").alias("n_items"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@query(
    "length_bucket_batching",
    """
WITH d AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
b AS (SELECT n, CAST(length(bin(n)) - 1 AS BIGINT) AS bucket FROM d)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS tok_sum,
       CAST(sum((1 << (bucket + 1)) - n) AS BIGINT) AS pad_waste
FROM b GROUP BY bucket
""",
)
def q_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for dynamic batching (the padding-diet
    trick every training loader uses): docs bucket by ⌊log2(tokens)⌋
    (exact via binary-string length — no float log), per-bucket doc and
    token counts plus the padding waste of batching each bucket at its
    2^(b+1) ceiling. Purely narrow + one partial-final aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " "))
    b = docs.select(
        n.alias("n"),
        (F.length(F.bin(n.cast("long"))) - 1).cast("long").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").cast("long").alias("tok_sum"),
        F.sum(F.expr("shiftleft(1L, CAST(bucket + 1 AS INT)) - n"))
        .cast("long")
        .alias("pad_waste"),
    )


@query(
    "value_drift_emd",
    """
WITH e AS (SELECT LEAST(31, CAST(floor(value / 20) AS BIGINT)) AS b,
                  ((epoch_ns(ts) // 1000) // 86400000000) % 2 AS side
           FROM events),
c AS (SELECT b, CAST(count(*) FILTER (WHERE side = 0) AS BIGINT) AS ca,
             CAST(count(*) FILTER (WHERE side = 1) AS BIGINT) AS cb
      FROM e GROUP BY b),
spine AS (SELECT unnest(range(0, 32)) AS b),
f AS (SELECT spine.b, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
      FROM spine LEFT JOIN c ON c.b = spine.b),
cum AS (SELECT b,
               sum(ca) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cca,
               sum(cb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS ccb
        FROM f),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM f)
SELECT tot.na AS n_a, tot.nb AS n_b,
       CAST(sum(abs(cum.cca * tot.nb - cum.ccb * tot.na)) AS BIGINT) AS emd_num
FROM cum, tot GROUP BY tot.na, tot.nb
""",
)
def q_value_drift_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D earth-mover (Wasserstein) drift between even- and odd-day
    event-value distributions: 32 equi-width buckets, EMD = Σ_b |CDF_A −
    CDF_B| computed CROSS-MULTIPLIED in integers (Σ|CA·n_B − CB·n_A|) so
    no normalization float ever appears. Complements the chi-square
    monitor: EMD sees ORDERED bucket distance (a one-bucket shift is
    small, a far shift is large), χ² does not. The 32-row spine/cumsum is
    metadata-sized; the only data-proportional stage is the bucket
    count."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    e = ev.select(
        F.least(F.lit(31), F.expr("CAST(value / 20 AS BIGINT)")).alias("b"),
        F.expr("((unix_micros(ts)) div 86400000000) % 2").alias("side"),
    )
    c = e.groupBy("b").agg(
        F.count(F.when(F.col("side") == 0, 1)).cast("long").alias("ca"),
        F.count(F.when(F.col("side") == 1, 1)).cast("long").alias("cb"),
    )
    spine = spark.range(32).select(F.col("id").alias("b"))
    f = (
        spine.join(c, "b", "left")
        .select(
            "b",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = f.select(
        "b",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        "ca",
        "cb",
    )
    tot = f.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.sum(F.abs(F.col("cca") * F.col("nb") - F.col("ccb") * F.col("na")))
            .cast("long")
            .alias("emd_num")
        )
        .select(
            F.col("na").alias("n_a"), F.col("nb").alias("n_b"), "emd_num"
        )
    )


@query(
    "join_key_skew_report",
    """
WITH c AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_n,
             CAST(quantile_disc(n, 0.50) AS BIGINT) AS p50,
             CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99
      FROM c)
SELECT n_keys, n_rows, max_n, p50, p99,
       CAST((max_n * 1000000) // nullif(p50, 0) AS BIGINT) AS skew_x1e6
FROM s
""",
)
def q_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the pre-flight a 100 TB join plan reads
    before choosing salting/AQE settings: per-key cardinality profile of
    lineitem.l_orderkey (key count, row count, max, exact p50/p99 via
    percentile_disc on the KEY-COUNT table — distinct-key-sized, not
    corpus-sized) and the max/median skew ratio in exact integer parts."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").cast("long").alias("n")
    )
    s = c.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY n)")
        .cast("long")
        .alias("p50"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)")
        .cast("long")
        .alias("p99"),
    )
    return s.select(
        "n_keys",
        "n_rows",
        "max_n",
        "p50",
        "p99",
        F.expr("(max_n * 1000000) div nullif(p50, 0)").cast("long").alias(
            "skew_x1e6"
        ),
    )


def _funnel_oracle() -> str:
    from videos_to_tfrecords_spark.functions.textfn import shingles_sql

    sh5 = shingles_sql("toks")
    return f"""
WITH RECURSIVE
s1 AS MATERIALIZED (SELECT doc_id, text, lang, n_chars, string_split(text, ' ') AS toks
       FROM documents WHERE doc_id % 97 != 0),
s2 AS MATERIALIZED (SELECT * FROM s1 WHERE n_chars >= 50 AND len(toks) >= 10),
s3 AS MATERIALIZED (SELECT * FROM s2 WHERE lang IN ('en', 'de', 'fr')),
s4 AS MATERIALIZED (SELECT doc_id, lang, toks FROM (
         SELECT doc_id, lang, toks,
                min(doc_id) OVER (PARTITION BY md5(text)) AS cid FROM s3)
       WHERE doc_id = cid),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({sh5}) AS s FROM s4),
p AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
dup AS MATERIALIZED (SELECT id_a, id_b FROM p JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE floor(1000.0 * common / (sa.n + sb.n - common)) >= 500),
edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM dup
          UNION SELECT id_b, id_a FROM dup),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node),
comp AS MATERIALIZED (SELECT node, min(r) AS component FROM reach GROUP BY node),
s5 AS MATERIALIZED (SELECT s4.doc_id, s4.lang, s4.toks FROM s4 LEFT JOIN comp
         ON comp.node = s4.doc_id
       WHERE comp.node IS NULL OR comp.component = s4.doc_id),
ev AS MATERIALIZED (SELECT DISTINCT unnest({sh5}) AS s
       FROM (SELECT string_split(text, ' ') AS toks FROM documents
             WHERE doc_id % 97 = 0)),
s5s AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({sh5}) AS s FROM s5),
cont AS MATERIALIZED (SELECT DISTINCT s5s.doc_id FROM s5s JOIN ev USING (s)),
s6 AS MATERIALIZED (SELECT doc_id FROM s5 WHERE doc_id NOT IN (SELECT doc_id FROM cont))
-- r7 dtype-parity fix (VERDICT r6 #1): casting only the FIRST branch is
-- not enough — DuckDB's UNION ALL coerces the whole id_sum column to the
-- widest branch type, and the uncast branches' sum(BIGINT) is HUGEINT,
-- which fetches to pandas as float64 while the engine emits int64. The
-- driver's canonicalizer distinguishes int64 from float64, so the row was
-- red for two rounds. Cast the OUTER select so the UNION's coercion is
-- re-narrowed after the fact.
SELECT stage_idx, stage, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(id_sum AS BIGINT) AS id_sum FROM (
  SELECT 1 AS stage_idx, 'holdout' AS stage,
         count(*) AS n_docs, sum(doc_id) AS id_sum FROM s1
  UNION ALL SELECT 2, 'quality', count(*), sum(doc_id) FROM s2
  UNION ALL SELECT 3, 'language', count(*), sum(doc_id) FROM s3
  UNION ALL SELECT 4, 'exact_dedup', count(*), sum(doc_id) FROM s4
  UNION ALL SELECT 5, 'near_dedup', count(*), sum(doc_id) FROM s5
  UNION ALL SELECT 6, 'decontaminated', count(*), sum(doc_id) FROM s6)
"""


@query("curation_funnel_census", _funnel_oracle())
def q_curation_funnel_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition census of the curation pipeline — the funnel
    chart a data team watches per corpus version (each filter's survivor
    count + exact surviving-id sum). Stage frames are the E2E query's
    stages with the same checkpoints; six 1-row aggregates union at the
    end, so the observability costs one extra pass over each (already
    materialized) stage boundary."""
    from videos_to_tfrecords_spark.operators.dedup import (
        connected_components,
        decontaminate_overlap,
        exact_dedup,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.col("text"), " "))
    s1 = docs.filter(F.col("doc_id") % 97 != 0)
    s2 = s1.filter((F.col("n_chars") >= 50) & (n_toks >= 10))
    s3 = s2.filter(F.col("lang").isin("en", "de", "fr"))
    ex = exact_dedup(s3).filter(~F.col("is_duplicate")).select("doc_id")
    s4 = s3.join(ex, "doc_id").localCheckpoint(eager=True)
    # r6 contract fix: the oracle's near-dedup stage is the EXACT all-pairs
    # ≥0.5 Jaccard set, so the engine must generate candidates losslessly
    # (prefix-filter theorem) — banded LSH misses a true near-threshold
    # pair with probability (1−J^r)^b per pair, which is how this query
    # went red on the r5 driver box while staying green locally.
    pairs = ngram_jaccard_pairs(s4).select("id_a", "id_b")
    cc = connected_components(pairs)
    dropped = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    s5 = s4.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=True)
    contaminated = decontaminate_overlap(
        s5, docs.filter(F.col("doc_id") % 97 == 0)
    ).select("doc_id")
    s6 = s5.join(contaminated, "doc_id", "left_anti")

    def census(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )

    stages = [
        census(1, "holdout", s1),
        census(2, "quality", s2),
        census(3, "language", s3),
        census(4, "exact_dedup", s4),
        census(5, "near_dedup", s5),
        census(6, "decontaminated", s6),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


@query(
    "dataset_fingerprint",
    """
WITH h AS (SELECT CAST(concat('0x', substr(md5('fp:' || CAST(doc_id AS VARCHAR)
                  || ':' || md5(text)), 1, 15)) AS BIGINT) AS hv
           FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(hv % 1000000000000) AS BIGINT) AS content_sum,
       CAST(bit_xor(hv) AS BIGINT) AS content_xor
FROM h
""",
)
def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive dataset content fingerprint — the integrity stamp
    a corpus registry stores per version (any row added, dropped, or
    edited changes it; row order and partitioning cannot): per-row
    portable hash of (id, content-md5), combined by + and XOR. One narrow
    scan + one 1-row aggregate at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    hv = F.expr(
        "CAST(conv(substring(md5(concat('fp:', CAST(doc_id AS STRING), ':',"
        " md5(text))), 1, 15), 16, 10) AS BIGINT)"
    )
    h = docs.select(hv.alias("hv"))
    return h.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("hv") % 1_000_000_000_000).cast("long").alias("content_sum"),
        F.expr("bit_xor(hv)").cast("long").alias("content_xor"),
    )


@query(
    "sliding_distinct_users",
    """
WITH ud AS (SELECT DISTINCT user_id,
                   (epoch_ns(ts) // 1000) // 86400000000 AS d
            FROM events),
mm AS (SELECT min(d) AS dmin, max(d) AS dmax FROM ud),
spine AS (SELECT unnest(range((SELECT dmin FROM mm), (SELECT dmax FROM mm) + 1))
            AS s)
SELECT CAST(s AS BIGINT) AS win_start_day,
       CAST((SELECT count(DISTINCT user_id) FROM ud
             WHERE ud.d >= spine.s AND ud.d < spine.s + 7) AS BIGINT)
         AS n_users
FROM spine
""",
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sliding-window distinct count (7-day windows, 1-day stride) —
    the rolling-MAU metric COUNT(DISTINCT) windows can't do directly at
    scale. Engine algorithm: each (user, active-day) with previous active
    day p contributes exactly to window starts s ∈ [max(day−6, p+1, dmin),
    day] (first in-window occurrence ⇔ p < s), a ≤7-row fan-out — so the
    distinct count per window is a plain COUNT, no per-window set union,
    shuffle ∝ user-days·7. The oracle brute-forces COUNT(DISTINCT) per
    spine day — two entirely different algorithms agreeing is the check."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    mm = ud.agg(F.min("d").alias("dmin"))
    marked = (
        ud.withColumn("p", F.lag("d").over(w))
        .crossJoin(F.broadcast(mm))
        .select(
            "user_id",
            "d",
            F.greatest(
                F.col("d") - 6,
                F.coalesce(F.col("p") + 1, F.col("dmin")),
                F.col("dmin"),
            ).alias("s_lo"),
        )
    )
    contrib = marked.select(
        F.explode(F.sequence(F.col("s_lo"), F.col("d"))).alias("win_start_day")
    )
    counts = contrib.groupBy("win_start_day").agg(
        F.count("*").cast("long").alias("n_users")
    )
    # zero-fill the day spine so windows with no active users still emit
    # (sparse corpora; the oracle's spine always does)
    spine = (
        ud.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
        .select(
            F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias(
                "win_start_day"
            )
        )
    )
    return spine.join(counts, "win_start_day", "left").select(
        "win_start_day",
        F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
    )


@query(
    "purchase_attribution_last_touch",
    """
WITH e AS (SELECT event_id, user_id, event_type,
                  (epoch_ns(ts) // 1000) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
p AS (SELECT * FROM e WHERE event_type = 'purchase'),
tch AS (SELECT * FROM e WHERE event_type IN ('view', 'click')),
lt AS (SELECT p.event_id,
              (SELECT t.event_type FROM tch t
               WHERE t.user_id = p.user_id
                 AND (t.ts_us < p.ts_us
                      OR (t.ts_us = p.ts_us AND t.event_id < p.event_id))
               ORDER BY t.ts_us DESC, t.event_id DESC LIMIT 1) AS channel,
              p.cents
       FROM p)
SELECT coalesce(channel, 'organic') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM lt GROUP BY 1
""",
)
def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the user's
    most recent preceding view/click (µs + event-id tie-break), purchases
    with no prior touch are 'organic'. Engine: union + ONE per-user window
    pass (the asof_join shape — no join operator at all); oracle states
    the same thing as a correlated LIMIT 1 lookup. The classic marketing
    rollup, exact in integer cents."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("event_type").isin("purchase", "view", "click"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    touch_type = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    lt = e.withColumn(
        "channel", F.last(touch_type, ignorenulls=True).over(w)
    ).filter(F.col("event_type") == "purchase")
    return (
        lt.select(F.coalesce("channel", F.lit("organic")).alias("channel"), "cents")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


@query(
    "purchase_attribution_first_touch",
    """
WITH e AS (SELECT event_id, user_id, event_type,
                  (epoch_ns(ts) // 1000) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
p AS (SELECT * FROM e WHERE event_type = 'purchase'),
tch AS (SELECT * FROM e WHERE event_type IN ('view', 'click')),
ft AS (SELECT p.event_id,
              (SELECT t.event_type FROM tch t
               WHERE t.user_id = p.user_id
                 AND (t.ts_us < p.ts_us
                      OR (t.ts_us = p.ts_us AND t.event_id < p.event_id))
               ORDER BY t.ts_us ASC, t.event_id ASC LIMIT 1) AS channel,
              p.cents
       FROM p)
SELECT coalesce(channel, 'organic') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM ft GROUP BY 1
""",
)
def q_purchase_attribution_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution twin of the last-touch rollup: each purchase
    credits the user's EARLIEST preceding view/click (the acquisition-
    channel view of the same funnel). Engine: the same single per-user
    window pass, with ``first(…, ignorenulls)`` over the ordered frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("event_type").isin("purchase", "view", "click"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    ft = e.withColumn(
        "channel", F.first(touch_type, ignorenulls=True).over(w)
    ).filter(F.col("event_type") == "purchase")
    return (
        ft.select(F.coalesce("channel", F.lit("organic")).alias("channel"), "cents")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


def _shard_manifest_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    shard = h15_sql("doc_id", "shard")
    fp = h15_sql("text", "fp")
    return f"""
WITH c AS (SELECT greatest(4, (count(*) + 255) // 256) AS ns FROM documents)
SELECT CAST({shard} % ns AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum({fp} % 1000000) AS BIGINT) AS fingerprint
FROM documents, c
GROUP BY 1
"""


@query("shard_manifest", _shard_manifest_oracle())
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataloader shard manifest: every document hashes to one
    of ceil(n/256) shards (corpus-derived count, so shards stay
    size-bounded as the corpus grows — the round-3 lesson on fixed widths),
    and the manifest row per shard carries the stats a training job needs
    to plan epochs: doc count, char volume, source spread, and an
    order-independent content fingerprint (sum of bounded doc hashes —
    per-shard magnitude ≤ 256·10⁶ by construction, no overflow at any
    scale). Portable h15 hashing keeps assignment reproducible across
    engines and runs.

    Scale shape: one broadcast of a 1-row count, then a single partial→final
    aggregate keyed by shard_id — map-side combine collapses each partition
    to ≤ns rows before the exchange."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy().agg(
        F.greatest(
            F.lit(4), F.expr("(count(*) + 255) div 256")
        ).alias("ns")
    )
    d = docs.crossJoin(F.broadcast(c))
    return d.groupBy(
        (h15(F.col("doc_id").cast("string"), "shard") % F.col("ns"))
        .cast("long")
        .alias("shard_id")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum(h15("text", "fp") % 1000000).cast("long").alias("fingerprint"),
    )


_BT_ITERS = 3


def _bt_oracle() -> str:
    head = """
WITH bids AS MATERIALIZED (
  SELECT l_orderkey AS ord, l_suppkey AS supp,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS bid
  FROM lineitem GROUP BY 1, 2),
duels AS MATERIALIZED (
  SELECT CASE WHEN (a.bid > b.bid) OR (a.bid = b.bid AND a.supp > b.supp)
              THEN a.supp ELSE b.supp END AS w,
         CASE WHEN (a.bid > b.bid) OR (a.bid = b.bid AND a.supp > b.supp)
              THEN b.supp ELSE a.supp END AS l
  FROM bids a JOIN bids b ON a.ord = b.ord AND a.supp < b.supp),
wl AS MATERIALIZED (SELECT w AS i, l AS j, CAST(count(*) AS BIGINT) AS nw
       FROM duels GROUP BY 1, 2),
und AS MATERIALIZED (SELECT i, j, CAST(sum(nw) AS BIGINT) AS nij FROM (
          SELECT i, j, nw FROM wl UNION ALL SELECT j, i, nw FROM wl)
        GROUP BY 1, 2),
wins AS MATERIALIZED (SELECT i, CAST(sum(nw) AS BIGINT) AS wins FROM wl GROUP BY 1),
base AS MATERIALIZED (SELECT i, CAST(sum(nij) AS BIGINT) AS n_comparisons FROM und GROUP BY 1),
s0 AS MATERIALIZED (SELECT i, CAST(1000000 AS BIGINT) AS s FROM base)"""
    iters = []
    for k in range(1, _BT_ITERS + 1):
        p = f"s{k-1}"
        iters.append(
            f""",
d{k} AS MATERIALIZED (SELECT und.i, sum((und.nij * 1000000000000) // (si.s + sj.s)) AS d
       FROM und JOIN {p} si ON si.i = und.i JOIN {p} sj ON sj.i = und.j
       GROUP BY 1),
s{k} AS MATERIALIZED (SELECT d{k}.i,
              greatest((coalesce(w.wins, 0) * 1000000000000) // d{k}.d, 1) AS s
       FROM d{k} LEFT JOIN wins w ON w.i = d{k}.i)"""
        )
    tail = f"""
SELECT base.i AS player, CAST(coalesce(w.wins, 0) AS BIGINT) AS wins,
       base.n_comparisons, CAST(s{_BT_ITERS}.s AS BIGINT) AS strength
FROM base JOIN s{_BT_ITERS} ON s{_BT_ITERS}.i = base.i
LEFT JOIN wins w ON w.i = base.i"""
    return head + "".join(iters) + tail


@query("supplier_bt_strength", _bt_oracle())
def q_supplier_bt_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference aggregation (the RLHF preference-data
    fitting shape): within each order, every supplier pair is a pairwise
    duel won by the higher order-value side, and 3 MM iterations fit
    integer strengths (operators/preference.bradley_terry_integer). Duels
    are exploded IN-TASK from each order's sorted (bid, supplier) array
    (baskets bounded, no self-join shuffle — the market_basket codegen
    trick); the oracle unrolls the identical floor-arithmetic update into
    one CTE pair per iteration."""
    from videos_to_tfrecords_spark.operators.preference import (
        bradley_terry_integer,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    # one explicit order-keyed exchange serves BOTH aggregations below:
    # hash(ord) co-locates (ord, supp) and (ord) grouping alike, so the
    # per-supplier bid combine and the per-order duel explode run
    # exchange-free on top of it (plan-asserted 2 exchanges, not 3)
    bids = (
        li.repartition(F.col("l_orderkey"))
        .groupBy(F.col("l_orderkey").alias("ord"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("bid")
        )
    )
    # ascending (bid, supp) sort ⇒ in every in-task pair (x earlier, y
    # later) y is the duel winner; ties impossible (supp distinct per ord)
    duels = (
        bids.groupBy("ord")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bid", "supp"))
            ).alias("arr")
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr)),"
                    " y -> struct(y.supp AS winner, x.supp AS loser))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.winner").alias("winner"), F.col("p.loser").alias("loser"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return bradley_terry_integer(duels).select(
        F.col("player").cast("long").alias("player"),
        "wins",
        "n_comparisons",
        "strength",
    )


def _kappa_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    def lab(noise_salt: str, flip_salt: str) -> str:
        return (
            f"CASE WHEN {h15_sql('text', flip_salt)} % 10 < 2"
            f" THEN {h15_sql('text', noise_salt)} % 3"
            f" ELSE {h15_sql('text', 'kap-sig')} % 3 END"
        )

    return f"""
WITH lab AS (
  SELECT lang, {lab('kap-na', 'kap-fa')} AS a, {lab('kap-nb', 'kap-fb')} AS b
  FROM documents),
agg AS (
  SELECT lang, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS HUGEINT) AS n_agree,
         CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na0,
         CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS na1,
         CAST(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS na2,
         CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nb0,
         CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb1,
         CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS nb2
  FROM lab GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n, CAST(n_agree AS BIGINT) AS n_agree,
       CAST((1000000 * (n * n_agree - (na0*nb0 + na1*nb1 + na2*nb2)))
            // greatest(n * n - (na0*nb0 + na1*nb1 + na2*nb2), 1)
            AS BIGINT) AS kappa_ppm
FROM agg
"""


@query("annotator_kappa", _kappa_oracle())
def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-annotator agreement per language — the labeling
    QA gate a supervised-data pipeline runs before trusting labels. The
    two annotators are deterministic hash labelers sharing an 80% common
    signal (portable h15 salt families, so the oracle reproduces the exact
    label streams); kappa is the exact integer ppm
    floor(1e6·(n·agree − Σ_k nAk·nBk) / (n² − Σ_k nAk·nBk)), computed in
    DECIMAL(38,0)/HUGEINT because n² outgrows int64 on real corpora.

    Scale shape: one narrow scan, labels are map-side expressions, ONE
    partial→final aggregate keyed by lang — no joins, no windows."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    sig = h15(F.col("text"), "kap-sig") % 3

    def lab(noise_salt: str, flip_salt: str):
        return F.when(
            h15(F.col("text"), flip_salt) % 10 < 2,
            h15(F.col("text"), noise_salt) % 3,
        ).otherwise(sig)

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", lab("kap-na", "kap-fa").alias("a"), lab("kap-nb", "kap-fb").alias("b")
    )
    cnt = lambda c, k: F.sum(  # noqa: E731
        F.when(F.col(c) == k, 1).otherwise(0)
    ).cast("decimal(38,0)")
    agg = docs.groupBy("lang").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n_agree"),
        *[cnt("a", k).alias(f"na{k}") for k in range(3)],
        *[cnt("b", k).alias(f"nb{k}") for k in range(3)],
    )
    pe = "(na0*nb0 + na1*nb1 + na2*nb2)"
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.expr(
            # greatest(·, 1): a degenerate slice where chance agreement
            # equals 1 (pe == n², e.g. a single-doc language) makes kappa
            # 0/0 — clamp defines it as 0 instead of an ANSI div-by-zero
            f"CAST((1000000 * (n * n_agree - {pe}))"
            f" div greatest(n * n - {pe}, 1) AS BIGINT)"
        ).alias("kappa_ppm"),
    )


def _pref_e2e_oracle() -> str:
    # the Bradley-Terry CTE chain, then quartile stratification and the
    # winner-quartile × loser-quartile duel census
    bt = _bt_oracle()
    head, tail = bt.split("\nSELECT base.i AS player", 1)
    return (
        head
        + f""",
qt AS (SELECT i, ntile(4) OVER (ORDER BY s, i) AS q FROM s{_BT_ITERS}),
m AS (SELECT wq.q AS winner_q, lq.q AS loser_q,
             CAST(sum(wl.nw) AS BIGINT) AS n_duels,
             CAST(count(DISTINCT wl.i) AS BIGINT) AS n_winners,
             CAST(count(DISTINCT wl.j) AS BIGINT) AS n_losers
      FROM wl JOIN qt wq ON wq.i = wl.i JOIN qt lq ON lq.i = wl.j
      GROUP BY 1, 2)
SELECT CAST(winner_q AS BIGINT) AS winner_q, CAST(loser_q AS BIGINT) AS loser_q,
       n_duels, n_winners, n_losers FROM m"""
    )


@query("preference_pipeline_e2e", _pref_e2e_oracle())
def q_preference_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END preference-data mainline (the RLHF counterpart of
    corpus_curation_e2e): raw order events → pairwise duels → 3-iteration
    integer Bradley-Terry fit → quartile stratification of the fitted
    strengths → the winner-quartile × loser-quartile duel matrix a
    preference-pair curator reads to pick clean (chosen, rejected)
    training pairs (top-vs-bottom cells) and flag label noise
    (bottom-beats-top cells). Unlike the video/text mainlines this E2E is
    FULLY hash-checked — every stage is exact integer arithmetic.

    Scale note: the ntile window is global but runs over the PLAYER table
    (roster-sized, the AUC distinct-score precedent); the duel matrix
    joins are broadcast-roster attachments onto the persisted duel
    stream."""
    from pyspark.sql import Window

    from videos_to_tfrecords_spark.operators.preference import (
        bradley_terry_integer,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    bids = (
        li.repartition(F.col("l_orderkey"))
        .groupBy(F.col("l_orderkey").alias("ord"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("bid")
        )
    )
    duels = (
        bids.groupBy("ord")
        .agg(F.sort_array(F.collect_list(F.struct("bid", "supp"))).alias("arr"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr)),"
                    " y -> struct(y.supp AS winner, x.supp AS loser))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.winner").alias("winner"), F.col("p.loser").alias("loser"))
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    s = bradley_terry_integer(duels)
    # quartile the player table with the distributed exact ntile — the
    # player domain (suppliers) grows with the corpus, so no
    # single-partition ntile window (operators/ordered.py)
    from videos_to_tfrecords_spark.operators.ordered import global_ntile

    qt = global_ntile(
        s, [F.col("strength"), F.col("player")], 4, "q"
    ).select("player", "q")
    wq = qt.select(F.col("player").alias("winner"), F.col("q").alias("winner_q"))
    lq = qt.select(F.col("player").alias("loser"), F.col("q").alias("loser_q"))
    return (
        duels.join(F.broadcast(wq), "winner")
        .join(F.broadcast(lq), "loser")
        .groupBy("winner_q", "loser_q")
        .agg(
            F.sum("n").cast("long").alias("n_duels"),
            F.countDistinct("winner").cast("long").alias("n_winners"),
            F.countDistinct("loser").cast("long").alias("n_losers"),
        )
        .select(
            F.col("winner_q").cast("long").alias("winner_q"),
            F.col("loser_q").cast("long").alias("loser_q"),
            "n_duels",
            "n_winners",
            "n_losers",
        )
    )


@query(
    "source_loo_value",
    """
WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(n_chars) AS BIGINT) AS s
           FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st FROM t)
SELECT source, n AS n_docs,
       CAST((1000000 * s) // n AS BIGINT) AS mean_chars_ppm,
       CAST((1000000 * (st - s)) // (nt - n)
            - (1000000 * st) // nt AS BIGINT) AS loo_delta_ppm
FROM t, tot
""",
)
def q_source_loo_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation (the Shapley-style first cut a
    data-mixing team runs): for each source, how the corpus-level metric
    (mean chars/doc, in exact ppm) moves if that source is dropped — the
    sign tells you which sources pull the mixture up or down. One grouped
    aggregate plus a broadcast 1-row total; the LOO arithmetic is exact
    integer closed form, NO per-source rescan (the naive formulation
    re-aggregates the corpus once per source).

    Assumes every source is a strict subset of the corpus (nt > n —
    true by construction with ≥2 sources)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
    )
    tot = t.groupBy().agg(
        F.sum("n").cast("long").alias("nt"), F.sum("s").cast("long").alias("st")
    )
    return t.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.expr("(1000000 * s) div n").cast("long").alias("mean_chars_ppm"),
        F.expr("(1000000 * (st - s)) div (nt - n) - (1000000 * st) div nt")
        .cast("long")
        .alias("loo_delta_ppm"),
    )


@query(
    "mcnemar_model_compare",
    """
WITH p AS (SELECT (event_type = 'purchase') AS y,
                  (value > 30.0) AS a, (value > 40.0) AS b FROM events),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = y AND b != y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a_only,
             CAST(sum(CASE WHEN b = y AND a != y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b_only
      FROM p)
SELECT n, n_a_only, n_b_only,
       CAST(CASE WHEN n_a_only + n_b_only > 0
                 THEN (1000000 * GREATEST(abs(n_a_only - n_b_only) - 1, 0)
                               * GREATEST(abs(n_a_only - n_b_only) - 1, 0))
                      // (n_a_only + n_b_only)
                 ELSE 0 END AS BIGINT) AS mcnemar_chi2_ppm
FROM m
""",
)
def q_mcnemar_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test for comparing two classifiers on the SAME
    eval rows (the statistically correct A/B for model swaps — unpaired
    accuracy deltas waste the pairing): discordant counts b (A right, B
    wrong) and c (B right, A wrong) plus the continuity-corrected
    chi-square statistic (|b−c|−1)²/(b+c), exact in ppm. Models here are
    two deterministic value thresholds against the purchase label, so
    both engines score identical predictions.

    Scale shape: one narrow scan, all three counters in a single
    partial→final aggregate — nothing shuffles but 3 integers."""
    ev = load_table(spark, sf_dir, "events")
    y = F.col("event_type") == "purchase"
    a = F.col("value") > 30.0
    b = F.col("value") > 40.0
    m = ev.select(y.alias("y"), a.alias("a"), b.alias("b")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(((F.col("a") == F.col("y")) & (F.col("b") != F.col("y"))).cast("long"))
        .cast("long")
        .alias("n_a_only"),
        F.sum(((F.col("b") == F.col("y")) & (F.col("a") != F.col("y"))).cast("long"))
        .cast("long")
        .alias("n_b_only"),
    )
    return m.select(
        "n",
        "n_a_only",
        "n_b_only",
        F.when(
            F.col("n_a_only") + F.col("n_b_only") > 0,
            F.expr(
                "(1000000 * GREATEST(abs(n_a_only - n_b_only) - 1, 0)"
                " * GREATEST(abs(n_a_only - n_b_only) - 1, 0))"
                " div (n_a_only + n_b_only)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mcnemar_chi2_ppm"),
    )


_COMPACT_TARGET = 20_000  # chars per compacted output file


@query(
    "compaction_plan",
    f"""
WITH f AS (SELECT source, doc_id, n_chars,
                  CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS before
           FROM documents),
b AS (SELECT source, doc_id, n_chars, before // {_COMPACT_TARGET} AS bin FROM f)
SELECT source, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_chars) AS BIGINT) AS bytes,
       CAST(min(doc_id) AS BIGINT) AS first_id,
       CAST(max(doc_id) AS BIGINT) AS last_id
FROM b GROUP BY 1, 2
""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction PLANNER (the query-side twin of
    sources/layout.py's compaction writer): treating each doc as one small
    file sized by n_chars, assign id-ordered files within a source to
    sequential ~{_COMPACT_TARGET}-byte output bins via prefix sum — bin =
    bytes_before // target, the first-fit-in-order rule every table-format
    compactor (Iceberg/Delta OPTIMIZE) uses. Output: one manifest row per
    planned file with count/volume/id-range.

    Scale shape: one window partitioned by source (the planner's unit of
    work — partitions plan independently and in parallel), then a
    partial→final aggregate on (source, bin). Nothing corpus-wide ever
    sits in one task."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(
            f"coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            f" div {_COMPACT_TARGET}"
        ).alias("bin"),
    )
    return b.groupBy("source", F.col("bin").cast("long").alias("bin")).agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("n_chars").cast("long").alias("bytes"),
        F.min("doc_id").cast("long").alias("first_id"),
        F.max("doc_id").cast("long").alias("last_id"),
    )


# shift makes every quantized coordinate non-negative so integer floor
# division == truncating division in BOTH engines; (sv + n*K) // n =
# sv // n + K exactly, and centroid DIFFERENCES cancel the shift.
_CENT_SHIFT = 2_000_000


@query(
    "label_centroid_distances",
    f"""
WITH e AS (SELECT label,
                  list_transform(embedding::DOUBLE[],
                    x -> CAST(round(x * 1000000) AS BIGINT) + {_CENT_SHIFT}) AS v
           FROM embeddings),
idx AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1))
          AS k),
s AS (SELECT label, k, CAST(sum(v[k]) AS BIGINT) AS sv,
             CAST(count(*) AS BIGINT) AS n
      FROM e, idx GROUP BY 1, 2),
c AS (SELECT label, k, sv // n AS ctr FROM s),
p AS (SELECT a.label AS la, b.label AS lb,
             CAST(sum((a.ctr - b.ctr) * (a.ctr - b.ctr)) AS BIGINT) AS dist2
      FROM c a JOIN c b ON a.k = b.k AND a.label < b.label GROUP BY 1, 2)
SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b, dist2 FROM p
""",
)
def q_label_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise squared distances between per-label embedding centroids —
    the class-separation / domain-gap census a curation team reads before
    trusting label-conditioned sampling (collapsed centroids = labels an
    embedding model can't tell apart). Exact integer arithmetic: quantized
    coords are shifted non-negative (see _CENT_SHIFT) so the floor-divided
    centroid is engine-identical, and the shift cancels in differences.

    Scale shape: posexplode → one partial→final aggregate on (label, dim)
    (10×64 = 640 rows out of any corpus size), then a 45-pair broadcast
    self-join of planning-metadata-sized centroids. Corpus scans once."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = (
        emb.select(
            "label", F.posexplode("embedding").alias("k0", "x")
        )
        .groupBy(F.col("label").cast("long").alias("label"), "k0")
        .agg(
            F.sum(
                F.round(F.col("x").cast("double") * 1000000).cast("long")
                + F.lit(_CENT_SHIFT)
            ).alias("sv"),
            F.count("*").alias("n"),
        )
    )
    c = s.select("label", "k0", F.expr("sv div n").alias("ctr"))
    a = c.select(
        F.col("label").alias("label_a"), F.col("k0").alias("k"), F.col("ctr").alias("ca")
    )
    b = c.select(
        F.col("label").alias("label_b"), F.col("k0").alias("kb"), F.col("ctr").alias("cb")
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("k") == F.col("kb")) & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            .cast("long")
            .alias("dist2")
        )
    )


@query(
    "mixture_token_budget_plan",
    """
WITH s AS (SELECT source, CAST(sum(n_chars) // 4 AS BIGINT) AS toks
           FROM documents GROUP BY 1),
w AS (SELECT source, toks,
             CAST(floor(1000000 * sqrt(CAST(toks AS DOUBLE))) AS BIGINT) AS w
      FROM s),
t AS (SELECT CAST(sum(w) AS BIGINT) AS wt, CAST(sum(toks) // 2 AS BIGINT) AS budget
      FROM w)
SELECT source, toks, w,
       CAST(LEAST((budget * w) // wt, 2 * toks) AS BIGINT) AS alloc_toks,
       CAST((1000000 * LEAST((budget * w) // wt, 2 * toks)) // toks AS BIGINT)
         AS epochs_ppm
FROM w, t
""",
)
def q_mixture_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture PLAN per source — the concrete table a
    pretraining run is configured from (Pile/Dolma-style): estimated
    tokens (chars div 4), temperature weight √tokens (α=0.5; IEEE sqrt is
    correctly rounded, so the weight is bit-identical cross-engine),
    allocation of a half-corpus token budget ∝ weight with a 2-epoch
    repetition cap, and the resulting epochs-per-source in ppm (the
    repetition statistic data-constrained scaling laws care about).
    Single-pass plan; any capped-away remainder is visible as
    Σalloc < budget rather than silently redistributed.

    Scale shape: one source-keyed aggregate, one broadcast 1-row total —
    the mixture_alpha_weights profile on token volume instead of doc
    count. Money-sum-class overflow: budget·w ≤ 1e12·6e11 needs care past
    ~1e13 tokens; switch the close to DECIMAL(38) then (the acf note)."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.expr("CAST(sum(n_chars) div 4 AS BIGINT)").alias("toks")
    )
    w = s.select(
        "source",
        "toks",
        F.floor(F.lit(1_000_000) * F.sqrt(F.col("toks").cast("double")))
        .cast("long")
        .alias("w"),
    )
    t = w.agg(
        F.sum("w").cast("long").alias("wt"),
        F.expr("CAST(sum(toks) div 2 AS BIGINT)").alias("budget"),
    )
    alloc = F.least(
        F.expr("(budget * w) div wt"), F.lit(2) * F.col("toks")
    )
    return w.crossJoin(F.broadcast(t)).select(
        "source",
        "toks",
        "w",
        alloc.cast("long").alias("alloc_toks"),
        F.expr(
            "(1000000 * LEAST((budget * w) div wt, 2 * toks)) div toks"
        )
        .cast("long")
        .alias("epochs_ppm"),
    )


def _rep_audit_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    hs = h15_sql("CAST(doc_id AS VARCHAR)", salt="rep")
    return f"""
WITH d AS (SELECT source, n_chars, {hs} % 8 = 0 AS insamp FROM documents),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sx,
             sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx,
             CAST(sum(CASE WHEN insamp THEN 1 ELSE 0 END) AS BIGINT) AS ns,
             CAST(sum(CASE WHEN insamp THEN n_chars ELSE 0 END) AS BIGINT) AS ss
      FROM d GROUP BY 1)
SELECT source, n, ns,
       CAST((1000000 * ss) // ns - (1000000 * sx) // n AS BIGINT) AS delta_ppm,
       CAST(floor(1000000.0 * ((1000000 * ss) // ns - (1000000 * sx) // n)
            / (1000000.0 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                / (CAST(n AS DOUBLE) * n) / ns)))
            AS BIGINT) AS z_x1e6
FROM s WHERE ns > 0 AND n * sxx > CAST(sx AS HUGEINT) * sx
"""


@query("sample_representativeness_audit", _rep_audit_oracle())
def q_sample_representativeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling QA: does the 1-in-8 portable-hash sample reproduce each
    source's mean document length? Per source: full vs sample mean delta
    (exact integer ppm of a char) and its z-score against the full-corpus
    standard error — the canary a pipeline checks before trusting any
    hash-sampled metric (a biased sampler shows |z| inflating with n).
    Sufficient statistics are exact integers (Σx² in DECIMAL(38)/HUGEINT);
    the single closing float division + sqrt uses an identical expression
    tree in both engines.

    Scale shape: one scan, one source-keyed partial→final aggregate
    carrying five integers — the sample needs no second pass because
    membership is a hash predicate, not a shuffle."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    docs = load_table(spark, sf_dir, "documents")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    insamp = h15(F.col("doc_id").cast("string"), salt="rep") % 8 == 0
    s = docs.select("source", "n_chars", insamp.alias("insamp")).groupBy(
        "source"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(d38(F.col("n_chars")) * d38(F.col("n_chars"))).alias("sxx"),
        F.sum(F.when(F.col("insamp"), 1).otherwise(0)).cast("long").alias("ns"),
        F.sum(F.when(F.col("insamp"), F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("ss"),
    )
    delta = F.expr("(1000000 * ss) div ns - (1000000 * sx) div n")
    var_over_ns = (
        (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        / (F.col("n").cast("double") * F.col("n"))
        / F.col("ns")
    )
    return (
        s.filter(
            (F.col("ns") > 0)
            & (d38(F.col("n")) * F.col("sxx") > d38(F.col("sx")) * d38(F.col("sx")))
        )
        .select(
            "source",
            "n",
            "ns",
            delta.cast("long").alias("delta_ppm"),
            F.floor(
                F.lit(1000000.0)
                * delta.cast("double")
                / (F.lit(1000000.0) * F.sqrt(var_over_ns))
            )
            .cast("long")
            .alias("z_x1e6"),
        )
    )


@query(
    "cohort_did_purchase",
    """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
            FROM events),
uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ne FROM events GROUP BY 1),
thr AS (SELECT CAST(sum(ne) // count(*) AS BIGINT) AS thr FROM uc),
hv AS (SELECT user_id FROM uc, thr WHERE ne > thr),
p AS (SELECT coalesce(h.t, FALSE) AS treated,
             2 * epoch_us(e.ts) >= (SELECT mm FROM mm) AS post,
             CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e
      LEFT JOIN (SELECT user_id, TRUE AS t FROM hv) h USING (user_id)
      WHERE e.event_type = 'purchase'),
c AS (SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s FROM p GROUP BY 1, 2),
did AS (SELECT (SELECT s // n FROM c WHERE treated AND post)
             - (SELECT s // n FROM c WHERE treated AND NOT post)
             - (SELECT s // n FROM c WHERE NOT treated AND post)
             + (SELECT s // n FROM c WHERE NOT treated AND NOT post) AS dd)
SELECT treated, post, n, CAST(s // n AS BIGINT) AS mean_cents,
       CAST((SELECT dd FROM did) AS BIGINT) AS did_cents
FROM c
""",
)
def q_cohort_did_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences read-out — the causal first cut a growth
    team runs before an A/B exists: cohorts split on a DATA-DERIVED
    activity threshold (heavy = per-user event count strictly above the
    corpus mean — roughly half the users at any SF, so all four cells
    exist), periods split at the corpus temporal midpoint (the drift
    convention), outcome = mean purchase cents. Cell means and
    DiD = (T_post−T_pre)−(C_post−C_pre) are exact integer floor
    arithmetic; the same did_cents rides on every one of the 4 rows.

    Scale shape: per-user census → 1-row threshold broadcast → semi-join
    flag → one 4-cell aggregate; the 4-cell collect is metadata-sized
    (the kmeans-centroid stance)."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    uc = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("ne"))
    thr = uc.agg(F.expr("CAST(sum(ne) div count(*) AS BIGINT)").alias("thr"))
    hv = (
        uc.crossJoin(F.broadcast(thr))
        .filter(F.col("ne") > F.col("thr"))
        .select("user_id")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mm))
        .join(F.broadcast(hv.withColumn("is_t", F.lit(True))), "user_id", "left")
        .select(
            F.coalesce("is_t", F.lit(False)).alias("treated"),
            (2 * F.unix_micros("ts") >= F.col("mm")).alias("post"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    c = p.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    cells = c.collect()  # 4 rows - metadata-sized
    m = {(r["treated"], r["post"]): r["s"] // r["n"] for r in cells}
    did = (
        m[(True, True)] - m[(True, False)] - m[(False, True)] + m[(False, False)]
    )
    return spark.createDataFrame(
        [(r["treated"], r["post"], r["n"], r["s"] // r["n"], did) for r in cells],
        "treated boolean, post boolean, n long, mean_cents long, did_cents long",
    )


@query(
    "dataset_datasheet",
    """
WITH d AS (SELECT doc_id, source, lang, n_chars,
                  len(string_split(text, ' ')) AS toks,
                  md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS k8
           FROM documents),
base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(sum(toks) AS BIGINT) AS total_ws_tokens,
                CAST(count(*) - count(DISTINCT k8) AS BIGINT) AS leading8_dup_rows
         FROM d),
med AS (SELECT CAST(x AS BIGINT) AS median_chars_lower FROM (
          SELECT n_chars AS x,
                 CAST(coalesce(sum(t) OVER (ORDER BY n_chars ROWS BETWEEN
                        UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum,
                 t, (SELECT n_docs FROM base) AS n
          FROM (SELECT n_chars, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1))
        WHERE cum < (n + 1) // 2 AND cum + t >= (n + 1) // 2)
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, n_docs AS value FROM base
  UNION ALL SELECT 'n_sources', n_sources FROM base
  UNION ALL SELECT 'n_langs', n_langs FROM base
  UNION ALL SELECT 'total_chars', total_chars FROM base
  UNION ALL SELECT 'mean_chars', total_chars // n_docs FROM base
  UNION ALL SELECT 'total_ws_tokens', total_ws_tokens FROM base
  UNION ALL SELECT 'leading8_dup_rows', leading8_dup_rows FROM base
  UNION ALL SELECT 'dup_rate_ppm', (1000000 * leading8_dup_rows) // n_docs
            FROM base
  UNION ALL SELECT 'median_chars_lower', median_chars_lower FROM med)
""",
)
def q_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset DATASHEET in one query — the key/value card (datasheets
    for datasets) a release ships with: row/source/language counts, char
    and whitespace-token volume, mean and exact lower-median length, and
    the leading-8-token duplicate rate. Everything integer-exact; the
    median comes from the distinct-length census (cum < ⌈n/2⌉ ≤ cum+t),
    not a sort of the corpus.

    Scale shape: ONE corpus scan feeds a single multi-metric aggregate
    (count distincts included), plus a length-census window that is
    value-domain-sized. Output is 9 (metric, value) rows.

    r11 (guide §5, the price_mad fix pattern): ZERO mid-query collects —
    the old form ran TWO driver collects, each re-running a corpus scan,
    then assembled literals on the driver. Now the 8 base metrics unpivot
    from the 1-row aggregate with one ``stack`` (a single reference, so
    the corpus aggregate executes once) and the exact lower median comes
    off the checkpointed length census with n derived from the census
    itself — the whole query is one plan."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
        F.md5(F.array_join(F.slice(F.split("text", " "), 1, 8), " ")).alias("k8"),
    )
    base = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("toks").cast("long").alias("total_ws_tokens"),
        (F.count("*") - F.count_distinct("k8"))
        .cast("long")
        .alias("leading8_dup_rows"),
    )
    metrics = base.select(
        F.expr(
            "stack(8,"
            " 'n_docs', n_docs,"
            " 'n_sources', n_sources,"
            " 'n_langs', n_langs,"
            " 'total_chars', total_chars,"
            " 'mean_chars', total_chars div n_docs,"
            " 'total_ws_tokens', total_ws_tokens,"
            " 'leading8_dup_rows', leading8_dup_rows,"
            " 'dup_rate_ppm', (1000000 * leading8_dup_rows) div n_docs"
            ") AS (metric, value)"
        )
    ).select("metric", F.col("value").cast("long").alias("value"))
    # value-domain-bounded length census (checkpointed: it feeds n AND the
    # median filter); the single-partition window is the allowed bounded
    # case per SCALE.md — census rows ∝ distinct n_chars, not corpus rows
    cen = (
        d.groupBy("n_chars")
        .agg(F.count("*").cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    nf = cen.agg(F.sum("t").cast("long").alias("n"))
    wb = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    med = (
        cen.withColumn(
            "cum", F.coalesce(F.sum("t").over(wb), F.lit(0)).cast("long")
        )
        .crossJoin(F.broadcast(nf))
        .filter(
            (F.col("cum") < F.expr("(n + 1) div 2"))
            & (F.col("cum") + F.col("t") >= F.expr("(n + 1) div 2"))
        )
        .select(
            F.lit("median_chars_lower").alias("metric"),
            F.col("n_chars").cast("long").alias("value"),
        )
    )
    return metrics.unionByName(med)


@query(
    "churn_training_frame",
    """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS hi FROM events),
cut AS (SELECT lo + ((hi - lo) * 8) // 10 AS cut FROM mm),
u AS (SELECT user_id,
             CAST(sum(CASE WHEN epoch_us(ts) < (SELECT cut FROM cut)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
             CAST(sum(CASE WHEN epoch_us(ts) < (SELECT cut FROM cut)
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents_pre,
             CAST(max(CASE WHEN epoch_us(ts) < (SELECT cut FROM cut)
                           THEN epoch_us(ts) END) AS BIGINT) AS last_pre_us,
             CAST(max(CASE WHEN epoch_us(ts) >= (SELECT cut FROM cut)
                           THEN 1 ELSE 0 END) AS BIGINT) AS active_post
      FROM events GROUP BY user_id)
SELECT user_id, n_pre, cents_pre,
       CAST(((SELECT cut FROM cut) - last_pre_us) // 86400000000 AS BIGINT)
         AS recency_days,
       CAST(1 - active_post AS BIGINT) AS churned
FROM u WHERE n_pre > 0
""",
)
def q_churn_training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe churn training frame — the temporal-hygiene pattern
    every production label pipeline must get right: features (activity
    count, spend, recency) computed ONLY from events strictly before the
    80% temporal cutoff; the label (churned = no activity after) ONLY
    from events at-or-after it. One pass, one group-by — the CASE-split
    aggregate IS the point-in-time join here, with the cutoff a
    corpus-derived exact integer (µs epoch arithmetic, no float time).
    Users with no pre-cutoff history are excluded (they have no features,
    and including them would leak the label through row existence).

    Scale shape: single scan, user-keyed partial→final aggregate, 1-row
    broadcast cutoff. Nothing else shuffles."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        F.min(F.unix_micros("ts")).cast("long").alias("lo"),
        F.max(F.unix_micros("ts")).cast("long").alias("hi"),
    ).select(
        (F.col("lo") + F.expr("((hi - lo) * 8) div 10")).cast("long").alias("cut")
    )
    us = F.unix_micros("ts")
    pre = us < F.col("cut")
    u = (
        ev.crossJoin(F.broadcast(mm))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("n_pre"),
            F.sum(
                F.when(pre, F.round(F.col("value") * 100).cast("long")).otherwise(0)
            )
            .cast("long")
            .alias("cents_pre"),
            F.max(F.when(pre, us)).cast("long").alias("last_pre_us"),
            F.max(F.when(~pre, 1).otherwise(0)).cast("long").alias("active_post"),
            F.max("cut").alias("cut"),
        )
    )
    return u.filter(F.col("n_pre") > 0).select(
        "user_id",
        "n_pre",
        "cents_pre",
        F.expr("(cut - last_pre_us) div 86400000000").cast("long").alias(
            "recency_days"
        ),
        (F.lit(1) - F.col("active_post")).cast("long").alias("churned"),
    )


@query(
    "bandit_replay_eval",
    """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
            FROM events),
pre AS (SELECT user_id, event_type,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv
        FROM events WHERE 2 * epoch_us(ts) < (SELECT mm FROM mm)
        GROUP BY 1, 2),
pol AS (SELECT user_id, event_type AS arm FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY sv DESC, event_type) AS r FROM pre) WHERE r = 1),
post AS (SELECT e.user_id, e.event_type,
                CAST(round(e.value * 100) AS BIGINT) AS cents
         FROM events e WHERE 2 * epoch_us(e.ts) >= (SELECT mm FROM mm)),
m AS (SELECT CAST(count(*) AS BIGINT) AS n_post,
             CAST(sum(cents) AS BIGINT) AS s_post FROM post),
r AS (SELECT CAST(count(*) AS BIGINT) AS n_match,
             CAST(sum(p.cents) AS BIGINT) AS s_match
      FROM post p JOIN pol ON pol.user_id = p.user_id
                 AND pol.arm = p.event_type)
SELECT n_post, n_match,
       CAST(s_post // n_post AS BIGINT) AS mean_cents_logged,
       CAST(s_match // n_match AS BIGINT) AS mean_cents_policy,
       CAST((1000000 * (CAST(s_match AS HUGEINT) * n_post
                        - CAST(s_post AS HUGEINT) * n_match))
            // (CAST(s_post AS HUGEINT) * n_match) AS BIGINT) AS lift_ppm
FROM m, r
""",
)
def q_bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy REPLAY evaluation (Li et al.'s unbiased bandit replay,
    uniform logging assumed): fit a per-user favorite-arm policy on the
    FIRST temporal half (argmax of summed reward, fully tie-broken), then
    score it only on second-half events whose logged arm matches the
    policy's choice — the matched-events mean against the logged baseline,
    with the lift as one exact integer closing ratio. The temporal split
    keeps fit and eval disjoint (the churn-frame hygiene applied to
    policy evaluation).

    Scale shape: two scans split by the broadcast midpoint; the policy
    table is user-keyed (one row per user) and joins the replay half on
    (user, arm) — partial aggregates everywhere, no corpus-wide window
    (the argmax runs per user)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    e = ev.crossJoin(F.broadcast(mm)).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (2 * F.unix_micros("ts") < F.col("mm")).alias("pre"),
    )
    preagg = (
        e.filter("pre")
        .groupBy("user_id", "event_type")
        .agg(F.sum("cents").cast("long").alias("sv"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("sv"), F.asc("event_type"))
    pol = (
        preagg.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("user_id", F.col("event_type").alias("arm"))
    )
    post = e.filter(~F.col("pre"))
    m = post.agg(
        F.count("*").cast("long").alias("n_post"),
        F.sum("cents").cast("long").alias("s_post"),
    )
    r = post.join(
        pol,
        (post.user_id == pol.user_id) & (post.event_type == pol.arm),
    ).agg(
        F.count("*").cast("long").alias("n_match"),
        F.sum("cents").cast("long").alias("s_match"),
    )
    return m.crossJoin(r).select(
        "n_post",
        "n_match",
        F.expr("CAST(s_post div n_post AS BIGINT)").alias("mean_cents_logged"),
        F.expr("CAST(s_match div n_match AS BIGINT)").alias("mean_cents_policy"),
        F.expr(
            "CAST((1000000 * (CAST(s_match AS DECIMAL(38,0)) * n_post"
            " - CAST(s_post AS DECIMAL(38,0)) * n_match))"
            " div (CAST(s_post AS DECIMAL(38,0)) * n_match) AS BIGINT)"
        ).alias("lift_ppm"),
    )


@query(
    "conformal_coverage_eval",
    """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
            FROM events),
e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             2 * epoch_us(ts) < (SELECT mm FROM mm) AS cal
      FROM events),
mu AS (SELECT event_type, CAST(sum(cents) // count(*) AS BIGINT) AS pred
       FROM e WHERE cal GROUP BY 1),
res AS (SELECT abs(e.cents - mu.pred) AS r
        FROM e JOIN mu USING (event_type) WHERE e.cal),
rc AS (SELECT r, CAST(count(*) AS BIGINT) AS t FROM res GROUP BY 1),
nc AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM rc),
qh AS (SELECT CAST(min(r) AS BIGINT) AS qhat FROM (
         SELECT r, CAST(sum(t) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         FROM rc), nc
       WHERE cum * 10 >= 9 * (n + 1)),
ev AS (SELECT abs(e.cents - mu.pred) <= (SELECT qhat FROM qh) AS covered
       FROM e JOIN mu USING (event_type) WHERE NOT e.cal)
SELECT (SELECT n FROM nc) AS n_calibration,
       (SELECT qhat FROM qh) AS qhat_cents,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST((1000000 * sum(CASE WHEN covered THEN 1 ELSE 0 END)) // count(*)
            AS BIGINT) AS coverage_ppm
FROM ev
""",
)
def q_conformal_coverage_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction, end to end: fit a per-arm mean
    predictor on the calibration (first temporal) half, take the
    conformal quantile q̂ = the ⌈0.9(n+1)⌉-th smallest absolute residual
    (exact order statistic off the residual census — the finite-sample-
    valid quantile, not the empirical 90%), then measure coverage of
    |y−ŷ| ≤ q̂ on the held-out half — the distribution-free uncertainty
    guarantee a prediction service audits (coverage should be ≈ 90%
    under exchangeability; drift shows up as under-coverage). Exact
    integers throughout.

    Scale shape: two scans split by the broadcast midpoint, a 5-row
    predictor broadcast-joined back, one census window over the
    residual-value domain, one final 2-counter aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    e = ev.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (2 * F.unix_micros("ts") < F.col("mm")).alias("cal"),
    )
    mu = (
        e.filter("cal")
        .groupBy("event_type")
        .agg(F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias("pred"))
    )
    joined = e.join(F.broadcast(mu), "event_type").withColumn(
        "r", F.abs(F.col("cents") - F.col("pred"))
    )
    # r10: fully lazy — the old 3-collect form re-ran the events scan per
    # action (guide §5). The residual census is value-domain-bounded and
    # checkpointed once; n_cal and q̂ stay 1-row frames attached via
    # broadcast crossJoins, so the query is one plan with zero mid-query
    # collects.
    rc = (
        joined.filter("cal")
        .groupBy("r")
        .agg(F.count("*").cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    ncf = rc.agg(F.sum("t").cast("long").alias("n_calibration"))
    wc = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    qf = (
        rc.withColumn("cum", F.sum("t").over(wc).cast("long"))
        .crossJoin(F.broadcast(ncf))
        .filter(F.col("cum") * 10 >= 9 * (F.col("n_calibration") + 1))
        .agg(F.min("r").cast("long").alias("qhat_cents"))
    )
    evh = joined.filter(~F.col("cal")).crossJoin(F.broadcast(qf)).select(
        (F.col("r") <= F.col("qhat_cents")).alias("covered")
    )
    agg = evh.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.col("covered").cast("long")).cast("long").alias("n_covered"),
    )
    return (
        ncf.crossJoin(qf)
        .crossJoin(agg)
        .select(
            "n_calibration",
            "qhat_cents",
            "n_eval",
            "n_covered",
            F.expr("CAST((1000000 * n_covered) div n_eval AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
    )


def _cv_fold_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    hf = h15_sql("CAST(vec_id AS VARCHAR)", salt="cv")
    return f"""
WITH f AS (SELECT {hf} % 5 AS fold, label FROM embeddings),
c AS (SELECT fold, label, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
ft AS (SELECT fold, CAST(sum(n) AS BIGINT) AS nf FROM c GROUP BY 1),
lt AS (SELECT label, CAST(sum(n) AS BIGINT) AS nl FROM c GROUP BY 1),
n AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
dev AS (SELECT c.fold, c.label,
               abs((1000000 * c.n) // ft.nf - (1000000 * lt.nl) // (SELECT nt FROM n))
                 AS d
        FROM c JOIN ft USING (fold) JOIN lt USING (label))
SELECT fold, CAST(max(ft.nf) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_labels_seen,
       CAST(max(d) AS BIGINT) AS max_label_dev_ppm
FROM dev JOIN ft USING (fold) GROUP BY fold
"""


@query("cv_fold_balance_audit", _cv_fold_oracle())
def q_cv_fold_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold hygiene audit: assign 5 cross-validation folds by portable
    hash (reproducible across engines and runs — never `rand()`, the
    split.py discipline) and report each fold's worst per-label share
    deviation from the global label distribution in exact ppm — the check
    that catches both a broken hash (fold skew) and label imbalance that
    warrants stratified folds.

    Scale shape: one scan → (fold, label) census (≤ 50 cells), then
    cell-level arithmetic on broadcast-sized totals."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    emb = load_table(spark, sf_dir, "embeddings")
    f = emb.select(
        (h15(F.col("vec_id").cast("string"), salt="cv") % 5).alias("fold"),
        "label",
    )
    c = f.groupBy("fold", "label").agg(F.count("*").cast("long").alias("n"))
    ft = c.groupBy("fold").agg(F.sum("n").cast("long").alias("nf"))
    lt = c.groupBy("label").agg(F.sum("n").cast("long").alias("nl"))
    nt = c.agg(F.sum("n").cast("long").alias("nt"))
    dev = (
        c.join(F.broadcast(ft), "fold")
        .join(F.broadcast(lt), "label")
        .crossJoin(F.broadcast(nt))
        .select(
            "fold",
            "label",
            F.abs(
                F.expr("(1000000 * n) div nf") - F.expr("(1000000 * nl) div nt")
            ).alias("d"),
        )
    )
    return (
        dev.join(F.broadcast(ft), "fold")
        .groupBy("fold")
        .agg(
            F.max("nf").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_labels_seen"),
            F.max("d").cast("long").alias("max_label_dev_ppm"),
        )
    )


@query(
    "preference_confound_audit",
    """
WITH it AS (SELECT l_orderkey AS ord,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                   CAST(round(l_quantity) AS BIGINT) AS q,
                   l_linenumber AS ln
            FROM lineitem),
a AS (SELECT ord, list_sort(list(struct_pack(p := p, q := q, ln := ln))) AS xs
      FROM it GROUP BY 1),
pr AS (SELECT unnest(flatten(list_transform(xs, (x, i) ->
               list_transform(xs[i+1:], y -> struct_pack(a := x, b := y))))) AS pp
       FROM a),
d AS (SELECT pp.a.p AS pa, pp.b.p AS pb, pp.a.q AS qa, pp.b.q AS qb FROM pr)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN pa != pb AND qa != qb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_decisive,
       CAST(sum(CASE WHEN pa != pb AND qa != qb
                      AND ((pa < pb) = (qa < qb)) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concordant,
       CAST((1000000 * sum(CASE WHEN pa != pb AND qa != qb
                      AND ((pa < pb) = (qa < qb)) THEN 1 ELSE 0 END))
            // nullif(sum(CASE WHEN pa != pb AND qa != qb THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS concord_ppm
FROM d
""",
)
def q_preference_confound_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confound audit for preference data — the length-bias check of RLHF
    duels, run on the supplier-duel source: within each order (the duel
    group), how often does the higher-priced item also carry the higher
    quantity (within-group Kendall concordance)? concord_ppm ≫ 500000
    means the 'preference' signal is entangled with a covariate and the
    BT strengths partly rank the confound. Pairs expand IN-TASK from the
    per-order sorted array (the market-basket C(n,2) codegen trick) —
    bounded by order width, never corpus².

    Scale shape: one order-keyed collect (bounded group width), codegen
    pair explosion, one 4-counter aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    it = li.select(
        F.col("l_orderkey").alias("ord"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_quantity")).cast("long").alias("q"),
        F.col("l_linenumber").alias("ln"),
    )
    a = it.groupBy("ord").agg(
        F.sort_array(F.collect_list(F.struct("p", "q", "ln"))).alias("xs")
    )
    pairs = a.select(
        F.explode(
            F.expr(
                "flatten(transform(xs, (x, i) ->"
                " transform(slice(xs, i + 2, size(xs)),"
                " y -> struct(x AS a, y AS b))))"
            )
        ).alias("pp")
    ).select(
        F.col("pp.a.p").alias("pa"),
        F.col("pp.b.p").alias("pb"),
        F.col("pp.a.q").alias("qa"),
        F.col("pp.b.q").alias("qb"),
    )
    decisive = (F.col("pa") != F.col("pb")) & (F.col("qa") != F.col("qb"))
    concord = decisive & ((F.col("pa") < F.col("pb")) == (F.col("qa") < F.col("qb")))
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(decisive.cast("long")).cast("long").alias("n_decisive"),
        F.sum(concord.cast("long")).cast("long").alias("n_concordant"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN pa != pb AND qa != qb"
            " AND ((pa < pb) = (qa < qb)) THEN 1 ELSE 0 END))"
            " div nullif(sum(CASE WHEN pa != pb AND qa != qb THEN 1 ELSE 0 END), 0)"
            " AS BIGINT)"
        ).alias("concord_ppm"),
    )


@query(
    "crossmodal_integrity_audit",
    """
WITH d AS (SELECT doc_id FROM documents),
e AS (SELECT vec_id FROM embeddings),
j AS (SELECT count(*) AS matched FROM d JOIN e ON doc_id = vec_id)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_docs,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_vecs,
       CAST((SELECT matched FROM j) AS BIGINT) AS n_matched,
       CAST((SELECT count(*) FROM d) - (SELECT matched FROM j) AS BIGINT)
         AS n_docs_missing_vec,
       CAST((SELECT count(*) FROM e) - (SELECT matched FROM j) AS BIGINT)
         AS n_vecs_orphaned
FROM (SELECT 1)
""",
)
def q_crossmodal_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-MODAL referential integrity — the first check of any paired
    text/embedding (or image/caption) corpus: texts without vectors can't
    be retrieved, vectors without texts are unservable. One row of exact
    counts (the TPC-H FK audit generalized across modalities; ids here
    align 1:1 by generator design, so nonzero gap columns mean pipeline
    breakage, which is exactly what a gate wants).

    Scale shape: two narrow id scans and one id-keyed join that reduces
    to a count — with both sides bucketed by id in a real deployment this
    is exchange-free."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    n_docs = docs.count()
    n_vecs = emb.count()
    matched = docs.join(emb, docs.doc_id == emb.vec_id).count()
    return spark.createDataFrame(
        [(n_docs, n_vecs, matched, n_docs - matched, n_vecs - matched)],
        "n_docs long, n_vecs long, n_matched long, n_docs_missing_vec long,"
        " n_vecs_orphaned long",
    )


@query(
    "crossmodal_spearman_length_norm",
    """
WITH pair AS (SELECT d.n_chars AS xv,
                     CAST(list_sum(list_transform(e.embedding::DOUBLE[],
                       x -> CAST(round(x * 1000000) AS BIGINT)
                            * CAST(round(x * 1000000) AS BIGINT))) AS BIGINT)
                       // 10000000 AS yv
              FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
xc AS (SELECT xv, CAST(count(*) AS BIGINT) AS t FROM pair GROUP BY 1),
xr AS (SELECT xv, CAST(2 * coalesce(sum(t) OVER (ORDER BY xv ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS BIGINT) AS rx2
       FROM xc),
yc AS (SELECT yv, CAST(count(*) AS BIGINT) AS t FROM pair GROUP BY 1),
yr AS (SELECT yv, CAST(2 * coalesce(sum(t) OVER (ORDER BY yv ROWS BETWEEN
              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS BIGINT) AS ry2
       FROM yc),
r AS (SELECT xr.rx2 AS x, yr.ry2 AS y
      FROM pair JOIN xr USING (xv) JOIN yr USING (yv)),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM r),
w AS (SELECT n, CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
             CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx,
             CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
      FROM s)
SELECT n,
       CAST(floor(1000000.0 * CAST(num AS DOUBLE)
            / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))) AS BIGINT)
         AS spearman_x1e6
FROM w WHERE dx > 0 AND dy > 0
""",
)
def q_crossmodal_spearman_length_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length and embedding
    norm — the cross-modal sanity signal (many encoders leak length into
    the norm; a strong ρ warns that norm-based filtering is really length
    filtering). Exact: tie-averaged ranks via the doubled-rank census
    identity (2·avg_rank = 2·cum + t + 1, the Mann-Whitney machinery) on
    BOTH variables — the norm² is floor-quantized to a ~64k-value domain
    FIRST so its rank census (and window) is domain-bounded like the
    length's, the correlated variable being the quantized norm by
    definition — then Pearson on the integer doubled ranks with the
    HUGEINT/DECIMAL(38) closing products; the single float op is the
    final ratio.

    Scale shape: one id-keyed join pairs the modalities; each rank table
    is a value-domain census window; the sufficient statistics close in
    one 6-integer reduce."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    emb = load_table(spark, sf_dir, "embeddings")
    yv = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000000).cast("long")
            * F.round(x.cast("double") * 1000000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pair = docs.join(
        emb.select(
            F.col("vec_id").alias("doc_id"),
            # exact floor-div: subtract the remainder first so the double
            # quotient is an exact integer (numerator < 2^53)
            ((yv - yv % F.lit(10000000)) / F.lit(10000000))
            .cast("long")
            .alias("yv"),
        ),
        "doc_id",
    ).select(F.col("n_chars").alias("xv"), "yv")
    pair = pair.localCheckpoint(eager=True)  # feeds both censuses + join-back

    def ranks2(col):
        c = pair.groupBy(col).agg(F.count("*").cast("long").alias("t"))
        wb = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return c.select(
            col,
            (
                2 * F.coalesce(F.sum("t").over(wb), F.lit(0))
                + F.col("t")
                + 1
            )
            .cast("long")
            .alias(f"r_{col}"),
        )

    r = (
        pair.join(F.broadcast(ranks2("xv")), "xv")
        .join(F.broadcast(ranks2("yv")), "yv")
        .select(F.col("r_xv").alias("x"), F.col("r_yv").alias("y"))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(d38(F.col("x")) * d38(F.col("y"))).alias("sxy"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("y")) * d38(F.col("y"))).alias("syy"),
    )
    nD = d38(F.col("n"))
    num = nD * F.col("sxy") - d38(F.col("sx")) * d38(F.col("sy"))
    dx = nD * F.col("sxx") - d38(F.col("sx")) * d38(F.col("sx"))
    dy = nD * F.col("syy") - d38(F.col("sy")) * d38(F.col("sy"))
    return (
        s.filter((dx > 0) & (dy > 0))
        .select(
            "n",
            F.floor(
                F.lit(1000000.0)
                * num.cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double"))
            )
            .cast("long")
            .alias("spearman_x1e6"),
        )
    )


@query(
    "markov_next_event_accuracy",
    """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
            FROM events),
e AS (SELECT user_id, event_type, ts, event_id,
             2 * epoch_us(ts) < (SELECT mm FROM mm) AS pre FROM events),
p AS (SELECT user_id, pre, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id, pre
                                    ORDER BY ts, event_id) AS nxt
      FROM e),
fit AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE pre AND nxt IS NOT NULL GROUP BY 1, 2),
pol AS (SELECT cur, nxt AS pred FROM (
          SELECT *, row_number() OVER (PARTITION BY cur
                 ORDER BY n DESC, nxt) AS r FROM fit) WHERE r = 1),
ev AS (SELECT p.cur, p.nxt, pol.pred
       FROM p JOIN pol USING (cur) WHERE NOT p.pre AND p.nxt IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST((1000000 * sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END)) // count(*)
            AS BIGINT) AS top1_acc_ppm
FROM ev
""",
)
def q_markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction eval for the first-order Markov model (the
    event_markov_transitions matrix turned into a gated metric): fit
    per-state argmax successors on the first temporal half, score top-1
    accuracy on second-half transitions — fit and eval pairs never span
    the cutoff (the lead window partitions on (user, half)), completing
    the temporal-hygiene eval family (churn frame, bandit replay,
    conformal coverage). Exact integers; argmax fully tie-broken.

    Scale shape: per-(user, half) lead windows (bounded by user history),
    a states²-sized fit table reduced to a states-sized broadcast policy,
    one 2-counter eval aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    e = ev.crossJoin(F.broadcast(mm)).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (2 * F.unix_micros("ts") < F.col("mm")).alias("pre"),
    )
    wl = Window.partitionBy("user_id", "pre").orderBy("ts", "event_id")
    p = e.select(
        "user_id",
        "pre",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(wl).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    fit = (
        p.filter("pre").groupBy("cur", "nxt").agg(F.count("*").cast("long").alias("n"))
    )
    wr = Window.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    pol = (
        fit.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    evh = p.filter(~F.col("pre")).join(F.broadcast(pol), "cur")
    return evh.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum((F.col("nxt") == F.col("pred")).cast("long"))
        .cast("long")
        .alias("n_correct"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN nxt = pred THEN 1 ELSE 0 END))"
            " div count(*) AS BIGINT)"
        ).alias("top1_acc_ppm"),
    )


def _nb_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    h = h15_sql("CAST(doc_id AS VARCHAR)", salt="nb")
    qln = lambda x: f"CAST(floor(1000000 * ln({x})) AS BIGINT)"  # noqa: E731
    return f"""
WITH d AS (SELECT doc_id, source, text, {h} % 10 < 8 AS is_fit FROM documents),
ft AS (SELECT c, t FROM (SELECT source AS c, unnest(string_split(text, ' ')) AS t
                         FROM d WHERE is_fit) WHERE t <> ''),
wcnt AS (SELECT c, t, CAST(count(*) AS BIGINT) AS cnt FROM ft GROUP BY 1, 2),
vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM wcnt),
cls AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS tot FROM wcnt GROUP BY 1),
nd_c AS (SELECT source AS c, CAST(count(*) AS BIGINT) AS ndocs
         FROM d WHERE is_fit GROUP BY 1),
cst AS (SELECT cls.c,
               {qln("cls.tot + (SELECT v FROM vocab)")} AS lden,
               {qln("nd_c.ndocs + 1")} AS lpri
        FROM cls JOIN nd_c ON nd_c.c = cls.c),
et AS (SELECT doc_id, true_c, t FROM (
         SELECT doc_id, source AS true_c, unnest(string_split(text, ' ')) AS t
         FROM d WHERE NOT is_fit) WHERE t <> ''),
tc AS (SELECT doc_id, true_c, t, CAST(count(*) AS BIGINT) AS n
       FROM et GROUP BY 1, 2, 3),
nd AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS ndoc FROM tc GROUP BY 1),
s1 AS (SELECT tc.doc_id, w.c,
              CAST(sum(tc.n * {qln("w.cnt + 1")}) AS BIGINT) AS s1
       FROM tc JOIN wcnt w ON w.t = tc.t GROUP BY 1, 2),
spine AS (SELECT nd.doc_id, nd.ndoc, cst.c, cst.lden, cst.lpri
          FROM nd CROSS JOIN cst),
sc AS (SELECT s.doc_id, s.c,
              coalesce(s1.s1, 0) - s.ndoc * s.lden + s.lpri AS score
       FROM spine s LEFT JOIN s1 ON s1.doc_id = s.doc_id AND s1.c = s.c),
pred AS (SELECT doc_id, c AS pred_c FROM (
           SELECT doc_id, c,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, c) AS rn
           FROM sc) WHERE rn = 1)
SELECT t.true_c AS true_source, p.pred_c AS pred_source,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (SELECT DISTINCT doc_id, true_c FROM tc) t
JOIN pred p USING (doc_id) GROUP BY 1, 2
"""


@query("naive_bayes_source_eval", _nb_oracle())
def q_naive_bayes_source_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained and evaluated INSIDE the engine: fit
    add-one-smoothed per-source token likelihoods on the 80% hash split
    (portable h15, so both engines draw the identical split), score the
    held-out 20% with exact integer log-likelihoods — every ln is taken of
    an INTEGER count and floor-quantized to int64 ×1e6 BEFORE any
    sum/product (the doc_unigram_entropy discipline), so
    score(d,c) = Σ_w n_w·qln(cnt_wc+1) − N_d·qln(tot_c+V) + qln(ndocs_c+1)
    is bit-identical cross-engine — and emit the eval confusion matrix.
    The learned-generative complement to the hashed discriminative scorer
    (doc_quality_classifier) and the n-gram heuristic (doc_lang_id).

    Scale shape: training is one (class, token)-keyed partial→final count
    (vocab×C keys, not corpus rows); scoring joins eval tokens to the
    weight table on the token key; the per-doc argmax window partitions by
    doc_id over |C| rows. The doc×class spine is linear in eval docs with
    a small-C constant."""
    from pyspark.sql import Window

    from videos_to_tfrecords_spark.functions.hashing import h15

    qln = lambda c: F.floor(F.lit(1000000.0) * F.log(c)).cast("long")  # noqa: E731
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d = docs.select(
        "doc_id",
        "source",
        "text",
        (h15(F.col("doc_id").cast("string"), salt="nb") % 10 < 8).alias("is_fit"),
    )
    ft = (
        d.filter("is_fit")
        .select(F.col("source").alias("c"), F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    wcnt = (
        ft.groupBy("c", "t")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # feeds vocab, class totals, and scoring
    )
    vocab = wcnt.agg(F.count_distinct("t").cast("long").alias("v"))
    cls = wcnt.groupBy("c").agg(F.sum("cnt").cast("long").alias("tot"))
    nd_c = (
        d.filter("is_fit").groupBy(F.col("source").alias("c"))
        .agg(F.count("*").cast("long").alias("ndocs"))
    )
    cst = (
        cls.join(nd_c, "c")
        .crossJoin(F.broadcast(vocab))
        .select(
            "c",
            qln(F.col("tot") + F.col("v")).alias("lden"),
            qln(F.col("ndocs") + 1).alias("lpri"),
        )
    )
    et = (
        d.filter(~F.col("is_fit"))
        .select(
            "doc_id",
            F.col("source").alias("true_c"),
            F.explode(F.split("text", " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    tc = et.groupBy("doc_id", "true_c", "t").agg(
        F.count("*").cast("long").alias("n")
    ).localCheckpoint(eager=True)  # feeds nd, s1, and the truth table
    nd = tc.groupBy("doc_id").agg(F.sum("n").cast("long").alias("ndoc"))
    s1 = (
        tc.join(wcnt, wcnt.t == tc.t)
        .groupBy("doc_id", "c")
        .agg(F.sum(F.col("n") * qln(F.col("cnt") + 1)).cast("long").alias("s1"))
    )
    spine = nd.crossJoin(F.broadcast(cst))
    sc = spine.join(s1, ["doc_id", "c"], "left").select(
        "doc_id",
        "c",
        (
            F.coalesce("s1", F.lit(0)) - F.col("ndoc") * F.col("lden") + F.col("lpri")
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("c"))
    pred = (
        sc.select("doc_id", "c", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("c").alias("pred_c"))
    )
    truth = tc.select("doc_id", "true_c").distinct()
    return (
        truth.join(pred, "doc_id")
        .groupBy(
            F.col("true_c").alias("true_source"), F.col("pred_c").alias("pred_source")
        )
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def _knn_shapley_oracle() -> str:
    iv = (
        "list_transform(embedding::DOUBLE[],"
        " x -> CAST(round(x * 1000000) AS BIGINT))"
    )
    dot = (
        "CAST(list_sum(list_transform(list_zip(a.v, b.v),"
        " p -> p[1] * p[2])) AS BIGINT)"
    )
    return f"""
WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
kq AS (SELECT GREATEST(2, (SELECT n FROM n0) // 100) AS m),
e AS (SELECT vec_id, CAST(label AS BIGINT) AS label, {iv} AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM kq) = 0),
t AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM kq) != 0),
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
s AS (SELECT a.vec_id AS qid,
             CASE WHEN b.label = a.label THEN 1 ELSE 0 END AS y,
             b.vec_id AS cid, b.label AS clabel, {dot} AS dot
      FROM q a, t b),
r AS (SELECT qid, cid, clabel, y,
             row_number() OVER w AS rnk,
             lead(y) OVER w AS ynext
      FROM s WINDOW w AS (PARTITION BY qid ORDER BY dot DESC, cid)),
terms AS (SELECT qid, cid, clabel, rnk,
                 CASE WHEN rnk = (SELECT n FROM ntr)
                      THEN y * (1000000000 // (SELECT n FROM ntr))
                      ELSE (y - ynext) * (1000000000 // GREATEST(5, rnk)) END AS t
          FROM r),
sv AS (SELECT cid, clabel,
              sum(t) OVER (PARTITION BY qid ORDER BY rnk
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s
       FROM terms)
SELECT cid AS vec_id, clabel AS label, CAST(sum(s) AS BIGINT) AS shapley_x1e9
FROM sv GROUP BY 1, 2
"""


@query("knn_shapley_values", _knn_shapley_oracle())
def q_knn_shapley_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data valuation over the embedding table
    (operators/similarity.knn_shapley_values): per-training-point Shapley
    value for the K=5 NN classifier via the Jia et al. closed-form
    rank-recursion, summed over a ~100-point corpus-derived test probe.
    The per-point complement to source_loo_value's per-SOURCE leave-one-out
    — this is the query that ranks individual examples for pruning or
    curation by their marginal contribution to held-out accuracy.

    Every term is integer-floored BEFORE the suffix sum (scale // max(K,
    rank)), so Spark's window scan and the oracle's produce bit-identical
    int64 totals. Linear in the corpus: |probe|·n scored pairs, windows
    partitioned by the bounded probe id."""
    from videos_to_tfrecords_spark.operators.similarity import knn_shapley_values

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_shapley_values(emb, k=5, query_target=100)


def _pass_at_k_oracle() -> str:
    return """
WITH att AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
per AS (
  SELECT n, c,
         n * (n - 1) * (n - 2) AS d,
         CASE WHEN n - c >= 3
              THEN (n - c) * (n - c - 1) * (n - c - 2) ELSE 0 END AS miss
  FROM att WHERE n >= 3
)
SELECT n AS n_attempts,
       CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(sum((d - miss) * 1000000000 // d) // count(*) AS BIGINT)
         AS mean_pass_at_3_x1e9,
       CAST(sum(c * 1000000000 // n) // count(*) AS BIGINT)
         AS mean_pass_at_1_x1e9
FROM per GROUP BY 1
"""


@query("eval_pass_at_k", _pass_at_k_oracle())
def q_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k eval metric via the unbiased combinatorial estimator from the
    HumanEval/Codex methodology (public: Chen et al. 2021, eq. 1):
    pass@k = 1 − C(n−c, k) / C(n, k) per task with n attempts and c
    successes — computed here per order (task = order, attempts =
    lineitems, success = returnflag 'R') and averaged within
    n-attempt buckets, the exact readout an eval harness reports when
    sampling multiple generations per prompt.

    Exactness: per-task n is bounded by the order's line count (≤13), so
    C(n,3) products stay tiny int64; the estimator is computed as
    ((D − miss)·1e9) // D with D = n(n−1)(n−2) — one integer floor per
    task, then a floor-of-mean close (sum // count), identical term order
    both engines. One shuffle (groupBy orderkey) plus a tiny bucket agg;
    per-task state is the order's line count, never corpus-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    att = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    per = (
        att.filter(F.col("n") >= 3)
        .withColumn(
            "d", F.col("n") * (F.col("n") - 1) * (F.col("n") - 2)
        )
        .withColumn(
            "miss",
            F.when(
                F.col("n") - F.col("c") >= 3,
                (F.col("n") - F.col("c"))
                * (F.col("n") - F.col("c") - 1)
                * (F.col("n") - F.col("c") - 2),
            ).otherwise(F.lit(0)),
        )
    )
    return per.groupBy(F.col("n").alias("n_attempts")).agg(
        F.count("*").cast("long").alias("n_tasks"),
        F.expr(
            "CAST(sum((d - miss) * 1000000000 div d) div count(*) AS BIGINT)"
        ).alias("mean_pass_at_3_x1e9"),
        F.expr(
            "CAST(sum(c * 1000000000 div n) div count(*) AS BIGINT)"
        ).alias("mean_pass_at_1_x1e9"),
    )


def _wilson_oracle() -> str:
    return """
WITH agg AS (
  SELECT l_suppkey AS suppkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS s
  FROM lineitem GROUP BY 1
),
w AS (
  SELECT suppkey, n, s,
         CAST(floor(sqrt(CAST(n * s * (n - s) + n * n AS DOUBLE)))
              AS BIGINT) AS t
  FROM agg
)
SELECT suppkey, n, s,
       (1000000 * ((s + 2) * n - 2 * t)) // (n * (n + 4)) AS wilson_lb_x1e6
FROM w
ORDER BY wilson_lb_x1e6 DESC, suppkey
LIMIT 20
"""


@query("wilson_lower_bound_ranking", _wilson_oracle())
def q_wilson_lower_bound_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank suppliers by return rate using the Wilson score lower bound at
    z=2 (the small-sample-shrinkage ranking a curation pipeline uses to
    order sources by spam/quality rate without letting a 2-of-2 source
    beat a 980-of-1000 one — the classic sort-by-rating correction).

    z=2 collapses Wilson to integers: LB = ((s+2)·n − 2·√(n·s·(n−s)+n²))
    / (n(n+4)). The sqrt argument is an int64 (n per supplier is bounded
    by its line count, so n³ ≪ 2^52 and floor(IEEE-correctly-rounded
    sqrt) is the same integer on both engines — the proven isqrt
    pattern); every other step is int64 multiply/floor-div, and the
    numerator is provably non-negative so div == //. One shuffle
    (groupBy suppkey) then a global top-20 — TakeOrderedAndProject, no
    full sort at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )
    w = agg.withColumn(
        "t",
        F.floor(
            F.sqrt((F.col("n") * F.col("s") * (F.col("n") - F.col("s"))
                    + F.col("n") * F.col("n")).cast("double"))
        ).cast("long"),
    )
    return (
        w.select(
            "suppkey",
            "n",
            "s",
            F.expr(
                "(1000000 * ((s + 2) * n - 2 * t)) div (n * (n + 4))"
            ).alias("wilson_lb_x1e6"),
        )
        .orderBy(F.desc("wilson_lb_x1e6"), F.asc("suppkey"))
        .limit(20)
    )


def _dsir_ess_oracle() -> str:
    return f"""
WITH base AS ({_dsir_oracle()}),
mx AS (SELECT max(logw_q) AS m FROM base),
w AS (SELECT CAST(floor(1000000 * exp((logw_q - (SELECT m FROM mx))
                                      / 1000000000.0)) AS BIGINT) AS wq
      FROM base),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(wq) AS HUGEINT) AS sw,
             CAST(sum(CAST(wq AS HUGEINT) * wq) AS HUGEINT) AS sw2
      FROM w)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST((1000000 * sw * sw) // sw2 AS BIGINT) AS ess_x1e6,
       CAST((1000000 * sw * sw) // (n * sw2) AS BIGINT) AS ess_frac_x1e6
FROM s
"""


@query("dsir_effective_sample_size", _dsir_ess_oracle())
def q_dsir_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the DSIR importance weights (Kish ESS =
    (Σw)²/Σw² — public survey-statistics formula): the one-number health
    check on an importance-resampling plan — ESS ≪ n means a handful of
    documents would dominate the resampled corpus and the target-domain
    tilt is too aggressive.

    Weights come from the SAME quantized log-weight integers as
    dsir_importance_weights; each doc's weight re-floors to an int64 via
    one max-shifted exp per row (identical double argument on both
    engines — the per-row quantized-ln precedent in reverse, max shift
    keeps every weight in (0, 1e6]), so Σw and Σw² are exact integer
    sums closed in DECIMAL(38,0)/HUGEINT. The max and the sums are
    metadata-sized aggregates; the corpus cost is the DSIR scoring pass
    itself."""
    from videos_to_tfrecords_spark.operators.text import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_log_weights(
        docs, target=F.col("lang") == "en", n_buckets=_DSIR_B
    ).localCheckpoint(eager=True)
    mx = scored.agg(F.max("logw_q").alias("m"))
    w = scored.crossJoin(F.broadcast(mx)).select(
        F.floor(
            1000000
            * F.exp((F.col("logw_q") - F.col("m")) / F.lit(1000000000.0))
        )
        .cast("long")
        .alias("wq")
    )
    s = w.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("wq").cast("decimal(38,0)").alias("sw"),
        F.sum(F.col("wq").cast("decimal(38,0)") * F.col("wq")).alias("sw2"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_docs"),
        F.expr("CAST((1000000 * sw * sw) div sw2 AS BIGINT)").alias(
            "ess_x1e6"
        ),
        F.expr("CAST((1000000 * sw * sw) div (n * sw2) AS BIGINT)").alias(
            "ess_frac_x1e6"
        ),
    )


def _best_of_k_oracle() -> str:
    return """
WITH r AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY round(l_extendedprice * 100), l_linenumber)
           AS i,
         CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n
  FROM lineitem
),
per AS (
  SELECT l_orderkey, n,
         CAST(sum(v * ((i - 1) * (i - 2) // 2)) AS BIGINT) AS wsum,
         CAST(max(v) AS BIGINT) AS vmax
  FROM r WHERE n >= 3 GROUP BY 1, 2
),
e AS (
  SELECT n, vmax,
         wsum // (n * (n - 1) * (n - 2) // 6) AS e_best3
  FROM per
)
SELECT n AS n_attempts,
       CAST(count(*) AS BIGINT) AS n_tasks,
       CAST(sum(e_best3) // count(*) AS BIGINT) AS mean_best_of_3_cents,
       CAST(sum(vmax) // count(*) AS BIGINT) AS mean_best_of_n_cents
FROM e GROUP BY 1
"""


@query("eval_best_of_k_value", _best_of_k_oracle())
def q_eval_best_of_k_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-k expected-maximum eval (the inference-time-scaling readout
    next to pass@k): E[max of a uniform random k-subset] has the exact
    order-statistic form E = Σᵢ v₍ᵢ₎·C(i−1, k−1) / C(n, k) — computed per
    task (order) at k=3 from the within-task value ranking and compared
    with best-of-n (the ceiling), averaged per n-attempt bucket. This is
    the curve a sampling-strategy decision reads: how much of the
    best-of-n ceiling does best-of-3 already capture.

    Exactness: per-task n ≤ line count (≤13) so every binomial is a tiny
    exact int64; one integer floor per task (wsum // C(n,3)), then the
    floor-of-mean close. The rank window partitions by order (bounded
    rows); ties break on line number identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(
        F.round(F.col("l_extendedprice") * 100), F.col("l_linenumber")
    )
    r = li.select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.row_number().over(w).cast("long").alias("i"),
        F.count("*")
        .over(Window.partitionBy("l_orderkey"))
        .cast("long")
        .alias("n"),
    )
    per = (
        r.filter(F.col("n") >= 3)
        .groupBy("l_orderkey", "n")
        .agg(
            F.sum(
                F.col("v")
                * F.expr("(i - 1) * (i - 2) div 2")
            )
            .cast("long")
            .alias("wsum"),
            F.max("v").cast("long").alias("vmax"),
        )
    )
    e = per.select(
        "n",
        "vmax",
        F.expr("wsum div (n * (n - 1) * (n - 2) div 6)").alias("e_best3"),
    )
    return e.groupBy(F.col("n").alias("n_attempts")).agg(
        F.count("*").cast("long").alias("n_tasks"),
        F.expr("CAST(sum(e_best3) div count(*) AS BIGINT)").alias(
            "mean_best_of_3_cents"
        ),
        F.expr("CAST(sum(vmax) div count(*) AS BIGINT)").alias(
            "mean_best_of_n_cents"
        ),
    )


def _group_advantage_oracle() -> str:
    fd = "(({num}) - ((({num}) % ({den})) + ({den})) % ({den})) // ({den})"
    num = "(v * n - sv) * 1000"
    den = "t"
    return f"""
WITH v0 AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice) AS BIGINT) AS v
  FROM lineitem
),
g AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS svv
  FROM v0 GROUP BY 1
),
z AS (
  SELECT v0.l_orderkey, v0.l_linenumber, v0.v, g.n,
         CAST(floor(sqrt(CAST(g.n * g.svv - g.sv * g.sv AS DOUBLE)))
           AS BIGINT) AS t,
         g.sv
  FROM v0 JOIN g USING (l_orderkey) WHERE g.n >= 2
),
adv AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN t = 0 THEN 0
              ELSE {fd.format(num=num, den=den)} END AS adv_x1e3
  FROM z
)
SELECT l_orderkey, l_linenumber, CAST(adv_x1e3 AS BIGINT) AS adv_x1e3
FROM adv ORDER BY adv_x1e3 DESC, l_orderkey, l_linenumber LIMIT 25
"""


@query("group_relative_advantage", _group_advantage_oracle())
def q_group_relative_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage (the GRPO-style normalization — public:
    advantage = (reward − group mean)/group std, computed WITHIN each
    prompt's sample group rather than against a critic): per line item
    the z-score of its value against its order's siblings, top-25
    surfaced. The exact op an RLHF-style data pipeline runs to turn raw
    per-sample rewards into training advantages without a value model.

    Exactness: z = (v·n − Σv)/√(n·Σv² − (Σv)²) — the numerator is exact
    int64; the radicand is the HUGEINT-free variance product (dollar
    quantization keeps n·Σv² ≪ 2^53 for bounded group sizes) so
    floor(IEEE sqrt) is the same integer both engines; the close is the
    subtract-remainder exact FLOOR division (numerator may be negative —
    div truncates, // floors, the centroids lesson). Zero-variance groups
    emit 0. One groupBy shuffle + one broadcast-shaped join back; top-25
    is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    v0 = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice")).cast("long").alias("v"),
    )
    g = v0.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("svv"),
    )
    z = (
        v0.join(g, "l_orderkey")
        .filter(F.col("n") >= 2)
        .withColumn(
            "t",
            F.floor(
                F.sqrt(
                    (
                        F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")
                    ).cast("double")
                )
            ).cast("long"),
        )
    )
    num = "(v * n - sv) * 1000"
    adv = z.withColumn(
        "adv_x1e3",
        F.when(F.col("t") == 0, F.lit(0)).otherwise(
            F.expr(f"(({num}) - ((({num}) % t) + t) % t) div t")
        ).cast("long"),
    )
    return (
        adv.select("l_orderkey", "l_linenumber", "adv_x1e3")
        .orderBy(F.desc("adv_x1e3"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )


def _pref_transitivity_oracle() -> str:
    return """
WITH bids AS MATERIALIZED (
  SELECT l_orderkey AS ord, l_suppkey AS supp,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS bid
  FROM lineitem GROUP BY 1, 2),
duels AS MATERIALIZED (
  SELECT a.supp AS i, b.supp AS j,
         CASE WHEN (a.bid > b.bid) OR (a.bid = b.bid AND a.supp > b.supp)
              THEN 1 ELSE 0 END AS i_wins
  FROM bids a JOIN bids b ON a.ord = b.ord AND a.supp < b.supp),
top AS (
  SELECT supp FROM (
    SELECT supp, count(*) AS cnt FROM (
      SELECT i AS supp FROM duels UNION ALL SELECT j AS supp FROM duels)
    GROUP BY 1)
  ORDER BY cnt DESC, supp LIMIT 256),
pair AS (
  SELECT i AS a, j AS b,
         CASE WHEN 2 * sum(i_wins) >= count(*) THEN 1 ELSE -1 END AS x
  FROM duels
  WHERE i IN (SELECT supp FROM top) AND j IN (SELECT supp FROM top)
  GROUP BY 1, 2),
tri AS (
  SELECT ab.x AS x, bc.x AS y, ac.x AS z
  FROM pair ab
  JOIN pair bc ON bc.a = ab.b
  JOIN pair ac ON ac.a = ab.a AND ac.b = bc.b),
agg AS (
  SELECT CAST((SELECT count(*) FROM pair) AS BIGINT) AS n_pairs,
         CAST(count(*) AS BIGINT) AS n_triads,
         CAST(sum(CASE WHEN (x = 1 AND y = 1 AND z = -1)
                         OR (x = -1 AND y = -1 AND z = 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_cyclic
  FROM tri)
SELECT n_pairs, n_triads, n_cyclic,
       CAST(CASE WHEN n_triads = 0 THEN 0
                 ELSE (1000000 * n_cyclic) // n_triads END AS BIGINT)
         AS cyclic_ppm
FROM agg
"""


@query("preference_transitivity_audit", _pref_transitivity_oracle())
def q_preference_transitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the pairwise-preference data feeding the
    Bradley-Terry fit (supplier_bt_strength shares the duel base): build
    the MAJORITY digraph over compared pairs (ties break toward the lower
    id — deterministic), then census the closed triads for directed
    3-cycles a→b→c→a. A high cyclic fraction means the "preferences" are
    noise or multi-dimensional and a scalar reward fit will be garbage —
    THE sanity gate on preference data before reward modeling
    (Condorcet-cycle rate, public social-choice diagnostic).

    The duel base is one order-keyed shuffle. The census is bounded to
    the sub-tournament of the 256 MOST-COMPARED suppliers (TakeOrdered +
    two broadcast semi-joins): the cyclic RATE is a statistical
    diagnostic, and the full co-occurrence graph's triad join measured
    167 s / exponent 0.93 at sf1 — the bounded sub-tournament caps triads
    at C(256,3) and makes the audit cost corpus-independent (the probe-set
    lesson, tournament edition). Integers end-to-end."""
    li = load_table(spark, sf_dir, "lineitem")
    bids = li.groupBy(
        F.col("l_orderkey").alias("ord"), F.col("l_suppkey").alias("supp")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("bid")
    )
    dl = (
        bids.groupBy("ord")
        .agg(F.sort_array(F.collect_list(F.struct("bid", "supp"))).alias("arr"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr)),"
                    " y -> struct(least(x.supp, y.supp) AS a,"
                    " greatest(x.supp, y.supp) AS b,"
                    " CASE WHEN least(x.supp, y.supp) = y.supp"
                    " THEN 1 ELSE 0 END AS a_wins))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b", "p.a_wins")
    )
    ends = dl.select(F.col("a").alias("supp")).unionAll(
        dl.select(F.col("b").alias("supp"))
    )
    top = (
        ends.groupBy("supp")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("supp"))
        .limit(256)
        .select("supp")
    )
    pair = (
        dl.join(F.broadcast(top.withColumnRenamed("supp", "a")), "a")
        .join(F.broadcast(top.withColumnRenamed("supp", "b")), "b")
        .groupBy("a", "b")
        .agg(
            F.when(2 * F.sum("a_wins") >= F.count("*"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("x")
        )
        .localCheckpoint(eager=True)
    )
    ab = pair.select(F.col("a"), F.col("b"), F.col("x"))
    bc = pair.select(
        F.col("a").alias("b"), F.col("b").alias("c"), F.col("x").alias("y")
    )
    ac = pair.select(
        F.col("a"), F.col("b").alias("c"), F.col("x").alias("z")
    )
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    agg = tri.agg(
        F.count("*").cast("long").alias("n_triads"),
        F.sum(
            F.when(
                ((F.col("x") == 1) & (F.col("y") == 1) & (F.col("z") == -1))
                | ((F.col("x") == -1) & (F.col("y") == -1) & (F.col("z") == 1)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_cyclic"),
    )
    n_pairs = pair.agg(F.count("*").cast("long").alias("n_pairs"))
    return (
        F.broadcast(n_pairs)
        .crossJoin(agg)
        .select(
            "n_pairs",
            "n_triads",
            "n_cyclic",
            F.expr(
                "CAST(CASE WHEN n_triads = 0 THEN 0"
                " ELSE (1000000 * n_cyclic) div n_triads END AS BIGINT)"
            ).alias("cyclic_ppm"),
        )
    )


@query(
    "value_drift_ks",
    """
WITH e AS (SELECT LEAST(255, CAST(floor(value / 2.5) AS BIGINT)) AS b,
                  ((epoch_ns(ts) // 1000) // 86400000000) % 2 AS side
           FROM events),
c AS (SELECT b, CAST(count(*) FILTER (WHERE side = 0) AS BIGINT) AS ca,
             CAST(count(*) FILTER (WHERE side = 1) AS BIGINT) AS cb
      FROM e GROUP BY b),
spine AS (SELECT unnest(range(0, 256)) AS b),
f AS (SELECT spine.b, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
      FROM spine LEFT JOIN c ON c.b = spine.b),
cum AS (SELECT b,
               sum(ca) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cca,
               sum(cb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS ccb
        FROM f),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM f),
gap AS (SELECT cum.b, CAST(abs(cum.cca * tot.nb - cum.ccb * tot.na) AS BIGINT)
               AS g, tot.na, tot.nb
        FROM cum, tot)
SELECT na AS n_a, nb AS n_b, b AS argmax_bucket, g AS ks_num,
       CAST((1000000 * g) // (na * nb) AS BIGINT) AS ks_x1e6
FROM gap ORDER BY g DESC, b LIMIT 1
""",
)
def q_value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic between even-
    and odd-day event values — completing the drift quartet (χ² sees
    per-bucket mass, EMD sees ordered distance, PSI sees log-ratio mass,
    KS sees the WORST single CDF gap and is the classic distribution-
    equality test). Same census shape as value_drift_emd at 256 buckets:
    D = max_b |CDF_A − CDF_B| cross-multiplied in integers
    (max|CCA·n_B − CCB·n_A|), argmax bucket reported, tie to the lowest
    bucket. The 256-row spine is metadata-sized; the only
    data-proportional stage is the bucket count."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    e = ev.select(
        F.least(F.lit(255), F.floor(F.col("value") / 2.5).cast("long")).alias("b"),
        F.expr("((unix_micros(ts)) div 86400000000) % 2").alias("side"),
    )
    c = e.groupBy("b").agg(
        F.count(F.when(F.col("side") == 0, 1)).cast("long").alias("ca"),
        F.count(F.when(F.col("side") == 1, 1)).cast("long").alias("cb"),
    )
    spine = spark.range(256).select(F.col("id").alias("b"))
    f = spine.join(c, "b", "left").select(
        "b",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = f.select(
        "b", F.sum("ca").over(w).alias("cca"), F.sum("cb").over(w).alias("ccb")
    )
    tot = f.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "b",
        F.abs(F.col("cca") * F.col("nb") - F.col("ccb") * F.col("na"))
        .cast("long")
        .alias("g"),
        "na",
        "nb",
    )
    return (
        gap.orderBy(F.desc("g"), F.asc("b"))
        .limit(1)
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("b").alias("argmax_bucket"),
            F.col("g").alias("ks_num"),
            F.expr("CAST((1000000 * g) div (na * nb) AS BIGINT)").alias(
                "ks_x1e6"
            ),
        )
    )


def _copurchase_hit_oracle() -> str:
    return """
WITH lo AS (
  SELECT l.l_orderkey AS ord, l.l_partkey AS part, o.o_orderdate AS d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
tr AS (SELECT DISTINCT ord, part FROM lo WHERE d < DATE '1997-01-01'),
te AS (SELECT DISTINCT ord, part FROM lo WHERE d >= DATE '1997-01-01'),
co AS (SELECT a.part AS p1, b.part AS p2, CAST(count(*) AS BIGINT) AS n
       FROM tr a JOIN tr b ON a.ord = b.ord AND a.part != b.part
       GROUP BY 1, 2),
rec AS (SELECT p1, p2 FROM (
          SELECT p1, p2, row_number() OVER (PARTITION BY p1
                   ORDER BY n DESC, p2) AS rnk FROM co)
        WHERE rnk <= 3),
tp AS (SELECT a.part AS p1, b.part AS p2
       FROM te a JOIN te b ON a.ord = b.ord AND a.part != b.part),
ev AS (SELECT CAST(count(*) AS BIGINT) AS n_test_pairs,
              CAST(sum(CASE WHEN rec.p2 IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits
       FROM tp LEFT JOIN rec ON rec.p1 = tp.p1 AND rec.p2 = tp.p2)
SELECT n_test_pairs, n_hits,
       CAST(CASE WHEN n_test_pairs = 0 THEN 0
                 ELSE (1000000 * n_hits) // n_test_pairs END AS BIGINT)
         AS hit_ppm
FROM ev
"""


@query("copurchase_recommender_eval", _copurchase_hit_oracle())
def q_copurchase_recommender_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal hit@3 eval of an item-item co-occurrence recommender (the
    classic "customers also bought" baseline): fit co-purchase counts on
    pre-1997 orders, recommend each part's top-3 co-occurring parts, then
    score on post-1997 orders — for every ordered part pair in a test
    basket, a hit iff the second part is in the first's top-3. The
    leakage-safe fit/eval temporal split is the point (the
    markov_next_event pattern at ITEM granularity — the recsys eval
    family's counterpart to pass@k).

    Pairs explode IN-TASK per order (baskets bounded by order width, the
    market_basket shape); recommendations are a per-part window over
    co-occurring parts; the eval is one (p1,p2)-keyed left join. Integers
    end-to-end, ties to the lower part id."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lo = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("l_orderkey").alias("ord"),
        F.col("l_partkey").alias("part"),
        F.col("o_orderdate").alias("d"),
    )

    def pairs(df: DataFrame) -> DataFrame:
        return (
            df.select("ord", "part")
            .distinct()
            .groupBy("ord")
            .agg(F.sort_array(F.collect_set("part")).alias("arr"))
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(arr, x ->"
                        " transform(filter(arr, y -> y != x),"
                        " y -> struct(x AS p1, y AS p2))))"
                    )
                ).alias("p")
            )
            .select("p.p1", "p.p2")
        )

    tr = pairs(lo.filter(F.col("d") < "1997-01-01"))
    te = pairs(lo.filter(F.col("d") >= "1997-01-01"))
    co = tr.groupBy("p1", "p2").agg(F.count("*").cast("long").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("p1").orderBy(F.desc("n"), F.asc("p2"))
    rec = (
        co.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p1", "p2", F.lit(1).alias("hit"))
    )
    ev = te.join(rec, ["p1", "p2"], "left").agg(
        F.count("*").cast("long").alias("n_test_pairs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
    )
    return ev.select(
        "n_test_pairs",
        "n_hits",
        F.expr(
            "CAST(CASE WHEN n_test_pairs = 0 THEN 0"
            " ELSE (1000000 * n_hits) div n_test_pairs END AS BIGINT)"
        ).alias("hit_ppm"),
    )


@query(
    "two_proportion_ztest",
    """
WITH e AS (SELECT ((epoch_ns(ts) // 1000) // 86400000000) % 2 AS side,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
g AS (SELECT CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
             CAST(sum(CASE WHEN side = 0 THEN y ELSE 0 END) AS HUGEINT) AS sa,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
             CAST(sum(CASE WHEN side = 1 THEN y ELSE 0 END) AS HUGEINT) AS sb
      FROM e),
m AS (SELECT na, sa, nb, sb,
             sa * nb - sb * na AS num,
             na + nb AS n, sa + sb AS s
      FROM g)
SELECT CAST(na AS BIGINT) AS n_a, CAST(sa AS BIGINT) AS s_a,
       CAST(nb AS BIGINT) AS n_b, CAST(sb AS BIGINT) AS s_b,
       CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
         AS BIGINT) AS sign,
       CAST(CASE WHEN s = 0 OR s = n THEN 0
                 ELSE (1000000 * num * num * n) // (na * nb * s * (n - s))
            END AS BIGINT) AS z2_x1e6
FROM m
""",
)
def q_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of purchase rate, even- vs odd-day events —
    the significance gate an experimentation pipeline runs on a binary
    conversion split (completes the testing family: McNemar for paired,
    Mann-Whitney for ordinal, chi-square for categorical, this for the
    plain conversion A/B). Reported as the SIGNED SQUARED statistic
    z² = (s_a·n_b − s_b·n_a)²·n / (n_a·n_b·s·(n−s)) ×1e6 — a single
    integer floor-div in DECIMAL(38,0)/HUGEINT (the pooled-variance
    products exceed int64 at corpus scale), zero when a pooled
    proportion is degenerate. One map-side aggregate; nothing shuffles
    but four partial sums."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.expr("((unix_micros(ts)) div 86400000000) % 2").alias("side"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = e.agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("na"),
        F.sum(F.when(F.col("side") == 0, F.col("y")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sa"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("nb"),
        F.sum(F.when(F.col("side") == 1, F.col("y")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sb"),
    )
    m = g.select(
        "na", "sa", "nb", "sb",
        F.expr("sa * nb - sb * na").alias("num"),
        F.expr("na + nb").alias("n"),
        F.expr("sa + sb").alias("s"),
    )
    return m.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("sa").cast("long").alias("s_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("sb").cast("long").alias("s_b"),
        F.expr(
            "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("sign"),
        F.expr(
            "CAST(CASE WHEN s = 0 OR s = n THEN 0"
            " ELSE (1000000 * num * num * n) div (na * nb * s * (n - s))"
            " END AS BIGINT)"
        ).alias("z2_x1e6"),
    )


@query(
    "value_drift_qq",
    """
WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS x,
                  ((epoch_ns(ts) // 1000) // 86400000000) % 2 AS side
           FROM events),
c AS (SELECT x, side, CAST(count(*) AS BIGINT) AS t FROM e GROUP BY 1, 2),
n AS (SELECT side, CAST(sum(t) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (SELECT x, side, t,
               CAST(coalesce(sum(t) OVER (PARTITION BY side ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cb
        FROM c),
dec AS (SELECT unnest(range(1, 10)) AS d),
q AS (SELECT dec.d, cum.side, CAST(min(cum.x) AS BIGINT) AS qv
      FROM dec, cum JOIN n ON n.side = cum.side
      WHERE cum.cb < (dec.d * n.n + 9) // 10
        AND cum.cb + cum.t >= (dec.d * n.n + 9) // 10
      GROUP BY 1, 2)
SELECT a.d AS decile, a.qv AS q_even_cents, b.qv AS q_odd_cents,
       CAST(b.qv - a.qv AS BIGINT) AS delta_cents
FROM q a JOIN q b ON b.d = a.d AND a.side = 0 AND b.side = 1
""",
)
def q_value_drift_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile drift table between even- and odd-day event
    values: the nine exact deciles of each side, paired — the
    WHERE-in-the-distribution detail the scalar drift statistics (χ²,
    EMD, PSI, KS) compress away; a tail-only shift shows as deltas in
    d8-d9 with a flat middle. Deciles are exact ⌈d·n/10⌉-th order
    statistics over the cent-quantized value census (bounded domain —
    the norm-census quantization lesson), one running-sum window per
    side, no corpus sort."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    e = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.expr("(unix_micros(ts) div 86400000000) % 2").alias("side"),
    )
    c = e.groupBy("x", "side").agg(F.count("*").cast("long").alias("t"))
    n = c.groupBy("side").agg(F.sum("t").cast("long").alias("n"))
    wc = Window.partitionBy("side").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = c.select(
        "x",
        "side",
        "t",
        F.coalesce(F.sum("t").over(wc), F.lit(0)).cast("long").alias("cb"),
    )
    dec = spark.range(1, 10).select(F.col("id").alias("d"))
    q = (
        dec.crossJoin(cum.join(n, "side"))
        .filter(
            (F.col("cb") < F.expr("(d * n + 9) div 10"))
            & (F.col("cb") + F.col("t") >= F.expr("(d * n + 9) div 10"))
        )
        .groupBy("d", "side")
        .agg(F.min("x").cast("long").alias("qv"))
    )
    a = q.filter(F.col("side") == 0).select(
        F.col("d").alias("decile"), F.col("qv").alias("q_even_cents")
    )
    b = q.filter(F.col("side") == 1).select(
        F.col("d").alias("decile"), F.col("qv").alias("q_odd_cents")
    )
    return a.join(b, "decile").select(
        "decile",
        "q_even_cents",
        "q_odd_cents",
        (F.col("q_odd_cents") - F.col("q_even_cents"))
        .cast("long")
        .alias("delta_cents"),
    )


def _aa_test_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    h = h15_sql("CAST(event_id AS VARCHAR)", salt="aa")
    return f"""
WITH e AS (SELECT {h} % 2 AS side,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
g AS (SELECT CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
             CAST(sum(CASE WHEN side = 0 THEN y ELSE 0 END) AS HUGEINT) AS sa,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
             CAST(sum(CASE WHEN side = 1 THEN y ELSE 0 END) AS HUGEINT) AS sb
      FROM e),
m AS (SELECT na, sa, nb, sb, sa * nb - sb * na AS num,
             na + nb AS n, sa + sb AS s
      FROM g)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(CASE WHEN s = 0 OR s = n THEN 0
                 ELSE (1000000 * num * num * n) // (na * nb * s * (n - s))
            END AS BIGINT) AS z2_x1e6,
       CASE WHEN s = 0 OR s = n THEN TRUE
            ELSE (1000000 * num * num * n) // (na * nb * s * (n - s))
                 < 3841459 END AS null_ok
FROM m
"""


@query("aa_test_null_check", _aa_test_oracle())
def q_aa_test_null_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A null check of the experimentation stack: the SAME two-proportion
    z² statistic as two_proportion_ztest, but on a pure HASH split of
    event ids — by construction there is no treatment, so z² should sit
    under the χ²(1) 95% critical value (3.841459, inlined ×1e6 as the
    precomputed-constant pattern). A failing A/A means the assignment
    hash or the metric pipeline is biased and every real experiment
    readout is suspect — the first gate an experimentation platform
    ships. Same HUGEINT/DECIMAL close; one map-side aggregate."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        (h15(F.col("event_id").cast("string"), salt="aa") % 2).alias("side"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = e.agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("na"),
        F.sum(F.when(F.col("side") == 0, F.col("y")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sa"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("nb"),
        F.sum(F.when(F.col("side") == 1, F.col("y")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("sb"),
    )
    m = g.select(
        "na", "nb",
        F.expr("sa * nb - sb * na").alias("num"),
        F.expr("na + nb").alias("n"),
        F.expr("sa + sb").alias("s"),
        "sa", "sb",
    )
    z2 = (
        "CASE WHEN s = 0 OR s = n THEN 0"
        " ELSE (1000000 * num * num * n) div (na * nb * s * (n - s)) END"
    )
    return m.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr(f"CAST({z2} AS BIGINT)").alias("z2_x1e6"),
        F.expr(
            f"CASE WHEN s = 0 OR s = n THEN TRUE ELSE ({z2}) < 3841459 END"
        ).alias("null_ok"),
    )


@query(
    "purchase_attribution_time_decay",
    """
WITH e AS (SELECT event_id, user_id, event_type,
                  (epoch_ns(ts) // 1000) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events
           WHERE event_type IN ('purchase', 'view', 'click')),
tch AS (SELECT user_id, event_type AS channel,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS seq
        FROM e WHERE event_type IN ('view', 'click')),
pur AS (SELECT event_id, user_id, cents,
               CAST(count(CASE WHEN event_type IN ('view', 'click')
                          THEN 1 END) OVER (
                 PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT) AS tc
        FROM e),
p AS (SELECT event_id, user_id, cents, coalesce(tc, 0) AS tc
      FROM pur WHERE event_id IN
        (SELECT event_id FROM e WHERE event_type = 'purchase')),
org AS (SELECT 'organic' AS channel,
               CAST(count(*) AS BIGINT) AS n_credits,
               CAST(sum(cents) * 1000000 AS HUGEINT) AS credited_microcents
        FROM p WHERE tc = 0),
ex AS (SELECT p.event_id, p.user_id, p.cents, p.tc,
              least(p.tc, 8) AS kk,
              unnest(range(1, CAST(least(p.tc, 8) AS INTEGER) + 1)) AS k
       FROM p WHERE tc >= 1),
cr AS (SELECT t.channel,
              CAST((ex.cents * 1000000 * (1 << CAST(ex.kk - ex.k AS INTEGER)))
                   // ((1 << CAST(ex.kk AS INTEGER)) - 1) AS HUGEINT)
                AS credited
       FROM ex JOIN tch t
         ON t.user_id = ex.user_id AND t.seq = ex.tc - ex.k + 1),
ch AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
              CAST(sum(credited) AS HUGEINT) AS credited_microcents
       FROM cr GROUP BY channel)
-- r7 dtype-parity fix: HUGEINT fetches to pandas float64 vs the engine's
-- DECIMAL(38,0) object — close the OUTPUT to BIGINT (holds ≤ 9.2e18
-- microcents ≈ $92B per channel; internal sums stay HUGEINT/DECIMAL).
SELECT channel, n_credits,
       CAST(credited_microcents AS BIGINT) AS credited_microcents
FROM (SELECT channel, n_credits, credited_microcents FROM ch
      UNION ALL
      SELECT channel, n_credits, credited_microcents FROM org
      WHERE n_credits > 0)
""",
)
def q_purchase_attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-decay (positional halving) multi-touch attribution — the third
    classic attribution mode beside the registry's first/last-touch: each
    purchase splits credit across its last ≤8 preceding touches, the k-th
    most recent weighted 2^(K−k)/(2^K − 1) (exact integer ppm — weights sum
    to 1 up to floor). Touchless purchases census as 'organic'. Engine: one
    per-user window pass numbers touches and counts precedents, an explode
    of k=1..min(tc,8) turns the lookback into an EQUI-join on
    (user, seq = tc−k+1) — never an inequality join — and credited
    micro-cents close in DECIMAL(38,0)/HUGEINT (corpus-sized sum of
    cents×1e6). Shuffle ∝ purchases×8 + touches."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("event_type").isin("purchase", "view", "click"))
    wt = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tch = (
        e.filter(F.col("event_type").isin("view", "click"))
        .withColumn("seq", F.row_number().over(wt).cast("long"))
        .select("user_id", F.col("event_type").alias("channel"), "seq")
    )
    wp = wt.rowsBetween(Window.unboundedPreceding, -1)
    is_touch = F.when(F.col("event_type").isin("view", "click"), 1)
    pur = (
        e.withColumn("tc", F.coalesce(F.count(is_touch).over(wp), F.lit(0)).cast("long"))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "cents", "tc")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    org = (
        pur.filter(F.col("tc") == 0)
        .agg(
            F.lit("organic").alias("channel"),
            F.count("*").cast("long").alias("n_credits"),
            F.sum(d38(F.col("cents") * F.lit(1_000_000))).alias(
                "credited_microcents"
            ),
        )
        .filter(F.col("n_credits") > 0)
    )
    ex = (
        pur.filter(F.col("tc") >= 1)
        .withColumn("kk", F.least(F.col("tc"), F.lit(8)))
        .withColumn(
            "k", F.explode(F.sequence(F.lit(1).cast("long"), F.col("kk")))
        )
    )
    credited = (
        d38(F.col("cents"))
        * F.lit(1_000_000)
        * d38(F.expr("shiftleft(1L, cast(kk - k AS int))"))
        / d38(F.expr("shiftleft(1L, cast(kk AS int)) - 1L"))
    )
    cr = (
        ex.join(
            tch,
            (tch["user_id"] == ex["user_id"])
            & (tch["seq"] == ex["tc"] - ex["k"] + 1),
        )
        .select(
            "channel",
            F.floor(credited).cast("decimal(38,0)").alias("credited"),
        )
    )
    ch = cr.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_credits"),
        F.sum("credited").cast("decimal(38,0)").alias("credited_microcents"),
    )
    # close the output to BIGINT (see oracle comment: dtype parity; BIGINT
    # holds ≤ ~$92B of microcents per channel)
    return ch.unionByName(org).select(
        "channel",
        "n_credits",
        F.col("credited_microcents").cast("long").alias("credited_microcents"),
    )


_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_ITERS = 8


def _markov_trans_sql() -> str:
    """Transition-count CTEs shared by the removal-effect oracle: per-user
    event order, journeys segmented at purchases, start/null boundary
    states."""
    return """
ev AS MATERIALIZED (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ns(ts), event_id) AS rn,
         count(CASE WHEN event_type = 'purchase' THEN 1 END)
           OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS jid
  FROM events),
nx AS MATERIALIZED (
  SELECT user_id, event_type, rn, coalesce(jid, 0) AS jid,
         lead(event_type) OVER w AS nxt_type,
         lead(coalesce(jid, 0)) OVER w AS nxt_jid,
         row_number() OVER (PARTITION BY user_id, coalesce(jid, 0)
                            ORDER BY rn) AS jrn
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
tr AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT event_type AS src,
           CASE WHEN nxt_type IS NULL OR nxt_jid != jid THEN 'null'
                ELSE nxt_type END AS dst
    FROM nx WHERE event_type != 'purchase'
    UNION ALL
    SELECT 'start' AS src, event_type AS dst FROM nx WHERE jrn = 1)
  GROUP BY 1, 2),
outs AS MATERIALIZED (SELECT src, CAST(sum(n) AS BIGINT) AS tot
                      FROM tr GROUP BY src)"""


def _markov_removal_oracle() -> str:
    scens = [("base", None)] + [(f"r{c}", c) for c in _MK_CHANNELS]
    parts = ["WITH RECURSIVE " + _markov_trans_sql().strip()]
    for name, removed in scens:
        rm = f"WHEN t.dst = '{removed}' THEN 0 " if removed else ""
        prev = None
        for k in range(1, _MK_ITERS + 1):
            cte = f"p_{name}_{k}"
            pp = (
                "0"
                if prev is None
                else f"coalesce((SELECT ppm FROM {prev} pp WHERE pp.state = t.dst), 0)"
            )
            parts.append(
                f"""{cte} AS MATERIALIZED (
  SELECT o.src AS state,
         CAST(coalesce(sum(t.n * CASE WHEN t.dst = 'purchase' THEN 1000000
                                      WHEN t.dst = 'null' THEN 0
                                      {rm}ELSE {pp} END), 0) // o.tot
              AS BIGINT) AS ppm
  FROM outs o LEFT JOIN tr t ON t.src = o.src
  GROUP BY o.src, o.tot)"""
            )
            prev = cte
    finals = ",\n".join(
        f"(SELECT '{c}' AS channel, (SELECT ppm FROM p_base_{_MK_ITERS} WHERE state = 'start') AS base_conv_ppm, (SELECT ppm FROM p_r{c}_{_MK_ITERS} WHERE state = 'start') AS removed_conv_ppm)"
        for c in _MK_CHANNELS
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT channel, CAST(base_conv_ppm AS BIGINT) AS base_conv_ppm,
       CAST(removed_conv_ppm AS BIGINT) AS removed_conv_ppm,
       CAST(base_conv_ppm - removed_conv_ppm AS BIGINT) AS removal_effect_ppm
FROM ({finals.replace("),", ") UNION ALL ", 99)})
"""
    )


@query("markov_removal_attribution", _markov_removal_oracle())
def q_markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    alternative to the first/last/time-decay heuristics: user journeys
    (segmented at purchases) define a 6-state transition matrix
    (start, 4 touch channels, purchase/null absorbing); conversion
    probability is the K=8-step absorption fixpoint in exact integer ppm;
    each channel's credit is the conversion drop when reaching that
    channel is redirected to null. The DISTRIBUTED work is the transition
    count (one per-user window pass over the event log); the matrix is
    ≤36 rows of planning metadata, iterated exactly in Python — the same
    bounded-collect discipline as kmeans-lite centroids. Oracle: the same
    iteration unrolled as 40 MATERIALIZED micro-CTEs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    base = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    ).withColumn(
        "jid",
        F.coalesce(
            F.count(F.when(F.col("event_type") == "purchase", 1)).over(wp),
            F.lit(0),
        ),
    )
    nxt = (
        base.withColumn("nxt_type", F.lead("event_type").over(w))
        .withColumn("nxt_jid", F.lead("jid").over(w))
        .withColumn(
            "jrn",
            F.row_number().over(
                Window.partitionBy("user_id", "jid").orderBy("ts_us", "event_id")
            ),
        )
    )
    steps = nxt.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("src"),
        F.when(
            F.col("nxt_type").isNull() | (F.col("nxt_jid") != F.col("jid")),
            F.lit("null"),
        )
        .otherwise(F.col("nxt_type"))
        .alias("dst"),
    )
    starts = nxt.filter(F.col("jrn") == 1).select(
        F.lit("start").alias("src"), F.col("event_type").alias("dst")
    )
    tr = (
        steps.unionByName(starts)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()  # ≤ (channels+1)·(channels+2) rows — planning metadata
    )
    cnt = {(r.src, r.dst): r.n for r in tr}
    outs: dict[str, int] = {}
    for (s, _), n in cnt.items():
        outs[s] = outs.get(s, 0) + n
    states = ["start", *_MK_CHANNELS]

    def absorb(removed: str | None) -> int:
        p = {s: 0 for s in states}
        for _ in range(_MK_ITERS):
            nxt_p = {}
            for s in states:
                tot = outs.get(s, 0)
                if tot == 0:
                    nxt_p[s] = 0
                    continue
                acc = 0
                for (src, dst), n in cnt.items():
                    if src != s:
                        continue
                    if dst == "purchase":
                        q = 1_000_000
                    elif dst == "null" or dst == removed:
                        q = 0
                    else:
                        q = p.get(dst, 0)
                    acc += n * q
                nxt_p[s] = acc // tot
            p = nxt_p
        return p["start"]

    basep = absorb(None)
    rows = [
        (c, basep, absorb(c), basep - absorb(c)) for c in _MK_CHANNELS
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_ppm long, removed_conv_ppm long,"
        " removal_effect_ppm long",
    )


def _cuped_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    h = h15_sql("CAST(user_id AS VARCHAR)", salt="cuped")
    return f"""
WITH mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
            FROM events),
u AS (SELECT user_id,
             CAST(sum(CASE WHEN 2 * epoch_us(ts) < (SELECT mm FROM mm)
                      THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS x,
             CAST(sum(CASE WHEN 2 * epoch_us(ts) >= (SELECT mm FROM mm)
                      THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y
      FROM events GROUP BY user_id),
v AS (SELECT user_id, x, y, {h} % 2 AS variant FROM u),
g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM v),
c AS (SELECT n, sx, sy, n * sxy - sx * sy AS cxy, n * sxx - sx * sx AS vxx
      FROM g),
pv AS (SELECT variant, CAST(count(*) AS HUGEINT) AS nv,
              CAST(sum(x) AS HUGEINT) AS sxv, CAST(sum(y) AS HUGEINT) AS syv
       FROM v GROUP BY variant),
r AS (SELECT pv.variant, pv.nv, pv.sxv, pv.syv, c.n, c.sx, c.cxy, c.vxx,
             CASE WHEN c.vxx = 0 THEN 1000000 * pv.syv * c.n
                  ELSE 1000000 * (pv.syv * c.vxx * c.n
                                  - c.cxy * (pv.sxv * c.n - c.sx * pv.nv))
             END AS num,
             CASE WHEN c.vxx = 0 THEN pv.nv * c.n
                  ELSE pv.nv * c.vxx * c.n END AS den
      FROM pv, c)
SELECT CAST(variant AS BIGINT) AS variant,
       CAST(nv AS BIGINT) AS n_users,
       CAST(syv AS BIGINT) AS sum_y,
       CAST((1000000 * syv) // nv AS BIGINT) AS raw_mean_x1e6,
       CAST((num - ((num % den) + den) % den) / den AS BIGINT)
         AS cuped_mean_x1e6,
       CAST(CASE WHEN vxx = 0 THEN 0 ELSE
            (1000000 * cxy - ((1000000 * cxy % vxx) + vxx) % vxx) / vxx END
            AS BIGINT) AS theta_x1e6
FROM r
"""


@query("cuped_adjusted_lift", _cuped_oracle())
def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout — the industry-standard
    pre-period adjustment beside the registry's A/A, two-proportion and
    DID checks: per user, x = pre-period value (first half of global
    time), y = experiment-period value; θ = Cxy/Vxx from exact integer
    covariance moments; each hash-variant's adjusted mean
    ȳᵥ − θ(x̄ᵥ − x̄) closes as ONE exact rational — numerator and
    denominator in DECIMAL(38,0)/HUGEINT, floored via the
    subtract-floor-mod identity so a negative numerator floors
    identically cross-engine (truncating div would round toward zero).
    One scan → per-user aggregate (users-sized) → two 1-row/2-row
    aggregates: experiment readouts at any event volume."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    dollars = F.round("value").cast("long")
    u = (
        ev.crossJoin(F.broadcast(mm))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(2 * F.unix_micros("ts") < F.col("mm"), dollars).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(2 * F.unix_micros("ts") >= F.col("mm"), dollars).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("y"),
        )
    )
    v = u.withColumn(
        "variant", h15(F.col("user_id").cast("string"), salt="cuped") % 2
    ).localCheckpoint(eager=True)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = v.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x")) * d38(F.col("y"))).alias("sxy"),
    )
    c = g.select(
        "n",
        "sx",
        "sy",
        F.expr("n * sxy - sx * sy").alias("cxy"),
        F.expr("n * sxx - sx * sx").alias("vxx"),
    )
    pv = v.groupBy("variant").agg(
        F.count("*").cast("decimal(38,0)").alias("nv"),
        F.sum("x").cast("decimal(38,0)").alias("sxv"),
        F.sum("y").cast("decimal(38,0)").alias("syv"),
    )
    r = pv.crossJoin(F.broadcast(c)).selectExpr(
        "variant",
        "nv",
        "syv",
        "cxy",
        "vxx",
        "CASE WHEN vxx = 0 THEN 1000000 * syv * n"
        " ELSE 1000000 * (syv * vxx * n - cxy * (sxv * n - sx * nv)) END AS num",
        "CASE WHEN vxx = 0 THEN nv * n ELSE nv * vxx * n END AS den",
    )
    return r.selectExpr(
        "CAST(variant AS BIGINT) AS variant",
        "CAST(nv AS BIGINT) AS n_users",
        "CAST(syv AS BIGINT) AS sum_y",
        "CAST((1000000 * syv) div nv AS BIGINT) AS raw_mean_x1e6",
        "CAST((num - ((num % den) + den) % den) div den AS BIGINT)"
        " AS cuped_mean_x1e6",
        "CAST(CASE WHEN vxx = 0 THEN 0 ELSE"
        " (1000000 * cxy - ((1000000 * cxy % vxx) + vxx) % vxx) div vxx END"
        " AS BIGINT) AS theta_x1e6",
    )


def _kripp_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    def lab(noise_salt: str, flip_salt: str) -> str:
        return (
            f"CASE WHEN {h15_sql('text', flip_salt)} % 10 < 2"
            f" THEN {h15_sql('text', noise_salt)} % 3"
            f" ELSE {h15_sql('text', 'kap-sig')} % 3 END"
        )

    return f"""
WITH lab AS (
  SELECT lang, {lab('kap-na', 'kap-fa')} AS a, {lab('kap-nb', 'kap-fb')} AS b
  FROM documents),
agg AS (
  SELECT lang, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CASE WHEN a != b THEN 1 ELSE 0 END) AS HUGEINT) AS d,
         CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END)
              + sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS p0,
         CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END)
              + sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS p1,
         CAST(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END)
              + sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS p2
  FROM lab GROUP BY lang),
m AS (SELECT lang, n, d, (2*n)*(2*n) - (p0*p0 + p1*p1 + p2*p2) AS de_num
      FROM agg)
SELECT lang, CAST(n AS BIGINT) AS n, CAST(d AS BIGINT) AS n_disagree,
       CAST(CASE WHEN de_num = 0 OR n <= 0 THEN 0 ELSE
            (1000000 * (de_num * n - d * (2*n) * (2*n - 1)))
            // (de_num * n) END AS BIGINT) AS alpha_ppm
FROM m
"""


@query("krippendorff_alpha", _kripp_oracle())
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, 2 coders) per language — the
    chance-corrected agreement metric that, unlike Cohen's kappa beside
    it, draws expected disagreement from the POOLED label marginals
    (the content-analysis standard, and the one that generalizes to
    missing data). Same deterministic hash labelers as annotator_kappa so
    the two metrics are directly comparable; α = 1 − Do/De closes as ONE
    exact integer rational: ⌊1e6·(Deₙ·n − d·2n(2n−1)) / (Deₙ·n)⌋ with
    Deₙ = (2n)² − Σ_k pooled_k², everything DECIMAL(38,0)/HUGEINT."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    sig = h15(F.col("text"), "kap-sig") % 3

    def lab(noise_salt: str, flip_salt: str):
        return F.when(
            h15(F.col("text"), flip_salt) % 10 < 2,
            h15(F.col("text"), noise_salt) % 3,
        ).otherwise(sig)

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", lab("kap-na", "kap-fa").alias("a"), lab("kap-nb", "kap-fb").alias("b")
    )
    d38 = "decimal(38,0)"
    pooled = lambda k: (  # noqa: E731
        F.sum(F.when(F.col("a") == k, 1).otherwise(0))
        + F.sum(F.when(F.col("b") == k, 1).otherwise(0))
    ).cast(d38)
    agg = docs.groupBy("lang").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.when(F.col("a") != F.col("b"), 1).otherwise(0))
        .cast(d38)
        .alias("d"),
        *[pooled(k).alias(f"p{k}") for k in range(3)],
    )
    m = agg.select(
        "lang",
        "n",
        "d",
        F.expr("(2*n)*(2*n) - (p0*p0 + p1*p1 + p2*p2)").alias("de_num"),
    )
    return m.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("d").cast("long").alias("n_disagree"),
        F.expr(
            "CAST(CASE WHEN de_num = 0 OR n <= 0 THEN 0 ELSE"
            " (1000000 * (de_num * n - d * (2*n) * (2*n - 1)))"
            " div (de_num * n) END AS BIGINT)"
        ).alias("alpha_ppm"),
    )


def _experiment_e2e_oracle() -> str:
    from videos_to_tfrecords_spark.functions.hashing import h15_sql

    ha = h15_sql("CAST(event_id AS VARCHAR)", salt="aa")
    hu = h15_sql("CAST(user_id AS VARCHAR)", salt="cuped")
    return f"""
WITH e AS (SELECT {ha} % 2 AS side,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
g AS (SELECT CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
             CAST(sum(CASE WHEN side = 0 THEN y ELSE 0 END) AS HUGEINT) AS sa,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
             CAST(sum(CASE WHEN side = 1 THEN y ELSE 0 END) AS HUGEINT) AS sb
      FROM e),
aa AS (SELECT CASE WHEN (sa + sb) = 0 OR (sa + sb) = (na + nb) THEN TRUE
              ELSE (1000000 * (sa*nb - sb*na) * (sa*nb - sb*na) * (na+nb))
                   // (na * nb * (sa+sb) * (na+nb-sa-sb)) < 3841459 END
                AS aa_ok
       FROM g),
mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
       FROM events),
u AS (SELECT user_id,
             CAST(sum(CASE WHEN 2 * epoch_us(ts) < (SELECT mm FROM mm)
                      THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS x,
             CAST(sum(CASE WHEN 2 * epoch_us(ts) >= (SELECT mm FROM mm)
                      THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y
      FROM events GROUP BY user_id),
v AS (SELECT user_id, x, y, {hu} % 2 AS variant FROM u),
cg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(x AS HUGEINT) * y) AS sxy
       FROM v),
cc AS (SELECT n, sx, n * sxy - sx * sy AS cxy, n * sxx - sx * sx AS vxx
       FROM cg),
pv AS (SELECT variant, CAST(count(*) AS HUGEINT) AS nv,
              CAST(sum(x) AS HUGEINT) AS sxv, CAST(sum(y) AS HUGEINT) AS syv
       FROM v GROUP BY variant),
r AS (SELECT pv.variant,
             CASE WHEN cc.vxx = 0 THEN 1000000 * pv.syv * cc.n
                  ELSE 1000000 * (pv.syv * cc.vxx * cc.n
                                  - cc.cxy * (pv.sxv * cc.n - cc.sx * pv.nv))
             END AS num,
             CASE WHEN cc.vxx = 0 THEN pv.nv * cc.n
                  ELSE pv.nv * cc.vxx * cc.n END AS den
      FROM pv, cc),
adj AS (SELECT variant,
               CAST((num - ((num % den) + den) % den) / den AS BIGINT) AS m
        FROM r),
lift AS (SELECT (SELECT m FROM adj WHERE variant = 1)
               - (SELECT m FROM adj WHERE variant = 0) AS lift_x1e6)
SELECT aa.aa_ok,
       CAST((SELECT m FROM adj WHERE variant = 0) AS BIGINT)
         AS control_mean_x1e6,
       CAST((SELECT m FROM adj WHERE variant = 1) AS BIGINT)
         AS treat_mean_x1e6,
       CAST(lift.lift_x1e6 AS BIGINT) AS lift_x1e6,
       (aa.aa_ok AND lift.lift_x1e6 > 0) AS ship_decision
FROM aa, lift
"""


@query("experiment_readout_e2e", _experiment_e2e_oracle())
def q_experiment_readout_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END experimentation readout — the seventh mainline: the A/A
    bias gate on a pure event-hash split (same χ² statistic and 3.84
    critical value as aa_test_null_check) feeding the CUPED
    variance-reduced per-variant means and the ship/hold decision
    (A/A clean AND positive adjusted lift). Every stage is the registry's
    individually-verified operator; this pins the COMPOSITION (the gate
    boolean, both adjusted means, the lift, and the decision) in one
    hash-checked row."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        (h15(F.col("event_id").cast("string"), salt="aa") % 2).alias("side"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    d38 = "decimal(38,0)"
    g = e.agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast(d38).alias("na"),
        F.sum(F.when(F.col("side") == 0, F.col("y")).otherwise(0))
        .cast(d38)
        .alias("sa"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast(d38).alias("nb"),
        F.sum(F.when(F.col("side") == 1, F.col("y")).otherwise(0))
        .cast(d38)
        .alias("sb"),
    )
    aa = g.selectExpr(
        "CASE WHEN (sa + sb) = 0 OR (sa + sb) = (na + nb) THEN TRUE"
        " ELSE (1000000 * (sa*nb - sb*na) * (sa*nb - sb*na) * (na+nb))"
        "      div (na * nb * (sa+sb) * (na+nb-sa-sb)) < 3841459 END AS aa_ok"
    )
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    dollars = F.round("value").cast("long")
    u = (
        ev.crossJoin(F.broadcast(mm))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(2 * F.unix_micros("ts") < F.col("mm"), dollars).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(2 * F.unix_micros("ts") >= F.col("mm"), dollars).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    v = u.withColumn(
        "variant", h15(F.col("user_id").cast("string"), salt="cuped") % 2
    ).localCheckpoint(eager=True)
    cg = v.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("sxy"),
    )
    cc = cg.selectExpr(
        "n", "sx", "n * sxy - sx * sy AS cxy", "n * sxx - sx * sx AS vxx"
    )
    pv = v.groupBy("variant").agg(
        F.count("*").cast(d38).alias("nv"),
        F.sum("x").cast(d38).alias("sxv"),
        F.sum("y").cast(d38).alias("syv"),
    )
    adj = (
        pv.crossJoin(F.broadcast(cc))
        .selectExpr(
            "variant",
            "CASE WHEN vxx = 0 THEN 1000000 * syv * n"
            " ELSE 1000000 * (syv * vxx * n - cxy * (sxv * n - sx * nv)) END"
            " AS num",
            "CASE WHEN vxx = 0 THEN nv * n ELSE nv * vxx * n END AS den",
        )
        .selectExpr(
            "variant",
            "CAST((num - ((num % den) + den) % den) div den AS BIGINT) AS m",
        )
    )
    a0 = adj.filter(F.col("variant") == 0).select(
        F.col("m").alias("control_mean_x1e6")
    )
    a1 = adj.filter(F.col("variant") == 1).select(
        F.col("m").alias("treat_mean_x1e6")
    )
    return (
        aa.crossJoin(a0)
        .crossJoin(a1)
        .select(
            "aa_ok",
            "control_mean_x1e6",
            "treat_mean_x1e6",
            (F.col("treat_mean_x1e6") - F.col("control_mean_x1e6"))
            .cast("long")
            .alias("lift_x1e6"),
            (
                F.col("aa_ok")
                & (F.col("treat_mean_x1e6") > F.col("control_mean_x1e6"))
            ).alias("ship_decision"),
        )
    )
