"""Round-3 feature-engineering queries: retrieval, embedding diagnostics,
time-series features, multi-objective filtering, weighted sampling.

Cross-engine determinism: BM25/EWMA floats use an identical IEEE expression
tree on both engines and are floor-scaled to integers for hashing; the
EWMA's alpha=0.5 makes every weight a power of two (exact products); kNN and
the Gram matrix are pure scaled-int64 arithmetic; the weighted sample's
exponential race keys are spaced far wider than any ulp divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.hashing import h15_sql
from videos_to_tfrecords_spark.operators.relational import ewma_taps, skyline_2d
from videos_to_tfrecords_spark.operators.retrieval import (
    bm25_oracle_sql,
    bm25_topk,
    rerank_oracle_sql,
    rerank_topk,
)
from videos_to_tfrecords_spark.operators.sampling import weighted_sample_exact_k
from videos_to_tfrecords_spark.operators.similarity import (
    brute_force_topk,
    gram_matrix,
    knn_loo_accuracy,
)
from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table

_BM25_TERMS = ["hash", "join", "vector", "stream"]

_DOT = (
    "CAST(list_sum(list_transform(list_zip(a.v, b.v), "
    "p -> p[1] * p[2])) AS BIGINT)"
)
_IV = "list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT))"


@query("bm25_topk_docs", bm25_oracle_sql(_BM25_TERMS, k=20))
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 over `documents` for a fixed term bag — the corpus
    retrieval/slicing primitive (see operators/retrieval.py for the
    posting-list shuffle profile)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


@query("retrieval_rerank_topk", rerank_oracle_sql(_BM25_TERMS, k_recall=50, k=10))
def q_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve-then-rerank (r7): BM25 top-50 recall over the
    corpus, then an exact-integer hashed cross-scorer over the bounded
    candidate set only — the production search/RAG shape where the
    expensive scorer's cost is O(k_recall), independent of corpus size.
    See operators/retrieval.rerank_topk for the scorer contract."""
    docs = load_table(spark, sf_dir, "documents")
    return rerank_topk(docs, _BM25_TERMS, k_recall=50, k=10)


@query(
    "knn_loo_accuracy",
    f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 400) AS m FROM embeddings),
e AS (SELECT vec_id, label, {_IV} AS v FROM embeddings),
s AS (SELECT a.vec_id AS qid, a.label AS true_label, b.label AS pred_label,
             b.vec_id AS cid, {_DOT} AS dot
      FROM e a, e b WHERE a.vec_id % (SELECT m FROM kq) = 0
        AND b.vec_id != a.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rnk
      FROM s)
SELECT true_label AS label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(floor(1000 * sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                  / count(*)) AS BIGINT) AS acc_x1000
FROM r WHERE rnk = 1 GROUP BY 1
""",
)
def q_knn_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label agreement per class — embedding-space
    quality probe; exact neighbors via the broadcast brute-force kernel.
    Query side bounded at ~400 via a corpus-derived modulus — the fixed
    1-in-10 sample made |queries| ∝ corpus and the sf1 suite measured 78×
    at 10× rows (the ann_recall_at_k probe-set lesson, eval edition)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_loo_accuracy(emb, query_mod="auto")


@query(
    "label_noise_knn_audit",
    f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 400) AS m FROM embeddings),
e AS (SELECT vec_id, label, {_IV} AS v FROM embeddings),
s AS (SELECT a.vec_id AS qid, a.label AS true_label, b.label AS pred_label,
             b.vec_id AS cid, {_DOT} AS dot
      FROM e a, e b WHERE a.vec_id % (SELECT m FROM kq) = 0
        AND b.vec_id != a.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rnk
      FROM s)
SELECT qid AS vec_id, true_label AS label,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same,
       2 * sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) < 5 AS noisy
FROM r WHERE rnk <= 5 GROUP BY 1, 2
""",
)
def q_label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EXAMPLE label-noise audit via k=5 NN disagreement (the
    confident-learning-style mislabel screen a curation pipeline runs
    before training on weak labels): a point whose neighborhood majority
    votes a DIFFERENT class is flagged noisy and surfaced for review or
    pruning. The point-level complement to knn_loo_accuracy's per-class
    summary — this query returns the actual flagged examples.

    Exact neighbors from the same broadcast brute-force kernel
    (brute_force_topk, k=5, self excluded, id tie-break), probe bounded
    at ~400 points via a corpus-derived modulus (fixed-mod ⇒ quadratic
    pair volume — the knn_loo lesson). Integer counts + a boolean flag;
    no floats cross the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = max(1, int(emb.count()) // 400)
    probe = emb.filter(F.col("vec_id") % m == 0)
    nn = brute_force_topk(probe, emb, k=5)
    labels = emb.select("vec_id", "label")
    joined = nn.join(
        F.broadcast(
            labels.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("true_label"),
            )
        ),
        "query_id",
    ).join(
        F.broadcast(
            labels.select(
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("pred_label"),
            )
        ),
        "cand_id",
    )
    return (
        joined.groupBy(
            F.col("query_id").alias("vec_id"),
            F.col("true_label").alias("label"),
        )
        .agg(
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_same")
        )
        .withColumn("noisy", (2 * F.col("n_same")) < F.lit(5))
    )


@query(
    "embedding_gram_matrix",
    f"""
WITH e AS (SELECT {_IV} AS v FROM embeddings),
idx AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1))
          AS k)
SELECT CAST(a.k - 1 AS BIGINT) AS i, CAST(b.k - 1 AS BIGINT) AS j,
       CAST(sum(e.v[a.k] * e.v[b.k]) AS BIGINT) AS g
FROM e, idx a, idx b WHERE a.k <= b.k GROUP BY 1, 2
""",
)
def q_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix (upper triangle) of the embedding table —
    the PCA/whitening sufficient statistic; per-partition numpy partials,
    dim²-sized shuffle only."""
    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix(emb)


# fixed-tap EWMA weights 0.5^j — exact binary fractions, written literally
# in the oracle so both expression trees are identical
_EWMA_SQL_TERMS = " + ".join(
    f"{0.5 ** j!r} * coalesce(lag(value, {j}) OVER w, 0.0)" for j in range(1, 8)
)


@query(
    "ewma_user_value",
    f"""
SELECT event_id, user_id,
       CAST(floor((coalesce(value, 0.0) + {_EWMA_SQL_TERMS}) * 1000000) AS BIGINT)
         AS ewma_x1e6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 8-tap exponentially-decayed activity feature over the
    event stream (operators/relational.ewma_taps)."""
    ev = load_table(spark, sf_dir, "events")
    out = ewma_taps(ev, "user_id", ["ts", "event_id"], "value", alpha=0.5, taps=8)
    return out.select("event_id", "user_id", "ewma_x1e6")


@query(
    "skyline_parts",
    """
SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
       CAST(p_size AS BIGINT) AS p_size
FROM part p1
WHERE NOT EXISTS (
  SELECT 1 FROM part p2
  WHERE p2.p_retailprice <= p1.p_retailprice AND p2.p_size <= p1.p_size
    AND (p2.p_retailprice < p1.p_retailprice OR p2.p_size < p1.p_size))
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts minimizing (retail price, size). The oracle
    is the O(n²) NOT EXISTS dominance test; the engine plan is the
    aggregate + running-min + broadcast-back shape (operators/relational
    .skyline_2d) — same rows, no quadratic join."""
    part = load_table(spark, sf_dir, "part")
    sky = skyline_2d(part, "p_partkey", "p_retailprice", "p_size")
    return sky.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )


@query(
    "weighted_doc_sample",
    f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         -ln(({h15_sql("concat('wsamp:', CAST(doc_id AS VARCHAR))")} + 1)
             / 1152921504606846976.0) / n_chars AS wkey
  FROM documents),
r AS (SELECT doc_id, n_chars, wkey,
             row_number() OVER (ORDER BY wkey, doc_id) AS rn FROM keyed)
SELECT doc_id, n_chars,
       CAST(floor(wkey * 1000000000) AS BIGINT) AS wkey_x1e9
FROM r WHERE rn <= 100
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-100 length-weighted document draw (Efraimidis–Spirakis race
    with portable-hash clocks; operators/sampling.weighted_sample_exact_k)."""
    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample_exact_k(docs, "doc_id", "n_chars", k=100)
    return out.select("doc_id", "n_chars", "wkey_x1e9")


def _cms_cells_sql(src: str, width: int = 256, depth: int = 4) -> str:
    return " UNION ALL ".join(
        f"SELECT bigram, {d} AS d, "
        f"{h15_sql('bigram', salt=f'cms{d}')} % {width} AS bucket FROM {src}"
        for d in range(depth)
    )


@query(
    "cms_bigram_frequencies",
    f"""
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
bg AS (SELECT unnest(CASE WHEN len(t) >= 2 THEN
         list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
         ELSE [] END) AS bigram FROM tok),
cells AS ({_cms_cells_sql('bg')}),
counts AS (SELECT d, bucket, count(*) AS c FROM cells GROUP BY 1, 2),
top AS (SELECT bigram, CAST(count(*) AS BIGINT) AS true_n FROM bg
        GROUP BY 1 ORDER BY true_n DESC, bigram LIMIT 20),
probes AS ({_cms_cells_sql('top')}),
est AS (SELECT p.bigram, min(c.c) AS cms_n
        FROM probes p JOIN counts c ON p.d = c.d AND p.bucket = c.bucket
        GROUP BY 1)
SELECT t.bigram, t.true_n, CAST(e.cms_n AS BIGINT) AS cms_n,
       CAST(e.cms_n - t.true_n AS BIGINT) AS overcount
FROM top t JOIN est e ON t.bigram = e.bigram
""",
)
def q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation of the corpus's top-20
    bigrams. The sketch build shuffles ≤ depth·width keys (map-side partial
    sums) no matter the corpus size; estimates are min-over-rows and the
    never-underestimates bias is exposed as ``overcount``. Deterministic
    hash family ⇒ even the approximation is hash-checked."""
    from videos_to_tfrecords_spark.functions.textfn import exploded_shingles
    from videos_to_tfrecords_spark.operators.sketches import (
        cms_counts_weighted,
        cms_estimate,
    )

    docs = load_table(spark, sf_dir, "documents")
    items = exploded_shingles(docs, [], "text", 2).withColumnRenamed(
        "shingle", "bigram"
    )
    # ONE corpus pass: materialize the vocab-sized (bigram, n) aggregate and
    # feed both the true top-20 and the sketch from it (localCheckpoint —
    # the pagerank/dedup eager-release pattern; without it the explode+agg
    # subtree executes once per consumer, Catalyst has no cross-join CSE)
    counts = (
        items.groupBy("bigram").agg(F.count("*").alias("n")).localCheckpoint(eager=True)
    )
    top = (
        counts.select("bigram", F.col("n").alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("bigram"))
        .limit(20)
    )
    est = cms_estimate(
        items,
        top.select("bigram"),
        "bigram",
        counter_table=cms_counts_weighted(counts, "bigram"),
    )
    return top.join(est, "bigram").select(
        "bigram",
        "true_n",
        "cms_n",
        (F.col("cms_n") - F.col("true_n")).alias("overcount"),
    )


def _pca_oracle_sql(iters: int = 4) -> str:
    tdiv = lambda num, den: (  # noqa: E731 — truncating div, Spark/Python twin
        f"CASE WHEN {num} < 0 THEN -((-({num})) // {den}) ELSE ({num}) // {den} END"
    )
    parts = [
        f"""WITH e AS (SELECT {_IV} AS v FROM embeddings),
idx AS (SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1))
          AS k),
gup AS (SELECT CAST(a.k - 1 AS BIGINT) AS i, CAST(b.k - 1 AS BIGINT) AS j,
               CAST(sum(e.v[a.k] * e.v[b.k]) AS BIGINT) AS g
        FROM e, idx a, idx b WHERE a.k <= b.k GROUP BY 1, 2),
g AS (SELECT i, j, g FROM gup UNION ALL SELECT j, i, g FROM gup WHERE i <> j),
sd AS (SELECT max(abs(g)) // 1000000 + 1 AS d FROM g),
m AS (SELECT i, j, {tdiv('g', 'd')} AS m FROM g, sd),
v0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS v FROM m)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"w{k} AS (SELECT m.i AS i, CAST(sum(m.m * v.v) AS BIGINT) AS w "
            f"FROM m JOIN v{k-1} v ON m.j = v.i GROUP BY 1)"
        )
        parts.append(f"d{k} AS (SELECT max(abs(w)) // 1000000 + 1 AS d FROM w{k})")
        parts.append(
            f"v{k} AS (SELECT i, {tdiv('w', 'd')} AS v FROM w{k}, d{k})"
        )
    return ",\n".join(parts) + f"\nSELECT i, v AS eig_x1e6 FROM v{iters}"


@query("pca_power_component", _pca_oracle_sql(iters=4))
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal-direction of the embedding table: the distributed
    part is the Gram matrix (per-partition numpy partials, dim²-row
    result); the power iteration runs driver-side on that metadata-sized
    statistic in exact scaled-int64 (operators/sketches.power_iteration_int
    — same stance as kmeans_lite's driver-held centroids), so the
    eigenvector DIRECTION is hash-checked against a 4-iteration unrolled
    SQL oracle, not just numerically close to numpy."""
    from videos_to_tfrecords_spark.operators.sketches import power_iteration_int

    emb = load_table(spark, sf_dir, "embeddings")
    rows = gram_matrix(emb).collect()
    v = power_iteration_int([(r.i, r.j, r.g) for r in rows], iters=4)
    return spark.createDataFrame(
        sorted(v.items()), "i long, eig_x1e6 long"
    )


@query(
    "source_shingle_containment",
    """
WITH tok AS (SELECT source, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT source,
              unnest(CASE WHEN len(t) >= 3 THEN
                list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END) AS s
       FROM tok),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
common AS (SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS c
           FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
           GROUP BY 1, 2)
SELECT src_a, src_b, c AS n_common,
       CAST(floor(1000 * c / (sa.n + sb.n - c)) AS BIGINT) AS jaccard_x1000,
       CAST(floor(1000 * c / sa.n) AS BIGINT) AS contain_a_x1000,
       CAST(floor(1000 * c / sb.n) AS BIGINT) AS contain_b_x1000
FROM common JOIN sizes sa ON sa.source = src_a JOIN sizes sb ON sb.source = src_b
""",
)
def q_source_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap audit BETWEEN SOURCES: pairwise Jaccard + directional
    containment of distinct 3-token shingle sets — how an LLM pipeline
    quantifies which feeds duplicate which (containment ≫ jaccard flags a
    subset relationship). The join is an inverted index on the shingle
    (shuffle ∝ distinct postings, never |A|·|B|); per-source sizes are a
    k-row broadcast."""
    from videos_to_tfrecords_spark.functions.textfn import exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    # materialize the distinct (source, shingle) postings once — three
    # consumers (sizes + both join sides) would otherwise re-run the
    # explode+distinct subtree each
    sh = (
        exploded_shingles(docs, ["source"], "text", 3)
        .withColumnRenamed("shingle", "s")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "s")
    b = sh.select(F.col("source").alias("src_b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.floor(1000 * F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")))
            .cast("long")
            .alias("jaccard_x1000"),
            F.floor(1000 * F.col("n_common") / F.col("na")).cast("long").alias("contain_a_x1000"),
            F.floor(1000 * F.col("n_common") / F.col("nb")).cast("long").alias("contain_b_x1000"),
        )
    )


@query(
    "equidepth_value_histogram",
    """
WITH b AS (SELECT event_type, value,
                  ntile(8) OVER (PARTITION BY event_type
                                 ORDER BY value, event_id) AS bucket
           FROM events)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(min(value) * 100) AS BIGINT) AS lo_cents,
       CAST(round(max(value) * 100) AS BIGINT) AS hi_cents
FROM b GROUP BY 1, 2
""",
)
def q_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type equi-depth (ntile) histogram of event values — the
    boundary statistic behind range partitioning, skew diagnosis, and
    feature binning. Partitioned by event_type so the ordered pass is a
    per-key sort (no single global sort partition); tie-broken by event_id
    so bucket assignment is total and cross-engine stable."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    b = ev.withColumn("bucket", F.ntile(8).over(w))
    return b.groupBy("event_type", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.min("value") * 100).cast("long").alias("lo_cents"),
        F.round(F.max("value") * 100).cast("long").alias("hi_cents"),
    )


@query(
    "doc_chunking",
    """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tt AS (SELECT doc_id, t, len(t) AS n FROM tk),
s AS (SELECT doc_id, t, n,
             unnest(CASE WHEN n > 0 THEN generate_series(0, n - 1, 24)
                    ELSE [] END) AS start
      FROM tt)
SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
       CAST(least(32, n - start) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(t, start + 1, start + 32), ' ') AS chunk_text
FROM s
""",
)
def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token context windows (len 32, stride 24) over
    every document — the training-window preparation pass
    (operators/text.chunk_documents: one narrow codegen'd pass, output rows
    ∝ corpus tokens / stride, no shuffle)."""
    from videos_to_tfrecords_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_len=32, stride=24)


@query(
    "doc_simhash_hamming_pairs",
    f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
th AS (SELECT doc_id, {h15_sql('tok', salt='tok')} AS h FROM tok),
bits AS (SELECT doc_id, b,
                sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM th, (SELECT unnest(range(0, 60)) AS b) GROUP BY 1, 2),
sig AS (SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                        ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY 1),
bands AS (SELECT doc_id, sh, d, (sh >> (15 * d)) & 32767 AS band
          FROM sig, (SELECT unnest(range(0, 4)) AS d)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                a.sh AS sa, b.sh AS sb
         FROM bands a JOIN bands b
           ON a.d = b.d AND a.band = b.band AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
""",
)
def q_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at SimHash Hamming distance ≤ 3 via PIGEONHOLE
    banding: the full 60-bit h15 signature split into 4 bands of 15 bits —
    any pair within distance 3 leaves ≥1 band untouched, so an equi-join
    per band finds all of them (candidates ∝ band-bucket populations,
    never all pairs); exact popcount verification touches candidates only.
    The LSH-shaped scale path for Hamming space, complementing the
    MinHash/Jaccard family.

    Band width IS the scale knob: random collisions grow ∝ n²/2^width per
    band, so the r04 sf1 probe showed the earlier 8-bit bands (256
    buckets) going superlinear (exponent 1.39, 24.6× for 10× docs) — 15-
    bit bands (32768 buckets) push the quadratic term down 128× and the
    probe back to ~linear. At larger corpora, widen bands further (a
    k-bit hash gives k/4-bit bands) — the pigeonhole argument only needs
    ≥ threshold+1 bands."""
    from videos_to_tfrecords_spark.operators.dedup import simhash

    docs = load_table(spark, sf_dir, "documents")
    sig = simhash(docs, bits=60)
    bands = sig.select(
        "doc_id",
        F.col("simhash").alias("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.shiftright("simhash", 15 * d)
                        .bitwiseAND(F.lit(32767))
                        .alias("band"),
                    )
                    for d in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sh", F.col("c.d").alias("d"), F.col("c.band").alias("band"))
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"), "d", "band"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"), "d", "band"
    )
    cand = (
        a.join(b, ["d", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.expr("sa ^ sb")).cast("long")
    ).filter(F.col("hamming") <= 3).select("id_a", "id_b", "hamming")


@query(
    "event_value_outliers",
    """
WITH v AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events),
med AS (SELECT event_type, quantile_cont(vc, 0.5) AS med FROM v GROUP BY 1),
dev AS (SELECT v.event_type, vc, med, abs(vc - med) AS ad
        FROM v JOIN med USING (event_type)),
mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad, CAST(count(*) AS BIGINT) AS n
        FROM dev GROUP BY 1)
SELECT d.event_type,
       CAST(2 * d.med AS BIGINT) AS med_x2,
       CAST(2 * m.mad AS BIGINT) AS mad_x2,
       m.n,
       CAST(sum(CASE WHEN d.ad > 5 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1, 2, 3, 4
""",
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier census: exact interpolated median + MAD
    (median absolute deviation), flagging values beyond 5·MAD — the
    data-quality gate shape (robust statistics, not mean/stddev, so a few
    corrupt rows can't move the fence). Two keyed aggregates + broadcast
    joins back; exact percentile needs the per-group sort Spark's
    `percentile` does internally — group count is the type cardinality,
    tiny at any corpus scale. Both engines use the same linear-interpolated
    exact quantile, and the doubled outputs (med_x2/mad_x2) are exact
    integers because .5 fractions are the only possible non-integers."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    med = ev.groupBy("event_type").agg(F.expr("percentile(vc, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("vc") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad"), F.count("*").alias("n")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy(
            "event_type",
            (2 * F.col("med")).cast("long").alias("med_x2"),
            (2 * F.col("mad")).cast("long").alias("mad_x2"),
            F.col("n"),
        )
        .agg(
            F.sum(F.when(F.col("ad") > 5 * F.col("mad"), 1).otherwise(0)).alias(
                "n_outliers"
            )
        )
    )


@query(
    "user_value_trend",
    """
WITH b AS (
  SELECT user_id,
         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
           // 86400000000 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM b GROUP BY 1)
SELECT user_id, n,
       CAST(floor(1000000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx)) AS BIGINT)
         AS slope_x1e6
FROM s WHERE n * sxx - sx * sx > 0
""",
)
def q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of spend vs days-since-first-event — the trend
    feature of a behavioral feature store, computed from the five exact
    integer sufficient statistics (n, Σx, Σy, Σxy, Σx²) in ONE keyed
    aggregate after a same-key window (both hash-partition on user_id, so
    AQE reuses the exchange). Day offsets are rebased per user so x² sums
    stay far under int64; the single closing division is one double op with
    identical order in both engines. Users whose events all land on one
    day (zero variance) are excluded exactly."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    b = ev.select(
        "user_id",
        F.expr(
            "(unix_micros(ts) - min(unix_micros(ts)) OVER "
            "(PARTITION BY user_id)) div 86400000000"
        ).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    s = b.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.filter(den > 0)
        .select(
            "user_id",
            "n",
            F.floor(F.lit(1000000.0) * num / den).cast("long").alias("slope_x1e6"),
        )
    )


@query(
    "event_value_fill_forward",
    """
SELECT event_id, user_id,
       CAST(round(coalesce(
         last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         0.0) * 100) AS BIGINT) AS filled_cents
FROM events
""",
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation: error events carry no trustworthy value
    (masked to NULL), each user's timeline takes the last valid observation
    instead — the standard time-series imputation shape, as one analytic
    window (per-key partitioned running last-non-null; leading gaps → 0).
    One shuffle on the key; no state beyond the frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce(F.last(masked, ignorenulls=True).over(w), F.lit(0.0)) * 100
        )
        .cast("long")
        .alias("filled_cents"),
    )


@query(
    "doc_negative_samples",
    f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT doc_id, j,
             {h15_sql("concat('neg', CAST(j AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")}
               % (SELECT n_docs FROM n) AS neg_id
      FROM documents, (SELECT unnest(range(0, 4)) AS j))
SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(neg_id AS BIGINT) AS neg_id
FROM s WHERE neg_id != doc_id
""",
)
def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: 4
    pseudo-random partner ids per document via the portable hash modulo the
    corpus size (self-pairs dropped, so a document occasionally yields 3).
    Map-only over the corpus + a 1-row count broadcast — no shuffle of data
    rows, reproducible across runs/engines, hence oracle-checked; the
    id-contiguity assumption is the standard contract of a training-corpus
    manifest."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # 1 driver scalar (metadata, like AQE stats)
    negs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(
                    h15(
                        F.concat(
                            F.lit(f"neg{j}:"), F.col("doc_id").cast("string")
                        )
                    ),
                    F.lit(n_docs),
                ).alias("neg_id"),
            )
            for j in range(4)
        ]
    )
    return (
        docs.select("doc_id", F.explode(negs).alias("s"))
        .select(
            "doc_id",
            F.col("s.j").cast("long").alias("j"),
            F.col("s.neg_id").cast("long").alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )


@query(
    "grouped_split_assignment",
    f"""
WITH b AS (SELECT user_id, event_id,
                  {h15_sql("concat('gsplit:', CAST(user_id AS VARCHAR))")} % 100
                    AS bucket
           FROM events),
lab AS (SELECT user_id, event_id,
               CASE WHEN bucket < 70 THEN 'train'
                    WHEN bucket < 85 THEN 'val' ELSE 'test' END AS split
        FROM b)
SELECT split,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM lab GROUP BY 1
""",
)
def q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level train/val/test assignment (all of a user's events share
    one split — the leakage-safe variant of the reference's row-level
    randomly_split, reference preprocess.py:36-70): the split is a pure
    hash of the GROUP key, so no event of a user can cross splits by
    construction, no join against an assignment table is needed, and the
    partition is reproducible across engines. Output: per-split user and
    event counts."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(h15(F.col("user_id").cast("string"), salt="gsplit"), F.lit(100))
    split = (
        F.when(bucket < 70, "train").when(bucket < 85, "val").otherwise("test")
    )
    return (
        ev.select("user_id", "event_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "geometric_mean_value",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(floor(exp(sum(CAST(floor(ln(value) * 1000000000000) AS BIGINT))
                      / count(*) / 1000000000000.0) * 1000000) AS BIGINT)
         AS gmean_x1e6
FROM events WHERE value > 0
GROUP BY event_type
""",
)
def q_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type geometric mean via the log-space identity exp(avg(ln x)) —
    entirely native (partial→final agg, whole-stage codegen). Each ln is
    floor-scaled to an int64 BEFORE summing, so the aggregation is exact
    in any partial/merge order (a raw double avg drifts in the last ulp
    with summation order and can flip the output floor across engines);
    the closing exp/divisions are fixed-order scalar ops. The same
    statistic as a pandas GROUPED_AGG UDAF is pytest-asserted equal
    (tests/test_features.py) — that path covers the custom-aggregate API
    surface; this native path is the production one."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    lnq = F.floor(F.log("value") * 1_000_000_000_000).cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.floor(
            F.exp(F.sum(lnq) / F.count("*") / F.lit(1_000_000_000_000.0))
            * 1_000_000
        )
        .cast("long")
        .alias("gmean_x1e6"),
    )


def _lang_confusion_oracle() -> str:
    from videos_to_tfrecords_spark.operators.text import LANG_MARKERS

    def occ(m: str) -> str:
        return f"(length(p) - length(replace(p, '{m}', ''))) // {len(m)}"

    score_exprs = {
        lang: " + ".join(occ(m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{later}" for later in langs[i + 1:]
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    scores_sel = ", ".join(
        f"CAST({e} AS BIGINT) AS s_{lang}" for lang, e in score_exprs.items()
    )
    return f"""
WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
s AS (SELECT doc_id, lang, {scores_sel} FROM p),
pred AS (SELECT doc_id, lang, {case} AS lang_pred FROM s)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2
"""


@query("lang_id_confusion", _lang_confusion_oracle())
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language identifier against the
    table's declared language — the accuracy audit every lang-filter stage
    needs before it gates a corpus (systematic confusions show up as
    off-diagonal mass). One scan + a tiny two-key aggregate."""
    from videos_to_tfrecords_spark.operators.text import with_lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        with_lang_id(docs)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


@query(
    "doc_duplicate_spans",
    """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              unnest(CASE WHEN len(t) >= 8 THEN
                list_transform(generate_series(1, len(t) - 7),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                       || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                       || ' ' || t[i+7])
                ELSE [] END) AS s
       FROM tok),
multi AS (SELECT s FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
per AS (SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN m.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_positions
        FROM sh LEFT JOIN multi m USING (s)
        GROUP BY doc_id)
SELECT doc_id, n_shingles, n_dup_positions,
       CAST(floor(1000 * n_dup_positions / n_shingles) AS BIGINT) AS dup_frac_x1000
FROM per WHERE n_shingles > 0
""",
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication profile: the fraction of each document's
    8-token windows that also occur in ANOTHER document — the per-document
    statistic behind exact-substring dedup policies (any ≥8-token repeated
    span necessarily contains a repeated 8-shingle, so this is a complete
    detector at that granularity). Inverted-index shape: the shuffle is the
    (shingle → distinct-doc count) aggregate and the join back, both ∝
    corpus shingles; no pairwise comparison anywhere."""
    from videos_to_tfrecords_spark.functions.textfn import exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = exploded_shingles(docs, ["doc_id"], "text", 8).withColumnRenamed(
        "shingle", "s"
    )
    multi = (
        sh.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("s", F.lit(1).alias("_m"))
    )
    per = (
        sh.join(multi, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0)).alias(
                "n_dup_positions"
            ),
        )
    )
    return per.filter(F.col("n_shingles") > 0).select(
        "doc_id",
        "n_shingles",
        "n_dup_positions",
        F.floor(1000 * F.col("n_dup_positions") / F.col("n_shingles"))
        .cast("long")
        .alias("dup_frac_x1000"),
    )


def _bpe_chain_sql(n_merges: int) -> str:
    """Shared unrolled BPE iteration chain (CTE text, no final SELECT):
    one (pairs → best → apply) block per merge, mirroring
    operators/text._bpe_loop exactly (3-pass single-scan replace;
    count DESC, pair ASC argmax). Every CTE MATERIALIZED: the b_k/v_k
    chain is referenced multiple times per iteration and DuckDB's default
    inlining re-expands the whole lineage (exponential scans of the base
    table — runs out of file handles by iteration ~6)."""
    parts = [
        """WITH wt AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
v0 AS MATERIALIZED (
  SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seq,
         CAST(count(*) AS BIGINT) AS freq
  FROM wt WHERE w != '' GROUP BY 1)"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"v{k-1}"
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT t[i] || ' ' || t[i+1] AS pair, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(seq), ' ') AS t, freq FROM {prev}),
       LATERAL unnest(CASE WHEN len(t) >= 2 THEN generate_series(1, len(t) - 1)
                      ELSE [] END) AS u(i)
  GROUP BY 1)"""
        )
        parts.append(
            f"b{k} AS MATERIALIZED (SELECT pair, cnt, replace(pair, ' ', '') AS merged "
            f"FROM p{k} ORDER BY cnt DESC, pair LIMIT 1)"
        )
        rep = "seq"
        for _ in range(3):
            rep = (
                f"replace({rep}, ' ' || b.pair || ' ', ' ' || b.merged || ' ')"
            )
        parts.append(
            f"v{k} AS MATERIALIZED (SELECT w, {rep} AS seq, freq FROM {prev}, b{k} b)"
        )
    return ",\n".join(parts)


def _bpe_oracle_sql(n_merges: int = 8) -> str:
    sel = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, pair, merged, cnt FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return _bpe_chain_sql(n_merges) + "\n" + sel


def _bpe_encode_oracle_sql(n_merges: int = 8) -> str:
    return (
        _bpe_chain_sql(n_merges)
        + f""",
seg AS MATERIALIZED (
  SELECT w, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_sub,
         CAST(length(w) AS BIGINT) AS n_chars_w
  FROM v{n_merges})
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens,
       CAST((1000 * sum(n_sub)) // nullif(sum(n_chars_w), 0) AS BIGINT)
         AS compression_x1000
FROM wt JOIN seg USING (w)
GROUP BY doc_id"""
    )


@query("bpe_train_merges", _bpe_oracle_sql(8))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE tokenizer merges learned from the corpus
    (operators/text.bpe_train_merges): one corpus pass builds the word
    vocabulary, then every iteration is vocab-sized — distributed pair
    counts, a deterministic driver-scalar argmax, and a literal-replace
    merge application whose single-scan semantics are identical in Spark,
    DuckDB and Python, so the whole training TRAJECTORY hash-matches the
    unrolled SQL oracle."""
    from videos_to_tfrecords_spark.operators.text import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, n_merges=8)


@query("bpe_token_counts", _bpe_encode_oracle_sql(8))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING: apply the 8 learned merges to every document and
    count subword tokens + chars-per-token compression. Segmentation is
    computed once per DISTINCT word and joined back to the corpus token
    stream (operators/text.bpe_token_counts) — tokenizer application as a
    dictionary join, the shape that scales."""
    from videos_to_tfrecords_spark.operators.text import bpe_token_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_counts(docs, n_merges=8)


@query(
    "doc_unigram_entropy",
    """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
a AS (SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * CAST(floor(1000000000 * ln(CAST(c AS DOUBLE)))
                               AS BIGINT)) AS BIGINT) AS s
      FROM c GROUP BY 1)
SELECT doc_id, n AS n_tokens,
       CAST((n * CAST(floor(1000000000 * ln(CAST(n AS DOUBLE))) AS BIGINT) - s)
            // (n * 1000) AS BIGINT) AS entropy_x1e6
FROM a
""",
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram (Shannon) entropy in nats — the
    information-density quality signal (templated/looping text scores low,
    natural text high; complements the repetition-signal family).

    Algebraic single-pass form: H = ln n − (1/n)·Σ c·ln c, so the
    per-token contribution c·floor(1e9·ln c) needs only LOCAL values —
    no join of the token-count table back against a per-doc total (the
    earlier c⋈n formulation consumed both tables twice, re-running the
    explode per plan branch: 12 aggregates → 2, and 0.7 s → 0.4 s at
    sf0.1). Each term is floor-quantized to int64 BEFORE summing, so the
    aggregate is exact under any partial/merge order; the normalization
    n·q(ln n) − s is exact integer arithmetic. Two keyed aggregates,
    shuffle ∝ distinct (doc, token) pairs, second keyed on doc only."""
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    a = c.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("c")
            * F.floor(F.lit(1_000_000_000) * F.log(F.col("c").cast("double"))).cast(
                "long"
            )
        ).alias("s"),
    )
    qn = F.floor(F.lit(1_000_000_000) * F.log(F.col("n").cast("double"))).cast("long")
    return a.withColumn("qn", qn).select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.expr("(n * qn - s) div (n * 1000)").alias("entropy_x1e6"),
    )


@query(
    "nation_supplier_hhi",
    """
WITH rev AS (SELECT s.s_nationkey AS nationkey, l.l_suppkey,
                    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                         AS BIGINT) AS rev_cents
             FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             GROUP BY 1, 2),
revd AS (SELECT nationkey, rev_cents, rev_cents // 10000 AS rev_d FROM rev),
agg AS (SELECT nationkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(rev_cents) AS BIGINT) AS total_cents,
               CAST(sum(rev_d) AS HUGEINT) AS total_d,
               sum(CAST(rev_d AS HUGEINT) * rev_d) AS sumsq
        FROM revd GROUP BY 1)
SELECT n.n_name,
       n_suppliers,
       total_cents,
       CAST((1000000 * sumsq) // (total_d * total_d) AS BIGINT) AS hhi_x1e6
FROM agg JOIN nation n ON n.n_nationkey = agg.nationkey
""",
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation —
    Σ(share²) of each supplier's revenue within its nation, the
    market-structure analytic. Per-supplier revenue is summed in exact
    integer cents; the squared terms are computed on floor-scaled whole
    100-dollar units so Σrev² stays far inside int64 at any SF (cents²
    overflows; at yet larger SFs the unit scales with the data — shares
    are ratio statistics, so the unit only sets quantization),
    and integer sums are order-independent, so both engines agree exactly.
    The closing ×1e6 ratio is an EXACT two-step integer long division
    (1e6·Σrev² exceeds int64, so split 1e6 = 1000·1000 and carry the
    remainder) — no doubles anywhere: a single-supplier nation sits
    exactly on the 1.0 boundary, where one ulp of double rounding flipped
    the floor between engines. Plan: broadcast dim joins, two keyed
    aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
        .withColumn("rev_d", F.expr("rev_cents div 10000"))
    )
    # DECIMAL(38,0) for sumsq and the closing ratio: total_d² passed int64
    # at sf1 (the acf overflow class). Spark's `div` on decimals is exact
    # integral division returning LONG, so the old 1000-split remainder
    # dance collapses to one step; DuckDB mirrors in HUGEINT.
    agg = rev.groupBy("nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("rev_cents").alias("total_cents"),
        F.sum("rev_d").cast("decimal(38,0)").alias("total_d"),
        F.sum(
            F.col("rev_d").cast("decimal(38,0)") * F.col("rev_d").cast("decimal(38,0)")
        ).alias("sumsq"),
    )
    return agg.join(
        F.broadcast(nat), nat.n_nationkey == agg.nationkey
    ).select(
        "n_name",
        "n_suppliers",
        "total_cents",
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * sumsq) div (total_d * total_d)"
        ).alias("hhi_x1e6"),
    )


@query(
    "referential_integrity_audit",
    """
SELECT 'lineitem.orderkey' AS fk,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'lineitem.partkey',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
UNION ALL
SELECT 'orders.custkey',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
""",
)
def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the ingest-time
    data-quality gate (a broken upstream export shows up here before it
    poisons joins). Each check is a LEFT ANTI join counted; the dimension
    side broadcasts, so the audit costs one scan per fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")

    def check(fact, dim, fk, fact_key, dim_key):
        orphans = fact.join(
            F.broadcast(dim), fact[fact_key] == dim[dim_key], "left_anti"
        )
        return (
            fact.agg(F.count("*").alias("n_rows"))
            .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
            .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
        )

    return (
        check(li, orders, "lineitem.orderkey", "l_orderkey", "o_orderkey")
        .unionAll(check(li, part, "lineitem.partkey", "l_partkey", "p_partkey"))
        .unionAll(check(orders, cust, "orders.custkey", "o_custkey", "c_custkey"))
    )


@query(
    "customer_rfm_segments",
    """
WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
base AS (SELECT o_custkey AS custkey,
                CAST((epoch_us((SELECT mx FROM mx)) - epoch_us(max(o_orderdate)))
                     // 86400000000 AS BIGINT) AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS monetary_cents
         FROM orders GROUP BY 1)
SELECT custkey, recency_days, frequency, monetary_cents,
       CAST(ntile(4) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_quartile,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_quartile,
       CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, custkey) AS BIGINT)
         AS m_quartile
FROM base
""",
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    canonical behavioral feature-store derivation. One keyed aggregate
    over orders, then exact quartile ranks on the customer-sized result.
    Each quartile is a distributed ntile (range-partition + partitioned
    rank + bounded offset table, `operators.ordered.global_ntile`) — no
    corpus-proportional unpartitioned WindowExec anywhere in the plan;
    tie-broken by custkey for a total cross-engine order. Recency is
    exact integer days against the corpus max date (a 1-row broadcast
    scalar)."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("mx"))
    base = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            F.expr(
                "(unix_micros(mx) - unix_micros(last_order)) div 86400000000"
            ).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        .localCheckpoint(eager=True)
    )
    from videos_to_tfrecords_spark.operators.ordered import global_ntile

    r_q = global_ntile(
        base, [F.col("recency_days"), F.col("custkey")], 4, "r_quartile"
    ).select("custkey", "r_quartile")
    f_q = global_ntile(
        base, [F.desc("frequency"), F.col("custkey")], 4, "f_quartile"
    ).select("custkey", "f_quartile")
    m_q = global_ntile(
        base, [F.desc("monetary_cents"), F.col("custkey")], 4, "m_quartile"
    ).select("custkey", "m_quartile")
    return (
        base.join(r_q, "custkey")
        .join(f_q, "custkey")
        .join(m_q, "custkey")
        .select(
            "custkey",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r_quartile",
            "f_quartile",
            "m_quartile",
        )
    )


@query(
    "order_cohort_retention",
    """
WITH om AS (SELECT o_custkey AS custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
                     AS ym
            FROM orders),
cohort AS (SELECT custkey, min(ym) AS cohort_ym FROM om GROUP BY 1),
act AS (SELECT DISTINCT o.custkey, c.cohort_ym, o.ym - c.cohort_ym AS age_months
        FROM om o JOIN cohort c ON o.custkey = c.custkey)
SELECT cohort_ym, CAST(age_months AS BIGINT) AS age_months,
       CAST(count(*) AS BIGINT) AS n_active
FROM act GROUP BY 1, 2
""",
)
def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention matrix: customers grouped by first-order
    month, counted as active at each month offset — the canonical
    retention analytic. Months are exact integers (year·12+month), the
    cohort table is customer-sized and joins back on the customer key
    (same hash partitioning as the per-customer min — AQE reuses the
    exchange), and the final matrix is cohorts × ages, metadata-sized."""
    orders = load_table(spark, sf_dir, "orders")
    om = orders.select(
        F.col("o_custkey").alias("custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("ym"),
    )
    cohort = om.groupBy("custkey").agg(F.min("ym").alias("cohort_ym"))
    act = (
        om.join(cohort, "custkey")
        .select(
            "custkey", "cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("age_months")
        )
        .distinct()
    )
    return act.groupBy("cohort_ym", F.col("age_months").cast("long").alias("age_months")).agg(
        F.count("*").alias("n_active")
    )


@query(
    "rolling_median_value",
    """
SELECT event_id, user_id,
       CAST(l[(len(l) + 1) // 2] AS BIGINT) AS med_cents
FROM (
  SELECT event_id, user_id,
         list_sort(list(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
  FROM events)
""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling LOWER median (exact, 7-row trailing window) of
    spend — the robust analog of a moving average for burst-noise series.
    Exactness strategy: integer cents + lower-median (element at position
    (n+1) div 2 of the sorted window) so there is no interpolation float;
    the window is a same-key analytic (one user_id shuffle), the per-row
    sort touches ≤7 elements in-task. At 100 TB this is the standard
    windowed robust-smoothing pass: state is bounded by the frame, not
    the series."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sort_array(
            F.collect_list(F.round(F.col("value") * 100).cast("long")).over(w)
        ).alias("l"),
    ).select(
        "event_id",
        "user_id",
        F.expr("CAST(l[(size(l) + 1) div 2 - 1] AS BIGINT)").alias("med_cents"),
    )


@query(
    "acf_user_value",
    """
WITH s AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS y,
         lead(CAST(round(value * 100) AS BIGINT), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l1,
         lead(CAST(round(value * 100) AS BIGINT), 2)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l2,
         lead(CAST(round(value * 100) AS BIGINT), 3)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l3
  FROM events),
st AS (
  SELECT k.lag,
         CAST(count(CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END) AS BIGINT) AS n,
         CAST(sum(CASE WHEN (CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END) IS NOT NULL THEN y END) AS BIGINT) AS sx,
         CAST(sum(CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END) AS BIGINT) AS sy,
         CAST(sum(y * (CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END)) AS BIGINT) AS sxy,
         CAST(sum(CASE WHEN (CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END) IS NOT NULL THEN y * y END) AS BIGINT) AS sxx,
         CAST(sum((CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END) * (CASE k.lag WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END)) AS BIGINT) AS syy
  FROM s CROSS JOIN (SELECT unnest([1, 2, 3]) AS lag) k
  GROUP BY k.lag),
w128 AS (
  SELECT lag, n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx,
         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
  FROM st)
SELECT CAST(lag AS BIGINT) AS lag, n,
       CAST(floor(1000000.0 * CAST(num AS DOUBLE) /
            sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))) AS BIGINT) AS acf_x1e6
FROM w128 WHERE dx > 0 AND dy > 0
""",
)
def q_acf_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide lag-1..3 autocorrelation of per-user spend series from
    exact integer sufficient statistics (the user_value_trend technique
    extended to pairs): one per-user window computes the three leads, one
    global aggregate the 3×6 stats; the only float ops are the closing
    Pearson ratio with IDENTICAL expression order in both engines. The
    lag×row expansion runs in-task (Expand, no extra shuffle)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    y = F.round(F.col("value") * 100).cast("long")
    s = ev.select(
        y.alias("y"),
        F.lead(y, 1).over(w).alias("l1"),
        F.lead(y, 2).over(w).alias("l2"),
        F.lead(y, 3).over(w).alias("l3"),
    )
    lagged = s.select(
        "y",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("lag"), F.col("l1").alias("yl")),
                F.struct(F.lit(2).alias("lag"), F.col("l2").alias("yl")),
                F.struct(F.lit(3).alias("lag"), F.col("l3").alias("yl")),
            )
        ).alias("p")
    ).select("y", "p.lag", "p.yl")
    st = lagged.groupBy("lag").agg(
        F.count("yl").alias("n"),
        F.sum(F.when(F.col("yl").isNotNull(), F.col("y"))).alias("sx"),
        F.sum("yl").alias("sy"),
        F.sum(F.col("y") * F.col("yl")).alias("sxy"),
        F.sum(F.when(F.col("yl").isNotNull(), F.col("y") * F.col("y"))).alias("sxx"),
        F.sum(F.col("yl") * F.col("yl")).alias("syy"),
    )
    # the closing Pearson products square corpus-sized sums — sx² passed
    # int64 range at sf1 (ANSI overflow, the first full-suite sf1 run's
    # only arithmetic casualty). DECIMAL(38,0) keeps them EXACT to 1e38
    # (room for ~1e12 rows of cent-scale values); DuckDB mirrors with
    # HUGEINT. Both cast the exact integer to double at the same point,
    # so the quotient stays bit-identical cross-engine.
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dx = d38(F.col("n")) * d38(F.col("sxx")) - d38(F.col("sx")) * d38(F.col("sx"))
    dy = d38(F.col("n")) * d38(F.col("syy")) - d38(F.col("sy")) * d38(F.col("sy"))
    num = d38(F.col("n")) * d38(F.col("sxy")) - d38(F.col("sx")) * d38(F.col("sy"))
    return (
        st.filter((dx > 0) & (dy > 0))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").cast("long").alias("n"),
            F.floor(
                F.lit(1000000.0) * num.cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double"))
            ).cast("long").alias("acf_x1e6"),
        )
    )


DRIFT_ORACLE_SQL = """
WITH half AS (
  SELECT CAST(least(greatest(CAST(round(value * 100) AS BIGINT) // 1000, 0), 9)
         AS BIGINT) AS bin,
         CASE WHEN epoch_us(ts) * 2 <
                   (SELECT min(epoch_us(ts)) + max(epoch_us(ts)) FROM events)
              THEN 0 ELSE 1 END AS h
  FROM events),
o AS (SELECT bin,
             CAST(count(*) FILTER (WHERE h = 0) AS BIGINT) AS o1,
             CAST(count(*) FILTER (WHERE h = 1) AS BIGINT) AS o2
      FROM half GROUP BY bin),
n AS (SELECT CAST(sum(o1) AS BIGINT) AS n1, CAST(sum(o2) AS BIGINT) AS n2 FROM o)
SELECT bin, o1, o2,
       CAST(floor(1000000.0 * (
         CASE WHEN o1 + o2 = 0 THEN 0.0 ELSE
           (CAST(o1 AS DOUBLE) - CAST((o1 + o2) * n1 AS DOUBLE) / (n1 + n2))
           * (CAST(o1 AS DOUBLE) - CAST((o1 + o2) * n1 AS DOUBLE) / (n1 + n2))
           / (CAST((o1 + o2) * n1 AS DOUBLE) / (n1 + n2))
           + (CAST(o2 AS DOUBLE) - CAST((o1 + o2) * n2 AS DOUBLE) / (n1 + n2))
           * (CAST(o2 AS DOUBLE) - CAST((o1 + o2) * n2 AS DOUBLE) / (n1 + n2))
           / (CAST((o1 + o2) * n2 AS DOUBLE) / (n1 + n2))
         END)) AS BIGINT) AS chi_x1e6
FROM o, n
"""


@query("value_drift_chisq", DRIFT_ORACLE_SQL)
def q_value_drift_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: split the event stream at its temporal
    midpoint, histogram spend into 10 fixed bins, and report each bin's
    two-sample chi-square contribution — the training-data drift check run
    before mixing a new crawl snapshot into a corpus. Counts are exact
    integers (one scan, one tiny agg); the statistic is a fixed-order
    double expression over those integers, floor-scaled, so both engines
    produce identical bits. The temporal midpoint is two scalar aggregates
    (min/max), broadcast — no per-row subquery."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))).alias("mm")
    )
    half = ev.crossJoin(F.broadcast(mm)).select(
        F.expr(
            "CAST(least(greatest(CAST(round(value * 100) AS BIGINT) div 1000, 0), 9)"
            " AS BIGINT)"
        ).alias("bin"),
        F.when(F.unix_micros("ts") * 2 < F.col("mm"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("h"),
    )
    o = half.groupBy("bin").agg(
        F.count(F.when(F.col("h") == 0, 1)).alias("o1"),
        F.count(F.when(F.col("h") == 1, 1)).alias("o2"),
    ).localCheckpoint(eager=True)  # 10 rows; feeds both n and the output
    n = o.agg(F.sum("o1").alias("n1"), F.sum("o2").alias("n2"))
    tot = (F.col("o1") + F.col("o2")).cast("double")
    nn = (F.col("n1") + F.col("n2"))
    e1 = ((F.col("o1") + F.col("o2")) * F.col("n1")).cast("double") / nn
    e2 = ((F.col("o1") + F.col("o2")) * F.col("n2")).cast("double") / nn
    chi = F.when(
        (F.col("o1") + F.col("o2")) == 0, F.lit(0.0)
    ).otherwise(
        (F.col("o1").cast("double") - e1) * (F.col("o1").cast("double") - e1) / e1
        + (F.col("o2").cast("double") - e2) * (F.col("o2").cast("double") - e2) / e2
    )
    return o.crossJoin(F.broadcast(n)).select(
        "bin",
        F.col("o1").cast("long").alias("o1"),
        F.col("o2").cast("long").alias("o2"),
        F.floor(F.lit(1000000.0) * chi).cast("long").alias("chi_x1e6"),
    )


@query(
    "seasonal_dow_anomaly",
    """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
daily AS (
  SELECT day, CAST((day + 4) % 7 AS BIGINT) AS dow,
         CAST(sum(cents) AS BIGINT) AS day_cents
  FROM d GROUP BY day),
base AS (
  SELECT dow, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(day_cents) AS HUGEINT) AS s,
         sum(CAST(day_cents AS HUGEINT) * day_cents) AS ss
  FROM daily GROUP BY dow)
SELECT CAST(daily.day AS BIGINT) AS day, daily.dow, day_cents,
       CAST(floor(1000.0 * CAST(n * day_cents - s AS DOUBLE) /
            sqrt(CAST(n AS DOUBLE) * CAST(n * ss - s * s AS DOUBLE)))
         AS BIGINT) AS z_x1000
FROM daily JOIN base ON base.dow = daily.dow
WHERE n * ss - s * s > 0
""",
)
def q_seasonal_dow_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly scores: each calendar day's total spend is
    z-scored against its OWN day-of-week's distribution (Mondays against
    Mondays), catching e.g. a quiet Saturday that a global z-score would
    call normal. Day-of-week is pure integer arithmetic ((epoch_day+4)%7,
    portable — engines disagree on dayofweek()); sufficient statistics
    are exact integer sums; the closing z is one fixed-order double
    expression (z = (n·x−s)/√(n·(n·ss−s²)) — the ÷n-cancelled form that
    needs no intermediate division)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = d.groupBy("day").agg(F.sum("cents").alias("day_cents")).select(
        "day", F.expr("CAST((day + 4) % 7 AS BIGINT)").alias("dow"), "day_cents"
    ).localCheckpoint(eager=True)  # one row per calendar day; 2 consumers
    # day_cents is a whole calendar day's spend — its square and the
    # closing n·ss − s² products pass int64 well before 100 TB (the acf
    # lesson): keep them exact in DECIMAL(38,0), oracle in HUGEINT, with
    # the double cast at the identical point
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = daily.groupBy("dow").agg(
        F.count("*").alias("n"),
        F.sum("day_cents").alias("s"),
        F.sum(d38(F.col("day_cents")) * d38(F.col("day_cents"))).alias("ss"),
    )
    num = d38(F.col("n")) * d38(F.col("day_cents")) - d38(F.col("s"))
    var = d38(F.col("n")) * F.col("ss") - d38(F.col("s")) * d38(F.col("s"))
    return (
        daily.join(F.broadcast(base), "dow")
        .filter(var > 0)
        .select(
            F.col("day").cast("long").alias("day"),
            "dow",
            "day_cents",
            F.floor(
                F.lit(1000.0)
                * num.cast("double")
                / F.sqrt(F.col("n").cast("double") * var.cast("double"))
            ).cast("long").alias("z_x1000"),
        )
    )


@query(
    "value_drift_psi",
    """
WITH mm AS (SELECT CAST(min(epoch_us(ts)) + max(epoch_us(ts)) AS BIGINT) AS mm
            FROM events),
b AS (SELECT LEAST(GREATEST(CAST(round(value * 100) AS BIGINT) // 1000, 0), 9)
               AS bin,
             CASE WHEN 2 * epoch_us(ts) < (SELECT mm FROM mm)
                  THEN 0 ELSE 1 END AS h
      FROM events),
c AS (SELECT bin, CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bq
      FROM b GROUP BY 1),
t AS (SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(bq) AS BIGINT) AS n2 FROM c),
q AS (SELECT bin, a, bq,
             CAST(floor(1000000 * ln(a)) AS BIGINT)
             + CAST(floor(1000000 * ln((SELECT n2 FROM t))) AS BIGINT)
             - CAST(floor(1000000 * ln(bq)) AS BIGINT)
             - CAST(floor(1000000 * ln((SELECT n1 FROM t))) AS BIGINT) AS lq
      FROM c WHERE a > 0 AND bq > 0)
SELECT bin, a AS n_ref, bq AS n_cur, lq AS log_ratio_x1e6,
       CAST((CAST(a AS HUGEINT) * (SELECT n2 FROM t)
             - CAST(bq AS HUGEINT) * (SELECT n1 FROM t)) * lq
            // (CAST((SELECT n1 FROM t) AS HUGEINT) * (SELECT n2 FROM t))
            AS BIGINT) AS psi_term_x1e6
FROM q
""",
)
def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor — the credit-risk-industry
    standard next to the chi-square and EMD twins (value_drift_chisq /
    _emd): per bin, (p−q)·ln(p/q) with the log-ratio decomposed into
    quantized-lns of INTEGER counts (ln a + ln n2 − ln b − ln n1) and the
    (p−q) factor kept as the exact HUGEINT cross-product
    (a·n2 − b·n1)/(n1·n2) — every term is bit-identical cross-engine;
    Σ psi_term > 0.25·1e6 is the conventional alarm. Bins with a zero
    side are excluded (PSI is undefined there; the chisq twin covers
    them).

    Scale shape: one scan, 10-bin × 2-half partial→final aggregate,
    1-row broadcast midpoint — constant state in stream volume (the
    drift-histogram argument)."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
        .cast("long")
        .alias("mm")
    )
    b = ev.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.greatest(
                F.expr("CAST(round(value * 100) AS BIGINT) div 1000"), F.lit(0)
            ),
            F.lit(9),
        ).alias("bin"),
        F.when(2 * F.unix_micros("ts") < F.col("mm"), 0).otherwise(1).alias("h"),
    )
    c = b.groupBy("bin").agg(
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).cast("long").alias("bq"),
    )
    t = c.agg(
        F.sum("a").cast("long").alias("n1"), F.sum("bq").cast("long").alias("n2")
    )
    lnq = lambda col: F.floor(F.lit(1000000) * F.log(col)).cast("long")  # noqa: E731
    q = (
        c.crossJoin(F.broadcast(t))
        .filter((F.col("a") > 0) & (F.col("bq") > 0))
        .withColumn(
            "lq",
            lnq(F.col("a")) + lnq(F.col("n2")) - lnq(F.col("bq")) - lnq(F.col("n1")),
        )
    )
    return q.select(
        "bin",
        F.col("a").alias("n_ref"),
        F.col("bq").alias("n_cur"),
        F.col("lq").alias("log_ratio_x1e6"),
        F.expr(
            "CAST((CAST(a AS DECIMAL(38,0)) * n2 - CAST(bq AS DECIMAL(38,0)) * n1)"
            " * lq div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
        ).alias("psi_term_x1e6"),
    )


@query(
    "traffic_profile_dow_hour",
    """
WITH e AS (SELECT (epoch_ns(ts)//1000) AS ts_us FROM events),
c AS (SELECT CAST(((ts_us // 86400000000) + 4) % 7 AS BIGINT) AS dow,
             CAST((ts_us % 86400000000) // 3600000000 AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
mx AS (SELECT CAST(max(n) AS BIGINT) AS m FROM c)
SELECT dow, hour, n,
       CAST((1000000 * n) // (SELECT t FROM tot) AS BIGINT) AS share_ppm,
       n = (SELECT m FROM mx) AS is_peak
FROM c
""",
)
def q_traffic_profile_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour traffic profile of the event stream (the capacity /
    batch-scheduling heatmap: when do users actually arrive, and which
    cell is the global peak). Day-of-week comes from the portable
    integer epoch-day formula ((day+4) % 7 — the seasonal_dow convention;
    epoch day 0 was a Thursday), hour from µs-of-day — no locale or
    calendar library on either engine. One census shuffle over the fixed
    168-cell domain; totals and peak are metadata rows."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(F.unix_micros("ts").alias("ts_us"))
    c = e.select(
        F.expr("CAST(((ts_us div 86400000000) + 4) % 7 AS BIGINT)").alias("dow"),
        F.expr("CAST((ts_us % 86400000000) div 3600000000 AS BIGINT)").alias(
            "hour"
        ),
    ).groupBy("dow", "hour").agg(F.count("*").cast("long").alias("n"))
    tot = c.agg(F.sum("n").cast("long").alias("t"))
    mx = c.agg(F.max("n").cast("long").alias("m"))
    return (
        c.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mx))
        .select(
            "dow",
            "hour",
            "n",
            F.expr("CAST((1000000 * n) div t AS BIGINT)").alias("share_ppm"),
            (F.col("n") == F.col("m")).alias("is_peak"),
        )
    )


@query(
    "value_drift_psi_weekly",
    """
WITH e AS (SELECT ((epoch_ns(ts) // 1000) // 86400000000) // 7 AS week,
                  LEAST(GREATEST(CAST(round(value * 100) AS BIGINT) // 1000,
                                 0), 9) AS bin
           FROM events),
w0 AS (SELECT min(week) AS w0 FROM e),
c AS (SELECT week, bin, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
tot AS (SELECT week, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
ref AS (SELECT c.bin, c.n AS r, t.nt AS nr
        FROM c JOIN tot t USING (week) WHERE c.week = (SELECT w0 FROM w0)),
cur AS (SELECT c.week, c.bin, c.n AS cc, t.nt AS nc
        FROM c JOIN tot t USING (week) WHERE c.week != (SELECT w0 FROM w0)),
q AS (SELECT cur.week, cur.bin, cur.cc, cur.nc, ref.r, ref.nr,
             CAST(floor(1000000 * ln(cur.cc)) AS BIGINT)
             + CAST(floor(1000000 * ln(ref.nr)) AS BIGINT)
             - CAST(floor(1000000 * ln(ref.r)) AS BIGINT)
             - CAST(floor(1000000 * ln(cur.nc)) AS BIGINT) AS lq
      FROM cur JOIN ref USING (bin)
      WHERE cur.cc > 0 AND ref.r > 0)
SELECT week,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum((CAST(cc AS HUGEINT) * nr - CAST(r AS HUGEINT) * nc) * lq
                // (CAST(nr AS HUGEINT) * nc)) AS BIGINT) AS psi_x1e6
FROM q GROUP BY week
""",
)
def q_value_drift_psi_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling PSI drift monitor: every week's value histogram scored
    against the FIRST week (the deployment-time reference) — the
    time-series view of value_drift_psi that operations dashboards
    actually chart (alarm when a week's Σ psi crosses 0.25·1e6). Same
    exact-integer decomposition: quantized-ln of integer counts for the
    log-ratio, HUGEINT cross-products for (p−q), per-bin floor then sum.
    One scan + (weeks × 10 bins) aggregate — state constant in corpus
    size."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.expr("(unix_micros(ts) div 86400000000) div 7").alias("week"),
        F.least(
            F.greatest(
                F.expr("CAST(round(value * 100) AS BIGINT) div 1000"), F.lit(0)
            ),
            F.lit(9),
        ).alias("bin"),
    )
    c = e.groupBy("week", "bin").agg(F.count("*").cast("long").alias("n"))
    c = c.localCheckpoint(eager=True)  # feeds totals + ref + cur branches
    tot = c.groupBy("week").agg(F.sum("n").cast("long").alias("nt"))
    w0 = c.agg(F.min("week").alias("w0"))
    cj = c.join(tot, "week").crossJoin(F.broadcast(w0))
    ref = cj.filter(F.col("week") == F.col("w0")).select(
        "bin", F.col("n").alias("r"), F.col("nt").alias("nr")
    )
    cur = cj.filter(F.col("week") != F.col("w0")).select(
        "week", "bin", F.col("n").alias("cc"), F.col("nt").alias("nc")
    )
    lnq = lambda col: F.floor(F.lit(1000000) * F.log(col)).cast("long")  # noqa: E731
    q = (
        cur.join(F.broadcast(ref), "bin")
        .filter((F.col("cc") > 0) & (F.col("r") > 0))
        .withColumn(
            "lq",
            lnq(F.col("cc")) + lnq(F.col("nr")) - lnq(F.col("r")) - lnq(F.col("nc")),
        )
    )
    return q.groupBy("week").agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum(
            F.expr(
                "(CAST(cc AS DECIMAL(38,0)) * nr - CAST(r AS DECIMAL(38,0)) * nc)"
                " * lq div (CAST(nr AS DECIMAL(38,0)) * nc)"
            )
        )
        .cast("long")
        .alias("psi_x1e6"),
    )
