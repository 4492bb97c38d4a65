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
from videos_to_tfrecords_spark.operators.retrieval import bm25_oracle_sql, bm25_topk
from videos_to_tfrecords_spark.operators.sampling import weighted_sample_exact_k
from videos_to_tfrecords_spark.operators.similarity import (
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


@query(
    "knn_loo_accuracy",
    f"""
WITH e AS (SELECT vec_id, label, {_IV} AS v FROM embeddings),
s AS (SELECT a.vec_id AS qid, a.label AS true_label, b.label AS pred_label,
             b.vec_id AS cid, {_DOT} AS dot
      FROM e a, e b WHERE a.vec_id % 10 = 0 AND b.vec_id != a.vec_id),
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
    quality probe; exact neighbors via the broadcast brute-force kernel,
    query side hash-sampled 1-in-10 so the pair volume stays linear in the
    corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_loo_accuracy(emb, query_mod=10)


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
