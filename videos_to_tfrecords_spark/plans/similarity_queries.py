"""Similarity-search queries over `embeddings` (SURVEY §7.1 M5).

All ranking/thresholding uses the exact scaled-integer dot product
(functions/vector.py) so even the approximate LSH path is bit-reproducible
in DuckDB — the Rademacher hyperplanes are derived from the portable hash,
not an RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.hashing import h15_sql
from videos_to_tfrecords_spark.functions.vector import scaled_int_dot_sql
from videos_to_tfrecords_spark.operators.similarity import (
    N_PLANES,
    brute_force_topk,
    cosine_threshold_pairs,
    lsh_topk,
)
from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table

_DOT = scaled_int_dot_sql("a.v", "b.v")


@query(
    "ann_topk_bruteforce",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_DOT} AS dot_scaled
      FROM e a, e b WHERE a.vec_id % 25 = 0 AND b.vec_id != a.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_scaled DESC, cand_id) AS rnk FROM s)
SELECT query_id, cand_id, dot_scaled, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5
""",
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine/dot top-k (M5 baseline): broadcast query subset ×
    corpus, exact integer-scaled dot, ranked with id tie-break. The corpus
    side never shuffles — the scalable shape for small query sets."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    return brute_force_topk(queries, emb, k=5)


@query(
    "embedding_threshold_pairs",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_DOT} AS dot_scaled
      FROM e a, e b WHERE a.vec_id % 5 = 0 AND a.vec_id < b.vec_id)
SELECT id_a, id_b, dot_scaled FROM s WHERE dot_scaled >= 400000000000
""",
)
def q_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a similarity threshold (M5): the
    embedding-cosine dedup primitive (≈ cos 0.40 on unit vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_threshold_pairs(
        emb, threshold_scaled=400_000_000_000, id_filter_mod=5
    )


def _lsh_oracle(n_planes: int = N_PLANES, k: int = 3) -> str:
    # duckdb list_transform index i is 1-based; Spark transform's is 0-based
    terms = []
    for p in range(n_planes):
        plane_hash = h15_sql(f"concat('{p},', CAST(i - 1 AS VARCHAR))")
        sign = f"CASE WHEN {plane_hash} % 2 = 1 THEN 1 ELSE -1 END"
        signed = (
            f"list_sum(list_transform(v, (x, i) -> "
            f"CAST(round(x * 1000000) AS BIGINT) * ({sign})))"
        )
        terms.append(f"CASE WHEN {signed} > 0 THEN {1 << p} ELSE 0 END")
    bucket = " + ".join(terms)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bkt AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM e),
s AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_DOT} AS dot_scaled
      FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_scaled DESC, cand_id) AS rnk FROM s)
SELECT query_id, cand_id, dot_scaled, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {k}
"""


@query("ann_topk_lsh", _lsh_oracle())
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN top-k (M5 scale path): deterministic Rademacher
    hyperplanes bucket the corpus; same-bucket candidates ranked by exact
    dot. Bit-reproducible in SQL — even the approximation is oracle-checked.
    Recall vs brute force is additionally pytest-asserted."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, k=3)


@query(
    "embedding_norm_by_label",
    """
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT label,
             CAST(floor(sqrt(CAST(list_sum(list_transform(v, x ->
                  CAST(round(x * 1000000) AS BIGINT) * CAST(round(x * 1000000) AS BIGINT)))
                  AS DOUBLE))) AS BIGINT) AS norm_scaled
      FROM e)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(norm_scaled) AS BIGINT) AS sum_norm_scaled
FROM n GROUP BY label
""",
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm profile per class label: exact integer self-dot, IEEE
    sqrt (correctly rounded — engine-identical), floored."""
    from videos_to_tfrecords_spark.operators.similarity import _pair_dot

    emb = load_table(spark, sf_dir, "embeddings")
    # vectorized exact self-dot (the declarative scaled_int_dot twin is
    # interpreted per element — ~10× slower on wide arrays)
    norm_scaled = F.floor(
        F.sqrt(_pair_dot()("embedding", "embedding").cast("double"))
    ).cast("long")
    return (
        emb.withColumn("norm_scaled", norm_scaled)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("norm_scaled").alias("sum_norm_scaled"),
        )
    )


_DIST2 = (
    "CAST(list_sum(list_transform(list_zip(a.v, b.v), p -> "
    "(CAST(round(p[1] * 1000000) AS BIGINT) - CAST(round(p[2] * 1000000) AS BIGINT)) * "
    "(CAST(round(p[1] * 1000000) AS BIGINT) - CAST(round(p[2] * 1000000) AS BIGINT)))) AS BIGINT)"
)


@query(
    "ann_topk_ivf",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v FROM e WHERE vec_id % 40 = 0),
d AS (SELECT a.vec_id, b.centroid_id, {_DIST2.replace('b.v', 'b.v')} AS dist2
      FROM e a, (SELECT centroid_id, v FROM cent) b(centroid_id, v)),
asg AS (SELECT vec_id, centroid_id FROM
        (SELECT vec_id, centroid_id,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist2, centroid_id) AS rn
         FROM d) WHERE rn = 1),
q AS (SELECT asg.vec_id AS query_id, e.v AS qv, asg.centroid_id
      FROM asg JOIN e ON e.vec_id = asg.vec_id WHERE asg.vec_id % 100 = 0),
c AS (SELECT asg.vec_id AS cand_id, e.v AS cv, asg.centroid_id
      FROM asg JOIN e ON e.vec_id = asg.vec_id),
s AS (SELECT query_id, cand_id,
             CAST(list_sum(list_transform(list_zip(qv, cv), p ->
                  CAST(round(p[1] * 1000000) AS BIGINT) * CAST(round(p[2] * 1000000) AS BIGINT)))
                  AS BIGINT) AS dot_scaled
      FROM q JOIN c USING (centroid_id) WHERE query_id != cand_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_scaled DESC, cand_id) AS rnk FROM s)
SELECT query_id, cand_id, dot_scaled, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
""",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (M5): deterministic id-mod centroids → nearest-centroid
    assignment (exact integer distances) → top-k within the query's probe
    list. Single-probe; the inverted-file structure is what scales — the
    corpus partitions by centroid and only one probe list is scanned per
    query. Entirely integer-exact ⇒ the approximate path hash-matches SQL."""
    from videos_to_tfrecords_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, centroid_mod=40, query_mod=100, k=3)
