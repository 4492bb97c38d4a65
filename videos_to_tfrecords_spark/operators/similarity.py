"""Similarity search over embedding columns (SURVEY §7.1 M5).

Two paths, as a production ANN stack would tier them:
- brute-force top-k: query-set × corpus join, exact dot/cosine, ranked per
  query. The correctness baseline; at 100 TB it only works for small query
  sets with a broadcast of the queries (corpus never re-partitions).
- random-hyperplane (sign) LSH: Rademacher hyperplanes derived from the
  portable hash — sign bits bucket the corpus; candidates are same-bucket
  pairs, verified exactly. Deterministic cross-engine (no RNG state), so
  even the approximate path is oracle-checkable.

Ranking/thresholding uses the exact scaled-integer dot (functions/vector.py)
— engine-independent, no float-order ambiguity — while ``cosine`` is
exposed for production use where bit-stability across engines is not a
requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.hashing import h15
from videos_to_tfrecords_spark.functions.vector import scaled_int_dot

N_PLANES = 8


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): broadcast the query
    set against the corpus, rank by exact scaled dot with id tie-break."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("dot_scaled", scaled_int_dot("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_scaled"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "dot_scaled", "rnk")
    )


def cosine_threshold_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_scaled: int = 450_000_000_000,  # ≈ cosine 0.45 at 1e6 scaling
    id_filter_mod: int | None = None,
) -> DataFrame:
    """All (a < b) pairs above a similarity threshold — the embedding
    near-dup primitive. Optional id-mod sampling bounds the left side so the
    sampled side broadcasts."""
    base = df.select(F.col(id_col), F.col(vec_col))
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    if id_filter_mod:
        a = a.filter(F.col("id_a") % id_filter_mod == 0)
    b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot_scaled", scaled_int_dot("va", "vb"))
        .filter(F.col("dot_scaled") >= threshold_scaled)
        .select("id_a", "id_b", "dot_scaled")
    )


def hyperplane_bucket(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    out: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id: plane p's coefficient for dim j is the Rademacher
    value (±1) derived from the portable hash of "p,j" — deterministic in
    any engine, no RNG. bucket = Σ_p [v·plane_p > 0] << p.

    Scale: one narrow projection; bucketing a 100 TB corpus is
    embarrassingly parallel and the bucket column then drives a co-located
    self-join (or a repartition on bucket)."""
    vec = F.col(vec_col)

    def term(p: int):
        # rademacher sign for (plane p, dim i): ±1 from hash parity
        return lambda x, i: F.round(x.cast("double") * 1_000_000).cast("long") * (
            (h15(F.concat(F.lit(f"{p},"), i.cast("string"))) % 2) * 2 - 1
        )

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        signed = F.aggregate(
            F.transform(vec, term(p)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(signed > 0, F.lit(1 << p)).otherwise(0)
    return df.withColumn(out, bucket)


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN top-k within LSH buckets: bucket → same-bucket candidate pairs →
    exact scaled-dot rank per query. Recall vs brute force is property-
    tested (tests/test_similarity.py); misses happen only across bucket
    boundaries, mitigated in production by multi-probe or more tables."""
    bucketed = hyperplane_bucket(df, id_col, vec_col, n_planes)
    a = bucketed.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("bucket")
    )
    b = bucketed.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), F.col("bucket")
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("dot_scaled", scaled_int_dot("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_scaled"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "dot_scaled", "rnk")
    )
