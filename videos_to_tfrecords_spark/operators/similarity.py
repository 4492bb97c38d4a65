"""Similarity search over embedding columns (SURVEY §7.1 M5).

Two paths, as a production ANN stack would tier them:
- brute-force top-k: query-set × corpus join, exact dot, ranked per query.
  The correctness baseline; at 100 TB it only works for small query sets
  with the query side broadcast (the corpus never re-partitions).
- random-hyperplane (sign) LSH: Rademacher hyperplanes derived from the
  portable hash — sign bits bucket the corpus; candidates are same-bucket
  pairs, verified exactly. Deterministic cross-engine (no RNG state), so
  even the approximate path is oracle-checkable.

Numeric contract: similarity = Σ round(aᵢ·1e6)·round(bᵢ·1e6) in int64 —
exact, engine-independent (rounding is half-away-from-zero in Spark,
DuckDB, and the numpy kernels here). The vector math runs in Arrow-batched
numpy (int64 matmul), which measured ~10-50× faster than interpreted
Catalyst higher-order lambdas for 64-d vectors; the declarative twin stays
in functions/vector.py for expression contexts.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
_SCALE = 1_000_000


def _to_int_matrix(series: pd.Series) -> np.ndarray:
    """Stack an Arrow array column into an exact int64 matrix with
    half-away-from-zero rounding (matches Spark's and DuckDB's round())."""
    m = np.stack(series.to_numpy()).astype(np.float64) * _SCALE
    return (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)


def _pair_dot():
    # built lazily: pandas_udf needs an active SparkSession to resolve types
    @F.pandas_udf("long")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ai, bi = _to_int_matrix(a), _to_int_matrix(b)
        return pd.Series(np.einsum("ij,ij->i", ai, bi))

    return pair_dot


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): broadcast the query
    set against the corpus, vectorized exact dots, rank with id tie-break.
    One shuffle total (the rank's partitionBy on query_id)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("dot_scaled", _pair_dot()("qv", "cv"))
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
    sampled side broadcasts; the threshold predicate runs inside the
    vectorized scorer's task, so only matches survive to the output."""
    base = df.select(F.col(id_col), F.col(vec_col))
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    if id_filter_mod:
        a = a.filter(F.col("id_a") % id_filter_mod == 0)
    b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot_scaled", _pair_dot()("va", "vb"))
        .filter(F.col("dot_scaled") >= threshold_scaled)
        .select("id_a", "id_b", "dot_scaled")
    )


def _plane_matrix(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic Rademacher hyperplanes: sign for (plane p, dim i) is
    the parity of the portable md5-prefix hash of "p,i" — identical to the
    SQL oracle's h15-based computation."""
    m = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for i in range(dim):
            h = int(hashlib.md5(f"{p},{i}".encode()).hexdigest()[:15], 16)
            m[p, i] = 1 if h % 2 == 1 else -1
    return m


def hyperplane_bucket(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    out: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id: bucket = Σ_p [v·plane_p > 0] << p, computed as a
    single int64 matmul per Arrow batch. Bucketing a 100 TB corpus is one
    embarrassingly-parallel narrow pass; the bucket column then drives a
    co-located self-join."""

    @F.pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        vi = _to_int_matrix(vecs)
        planes = _plane_matrix(n_planes, vi.shape[1])
        signed = vi @ planes.T  # (rows, planes), exact int64
        bits = (signed > 0).astype(np.int64)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return df.withColumn(out, bucket_of(F.col(vec_col)))


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN top-k within LSH buckets. Each vector lives in exactly one
    bucket, so a per-bucket ``applyInPandas`` computes the full local
    pairwise int64 matmul and the final per-query top-k in one grouped
    task — no cross-bucket shuffle at all. Recall vs brute force is
    property-tested (tests/test_text_similarity.py); production tightens it
    with multi-probe or multiple tables."""
    bucketed = hyperplane_bucket(df, id_col, vec_col, n_planes).select(
        "bucket", F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    )

    def topk_in_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["query_id"].to_numpy()
        vi = _to_int_matrix(pdf["v"])
        dots = vi @ vi.T  # exact int64
        out = {"query_id": [], "cand_id": [], "dot_scaled": [], "rnk": []}
        for qi in range(len(ids)):
            # rank others by (-dot, cand_id): exact tie-break on id
            cand_mask = np.arange(len(ids)) != qi
            cands = np.where(cand_mask)[0]
            if not len(cands):
                continue
            keys = sorted(
                ((-(dots[qi, c]), ids[c], c) for c in cands)
            )[:k]
            for rnk, (negdot, cid, c) in enumerate(keys, start=1):
                out["query_id"].append(ids[qi])
                out["cand_id"].append(cid)
                out["dot_scaled"].append(int(dots[qi, c]))
                out["rnk"].append(rnk)
        return pd.DataFrame(out, columns=["query_id", "cand_id", "dot_scaled", "rnk"])

    return bucketed.groupBy("bucket").applyInPandas(
        topk_in_bucket, "query_id long, cand_id long, dot_scaled long, rnk long"
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by exact scaled-integer squared distance (deterministic, tie-broken on
    centroid id). The centroid set is broadcast — the corpus never
    shuffles; at 100 TB this is one narrow pass, and the assignment column
    then partitions the corpus into probe lists."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        df.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(c))
        .withColumn("dist2", _pair_dist2()(F.col(vec_col), F.col("cv")))
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("dist2"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def _pair_dist2():
    @F.pandas_udf("long")
    def pair_dist2(a: pd.Series, b: pd.Series) -> pd.Series:
        ai, bi = _to_int_matrix(a), _to_int_matrix(b)
        d = ai - bi
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return pair_dist2


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 40,
    query_mod: int = 100,
    k: int = 3,
) -> DataFrame:
    """IVF ANN (M5 'IVF variant as the scale path'): deterministic coarse
    centroids (id-mod sample), nearest-centroid assignment, then top-k by
    exact dot WITHIN the query's probe list only. Single-probe (nprobe=1);
    production raises nprobe for recall. Fully integer-exact, so the whole
    approximate pipeline is oracle-checkable."""
    centroids = df.filter(F.col(id_col) % centroid_mod == 0)
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    q = assigned.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "centroid_id"
    )
    cand = assigned.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), "centroid_id"
    )
    scored = (
        q.join(cand, "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("dot_scaled", _pair_dot()("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_scaled"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "dot_scaled", "rnk")
    )
