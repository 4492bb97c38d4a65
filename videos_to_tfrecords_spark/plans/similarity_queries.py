"""Similarity-search queries over `embeddings` (SURVEY §7.1 M5).

All ranking/thresholding uses the exact scaled-integer dot product
(functions/vector.py) so even the approximate paths (LSH buckets, banded
candidates, kmeans-lite IVF) are bit-reproducible in DuckDB — hyperplanes
and centroid seeds are derived from the portable hash, not an RNG, and
centroid updates use engine-identical integer floor division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.hashing import h15_sql
from videos_to_tfrecords_spark.functions.vector import scaled_int_dot_sql
from videos_to_tfrecords_spark.operators.similarity import (
    N_PLANES,
    brute_force_topk,
    cosine_threshold_pairs_banded,
    lsh_topk,
    lsh_topk_multiprobe,
)
from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table

_DOT = scaled_int_dot_sql("a.v", "b.v")
# fragments over already-scaled BIGINT lists
_IV = "list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT))"


def _int_dot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> p[1] * p[2])) AS BIGINT)"
    )


def _int_dist2(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
    )


@query(
    "ann_topk_bruteforce",
    f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 80) AS m FROM embeddings),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_DOT} AS dot_scaled
      FROM e a, e b
      WHERE a.vec_id % (SELECT m FROM kq) = 0 AND b.vec_id != a.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_scaled DESC, cand_id) AS rnk FROM s)
SELECT query_id, cand_id, dot_scaled, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5
""",
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine/dot top-k (M5 baseline): bounded query subset ×
    corpus via the collected-matrix partial-top-k kernel, exact
    integer-scaled dot, ranked with id tie-break. The query set is ~80 at
    ANY corpus size via a corpus-derived modulus (a fixed 1-in-25 modulus
    made |queries| ∝ corpus and the pair volume quadratic — 57× at 10×
    rows in the sf1 suite); the corpus side never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    mod = max(1, int(emb.count()) // 80)
    queries = emb.filter(F.col("vec_id") % mod == 0)
    return brute_force_topk(queries, emb, k=5)


def _bucket_sql(n_planes: int, vec: str = "v") -> str:
    """Sign-LSH bucket expression over a DOUBLE[] column — the SQL twin of
    operators.similarity.hyperplane_bucket (same h15-parity planes)."""
    # duckdb list_transform index i is 1-based; Spark transform's is 0-based
    terms = []
    for p in range(n_planes):
        plane_hash = h15_sql(f"concat('{p},', CAST(i - 1 AS VARCHAR))")
        sign = f"CASE WHEN {plane_hash} % 2 = 1 THEN 1 ELSE -1 END"
        signed = (
            f"list_sum(list_transform({vec}, (x, i) -> "
            f"CAST(round(x * 1000000) AS BIGINT) * ({sign})))"
        )
        terms.append(f"CASE WHEN {signed} > 0 THEN {1 << p} ELSE 0 END")
    return " + ".join(terms)


_AUTO_MAX_PLANES = 20  # supports corpora to 128·2^20 ≈ 134M rows


def _auto_bucket_sql(vec: str = "v", max_planes: int = _AUTO_MAX_PLANES) -> str:
    """Bucket expression whose PLANE COUNT is derived from the corpus size
    inside the SQL itself — the exact twin of operators.similarity
    .auto_planes: n = 8 if rows ≤ 128 else max(8, ceil(log2(rows/128))).
    Unrolled to ``max_planes`` conditional terms (plane p contributes only
    when p < n), so one static SQL string is correct at every SF."""
    terms = []
    for p in range(max_planes):
        plane_hash = h15_sql(f"concat('{p},', CAST(i - 1 AS VARCHAR))")
        sign = f"CASE WHEN {plane_hash} % 2 = 1 THEN 1 ELSE -1 END"
        signed = (
            f"list_sum(list_transform({vec}, (x, i) -> "
            f"CAST(round(x * 1000000) AS BIGINT) * ({sign})))"
        )
        terms.append(
            f"CASE WHEN {p} < (SELECT n FROM np) AND {signed} > 0"
            f" THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


_AUTO_PLANES_CTE = """
np AS (SELECT CASE WHEN count(*) <= 128 THEN 8
              ELSE GREATEST(8, CAST(ceiling(log2(count(*) / 128.0)) AS BIGINT))
              END AS n
       FROM embeddings)
"""


def _lsh_oracle(k: int = 3) -> str:
    return f"""
WITH {_AUTO_PLANES_CTE},
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bkt AS (SELECT vec_id, v, CAST({_auto_bucket_sql()} AS BIGINT) AS bucket FROM e),
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
    dot. The physical plan is the blocked chunk grid (bounded task size;
    see operators/similarity.py lsh_topk) and the plane count derives from
    the corpus size — both leave the logical result unchanged, so the SQL
    oracle is the plain same-bucket ranking. Recall vs brute force is
    additionally pytest-asserted.

    The SCALE path is the registered path (round-3 ADVICE closed): the
    oracle derives the plane count from count(embeddings) with the same
    formula as auto_planes (its ``np`` CTE), so Spark's ``n_planes="auto"``
    and the SQL agree at every SF — no pinned-planes test-only split."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, k=3, n_planes="auto")


def _multiprobe_oracle(k: int = 3) -> str:
    return f"""
WITH {_AUTO_PLANES_CTE},
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bkt AS (SELECT vec_id, v, CAST({_auto_bucket_sql()} AS BIGINT) AS bucket FROM e),
s AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_DOT} AS dot_scaled
      FROM bkt a JOIN bkt b
        ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id != b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_scaled DESC, cand_id) AS rnk FROM s)
SELECT query_id, cand_id, dot_scaled, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {k}
"""


@query("ann_topk_lsh_multiprobe", _multiprobe_oracle())
def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-k: each query also probes the n_planes
    buckets at Hamming distance 1 (probe-side explode + equi-join — the
    candidate side never replicates). The oracle states the same semantics
    declaratively as a Hamming-≤1 bucket join. Recall gain over
    single-probe is pytest-asserted vs brute force. Plane count is
    auto-derived on BOTH sides (the oracle's ``np`` CTE mirrors
    auto_planes), so the scale path is the registered path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk_multiprobe(emb, k=3, n_planes="auto")


_BANDED_PLANES, _BANDED_BANDS, _BANDED_THR = 24, 6, 400_000_000_000
_BANDED_BITS = _BANDED_PLANES // _BANDED_BANDS


@query(
    "embedding_threshold_pairs",
    f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, CAST({_bucket_sql(_BANDED_PLANES)} AS BIGINT) AS sig FROM e),
bands AS (SELECT vec_id, unnest(range(0, {_BANDED_BANDS})) AS band,
                 unnest(list_transform(range(0, {_BANDED_BANDS}),
                        b -> (sig >> CAST(b * {_BANDED_BITS} AS INTEGER)) & {(1 << _BANDED_BITS) - 1})) AS bkey
          FROM sig),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
s AS (SELECT id_a, id_b, {_int_dot("list_transform(ea.v, x -> CAST(round(x * 1000000) AS BIGINT))", "list_transform(eb.v, x -> CAST(round(x * 1000000) AS BIGINT))")} AS dot_scaled
      FROM cand JOIN e ea ON ea.vec_id = cand.id_a JOIN e eb ON eb.vec_id = cand.id_b)
SELECT id_a, id_b, dot_scaled FROM s WHERE dot_scaled >= {_BANDED_THR}
""",
)
def q_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a similarity threshold (M5), at
    corpus scale: sign-LSH bands generate candidates via an equi-join
    (shuffle ∝ docs·bands + candidate pairs — round 1 broadcast corpus/5,
    now nothing corpus-proportional is broadcast), then the exact integer
    dot verifies ≥ threshold. Semantics are banded-candidates ∩ threshold,
    deterministic and oracle-checked, mirroring doc_minhash_lsh_pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_threshold_pairs_banded(
        emb,
        threshold_scaled=_BANDED_THR,
        n_planes=_BANDED_PLANES,
        n_bands=_BANDED_BANDS,
    )


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


_IVF_K, _IVF_ITERS, _IVF_NPROBE, _IVF_QMOD, _IVF_KNN = 8, 2, 2, 100, 3


def _ivf_kmeans_oracle(
    k: int = _IVF_K,
    iters: int = _IVF_ITERS,
    nprobe: int = _IVF_NPROBE,
    query_mod: int = _IVF_QMOD,
    knn: int = _IVF_KNN,
) -> str:
    """SQL twin of kmeans_lite + ivf_topk: h15-seeded init, then `iters`
    unrolled Lloyd iterations — assignment by exact int dist² (ties →
    lowest cid), centroid update = floor(Σx/count) per dim (empty
    clusters keep their previous position via the LEFT JOIN + COALESCE),
    then nprobe-nearest probe lists and exact-dot top-k."""
    hk = h15_sql("CAST(vec_id AS VARCHAR)")
    parts = [
        f"WITH e AS (SELECT vec_id, {_IV} AS iv FROM embeddings)",
        f"""c0 AS (SELECT CAST(rn - 1 AS INTEGER) AS cid, iv AS civ FROM
  (SELECT iv, row_number() OVER (ORDER BY {hk}, vec_id) AS rn FROM e) WHERE rn <= {k})""",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts += [
            f"""s{it} AS (SELECT cid, i, x FROM
  (SELECT cid, unnest(iv) AS x, unnest(range(1, len(iv) + 1)) AS i
   FROM (SELECT a.cid, e.iv FROM
         (SELECT vec_id, cid FROM
          (SELECT e.vec_id, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_int_dist2("e.iv", "c.civ")}, c.cid) AS rn
           FROM e, {prev} c) WHERE rn = 1) a JOIN e ON e.vec_id = a.vec_id)))""",
            f"""u{it} AS (SELECT cid,
  list(CAST((s - ((s % cnt) + cnt) % cnt) // cnt AS BIGINT) ORDER BY i) AS civ FROM
  (SELECT cid, i, CAST(sum(x) AS BIGINT) AS s, count(*) AS cnt
   FROM s{it} GROUP BY cid, i) GROUP BY cid)""",
            f"""c{it} AS (SELECT p.cid, COALESCE(u.civ, p.civ) AS civ
  FROM {prev} p LEFT JOIN u{it} u USING (cid))""",
        ]
    final = f"c{iters}"
    parts += [
        f"""af AS (SELECT vec_id, iv, cid FROM
  (SELECT e.vec_id, e.iv, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY {_int_dist2("e.iv", "c.civ")}, c.cid) AS rn
   FROM e, {final} c) WHERE rn = 1)""",
        f"""q AS (SELECT vec_id AS query_id, iv AS qiv, cid FROM
  (SELECT e.vec_id, e.iv, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY {_int_dist2("e.iv", "c.civ")}, c.cid) AS rn
   FROM e, {final} c WHERE e.vec_id % {query_mod} = 0) WHERE rn <= {nprobe})""",
        f"""s AS (SELECT query_id, cand_id, {_int_dot("qiv", "civ2")} AS dot_scaled
  FROM q JOIN (SELECT vec_id AS cand_id, iv AS civ2, cid FROM af) c USING (cid)
  WHERE query_id != cand_id)""",
        """r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot_scaled DESC, cand_id) AS rnk FROM s)""",
    ]
    return (
        ",\n".join(parts)
        + f"\nSELECT query_id, cand_id, dot_scaled, CAST(rnk AS BIGINT) AS rnk "
        f"FROM r WHERE rnk <= {knn}"
    )


@query("ann_topk_ivf", _ivf_kmeans_oracle())
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (M5): FIXED-k deterministic kmeans-lite centroids
    (h15-seeded, integer Lloyd updates) → nearest-centroid assignment →
    top-k by exact dot within the query's nprobe=2 probe lists. Centroid
    count is constant, so the assignment broadcast no longer grows with
    the corpus (the round-1 weakness). Entirely integer-exact ⇒ the whole
    approximate path, kmeans included, hash-matches the unrolled SQL."""
    from videos_to_tfrecords_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        k_centroids=_IVF_K,
        iters=_IVF_ITERS,
        nprobe=_IVF_NPROBE,
        query_mod=_IVF_QMOD,
        k=_IVF_KNN,
    )


@query(
    "embedding_quantize_int8",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e)
SELECT vec_id,
       CAST(unnest(range(len(v))) AS BIGINT) AS dim,
       unnest(CASE WHEN maxabs = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
                   ELSE list_transform(v, x -> CAST(round(127.0 * x / maxabs) AS BIGINT))
              END) AS q
FROM m
""",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector max-abs int8 quantization — the storage-diet step before
    shipping embeddings to an ANN index (4× smaller than f32). Exact
    cross-engine: one IEEE division + half-away-from-zero round per
    element on identical doubles; zero vectors quantize to zeros. Output
    is exploded to ``(vec_id, dim, q)`` rows: scalar-only columns so any
    row canonicalizer (pandas sort included) can order it — the r4 driver
    threw ``unhashable type: 'list'`` sorting the array-typed draft.
    Purely narrow (no shuffle) — at 100 TB it's a scan-shaped rewrite;
    the explode is a flat-map, still shuffle-free."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(
        maxabs == 0, F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(v, lambda x: F.round(F.lit(127.0) * x / maxabs).cast("long"))
    )
    return (
        emb.select("vec_id", F.posexplode(q).alias("dim", "q"))
        .select("vec_id", F.col("dim").cast("long").alias("dim"), "q")
    )


@query(
    "embedding_dup_clusters",
    f"""
WITH RECURSIVE
e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, CAST({_bucket_sql(_BANDED_PLANES)} AS BIGINT) AS sig FROM e),
bands AS MATERIALIZED (SELECT vec_id, unnest(range(0, {_BANDED_BANDS})) AS band,
                 unnest(list_transform(range(0, {_BANDED_BANDS}),
                        b -> (sig >> CAST(b * {_BANDED_BITS} AS INTEGER)) & {(1 << _BANDED_BITS) - 1})) AS bkey
          FROM sig),
cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
s AS (SELECT id_a, id_b, {_int_dot("list_transform(ea.v, x -> CAST(round(x * 1000000) AS BIGINT))", "list_transform(eb.v, x -> CAST(round(x * 1000000) AS BIGINT))")} AS dot_scaled
      FROM cand JOIN e ea ON ea.vec_id = cand.id_a JOIN e eb ON eb.vec_id = cand.id_b),
dup AS MATERIALIZED (SELECT id_a, id_b FROM s WHERE dot_scaled >= {_BANDED_THR}),
edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM dup
          UNION SELECT id_b, id_a FROM dup),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT edg.src, reach.r FROM edges edg JOIN reach ON edg.dst = reach.node
)
SELECT node, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY node
""",
)
def q_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS (M5): banded cosine threshold pairs →
    connected components — the semantic-dedup composition (cluster by
    embedding similarity, keep one representative per cluster) that
    complements the text-side doc_dup_clusters. Same scale shapes as its
    parts: equi-join candidate generation, edge-proportional CC. Oracle:
    recursive-CTE min-reachable-id over the same deterministic pairs."""
    from videos_to_tfrecords_spark.operators.dedup import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_threshold_pairs_banded(
        emb,
        threshold_scaled=_BANDED_THR,
        n_planes=_BANDED_PLANES,
        n_bands=_BANDED_BANDS,
    ).select("id_a", "id_b")
    return connected_components(pairs)


def _kmeans_assign_parts(
    k: int | str = _IVF_K,
    iters: int = _IVF_ITERS,
    prefix: str = "",
    iv_expr: str | None = None,
) -> list[str]:
    """Shared CTE prefix: kmeans-lite init + unrolled integer Lloyd,
    ending in ``{prefix}af(vec_id, cid, d2)`` — the assignment every
    kmeans-based oracle (profile, semantic dedup, PQ) builds on.
    ``k="auto"`` derives k = max(8, ⌈n/256⌉) from the table itself
    (integer ceil — the exact twin of semantic_dedup's auto-k).
    ``prefix`` namespaces every CTE so several independent chains (one per
    PQ subspace) can coexist in one statement; ``iv_expr`` overrides the
    int-vector expression (e.g. a list_slice for a PQ subspace)."""
    hk = h15_sql("CAST(vec_id AS VARCHAR)")
    iv = iv_expr or _IV
    parts = [f"WITH {prefix}e AS MATERIALIZED (SELECT vec_id, {iv} AS iv FROM embeddings)"]
    P = prefix
    if k == "auto":
        parts.append(
            f"{P}kk AS MATERIALIZED (SELECT GREATEST(8, (count(*) + 255) // 256) AS k FROM {P}e)"
        )
        k_expr = f"(SELECT k FROM {P}kk)"
    else:
        k_expr = str(k)
    parts.append(
        f"""{P}c0 AS MATERIALIZED (SELECT CAST(rn - 1 AS INTEGER) AS cid, iv AS civ FROM
  (SELECT iv, row_number() OVER (ORDER BY {hk}, vec_id) AS rn FROM {P}e) WHERE rn <= {k_expr})"""
    )
    for it in range(1, iters + 1):
        prev = f"{P}c{it - 1}"
        parts += [
            f"""{P}s{it} AS MATERIALIZED (SELECT cid, i, x FROM
  (SELECT cid, unnest(iv) AS x, unnest(range(1, len(iv) + 1)) AS i
   FROM (SELECT a.cid, e.iv FROM
         (SELECT vec_id, cid FROM
          (SELECT e.vec_id, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_int_dist2("e.iv", "c.civ")}, c.cid) AS rn
           FROM {P}e e, {prev} c) WHERE rn = 1) a JOIN {P}e e ON e.vec_id = a.vec_id)))""",
            f"""{P}u{it} AS MATERIALIZED (SELECT cid,
  list(CAST((s - ((s % cnt) + cnt) % cnt) // cnt AS BIGINT) ORDER BY i) AS civ FROM
  (SELECT cid, i, CAST(sum(x) AS BIGINT) AS s, count(*) AS cnt
   FROM {P}s{it} GROUP BY cid, i) GROUP BY cid)""",
            f"""{P}c{it} AS MATERIALIZED (SELECT p.cid, COALESCE(u.civ, p.civ) AS civ
  FROM {prev} p LEFT JOIN {P}u{it} u USING (cid))""",
        ]
    final = f"{P}c{iters}"
    parts.append(
        f"""{P}af AS MATERIALIZED (SELECT vec_id, cid, d2 FROM
  (SELECT e.vec_id, c.cid, {_int_dist2("e.iv", "c.civ")} AS d2,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY {_int_dist2("e.iv", "c.civ")}, c.cid) AS rn
   FROM {P}e e, {final} c) WHERE rn = 1)"""
    )
    return parts


def _kmeans_profile_oracle(k: int = _IVF_K, iters: int = _IVF_ITERS) -> str:
    """SQL twin of operators/similarity.kmeans_profile: the kmeans-lite
    prefix of the IVF oracle (same init, same unrolled integer Lloyd),
    closed with per-cluster size + inertia (dist² div 1000)."""
    return (
        ",\n".join(_kmeans_assign_parts(k, iters))
        + """
SELECT CAST(cid AS BIGINT) AS cid,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(d2 // 1000) AS BIGINT) AS inertia_k
FROM af GROUP BY cid"""
    )


_SEMDEDUP_THR = 400_000_000_000  # scaled dot ≥ 0.4 (unit-norm ⇒ ~cosine·1e12)


def _semantic_dedup_oracle(
    k: int | str = "auto", iters: int = _IVF_ITERS
) -> str:
    """SQL twin of operators/similarity.semantic_dedup: the same kmeans
    assignment prefix, then within-cluster keep-first dominance — a vector
    is dropped iff a lower-id cluster-mate's scaled-int dot reaches the
    threshold."""
    parts = _kmeans_assign_parts(k, iters)
    parts.append(
        """av AS MATERIALIZED (SELECT af.vec_id, af.cid, e.iv FROM af JOIN e ON e.vec_id = af.vec_id)"""
    )
    parts.append(
        f"""drp AS (SELECT DISTINCT b.vec_id FROM av a JOIN av b
  ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_int_dot("a.iv", "b.iv")} >= {_SEMDEDUP_THR})"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT av.vec_id, CAST(av.cid AS BIGINT) AS cid,
       (d.vec_id IS NULL) AS kept
FROM av LEFT JOIN drp d ON av.vec_id = d.vec_id"""
    )


@query("kmeans_cluster_profile", _kmeans_profile_oracle())
def q_kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means corpus clustering profile (k=8, 2 integer
    Lloyd iterations): per-cluster sizes + inertia, the summary a
    mixture-balancing pass consumes. Fully deterministic, so even the
    clustering itself is hash-checked against the unrolled-SQL twin."""
    from videos_to_tfrecords_spark.operators.similarity import kmeans_profile

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_profile(emb, k=_IVF_K, iters=_IVF_ITERS)


@query("semantic_dedup_keep", _semantic_dedup_oracle(k="auto"))
def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster with deterministic
    integer k-means, drop within-cluster near-dups by keep-first
    dominance): one row per vector with its cluster and kept flag. The
    whole approximate pipeline — init, Lloyd updates, assignment, pairwise
    dot — is integer-exact, so even the CLUSTERING is hash-checked."""
    from videos_to_tfrecords_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, k="auto", iters=_IVF_ITERS, threshold_scaled=_SEMDEDUP_THR
    )


def _jl_oracle(n_out: int = 8) -> str:
    """SQL twin of operators/similarity.jl_project: per output dim j the
    signed sum Σᵢ round(xᵢ·1e6)·sign(j,i), sign = parity of h15("jl:j,i")."""
    terms = []
    for j in range(n_out):
        sign = (
            f"CASE WHEN {h15_sql(f'''concat('{j},', CAST(i - 1 AS VARCHAR))''', salt='jl')}"
            f" % 2 = 1 THEN 1 ELSE -1 END"
        )
        terms.append(
            f"CAST(list_sum(list_transform(v, (x, i) -> "
            f"CAST(round(x * 1000000) AS BIGINT) * ({sign}))) AS BIGINT)"
        )
    arr = "[" + ", ".join(terms) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       CAST(unnest(range({n_out})) AS BIGINT) AS dim,
       unnest({arr}) AS p
FROM e
"""


@query("embedding_jl_projection", _jl_oracle())
def q_embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss Rademacher projection 64→8 dims — the
    dimensionality-diet rewrite before a cheaper ANN pass. Narrow
    scan-shaped plan (one Arrow matmul, no shuffle); exact int64 values
    hash-match the unrolled signed-sum SQL. Registry output is exploded
    to ``(vec_id, dim, p)`` scalar rows so the driver's pandas-sort
    canonicalizer never sees a list-typed cell (the r4
    embedding_quantize_int8 lesson); the ``jl_project`` operator itself
    keeps the array<long> API for downstream ANN use."""
    from videos_to_tfrecords_spark.operators.similarity import jl_project

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        jl_project(emb, n_out=8)
        .select("vec_id", F.posexplode("proj").alias("dim", "p"))
        .select("vec_id", F.col("dim").cast("long").alias("dim"), "p")
    )


def _ann_recall_oracle(k: int = 3) -> str:
    hq = h15_sql("CAST(vec_id AS VARCHAR)", salt="annq")
    return f"""
WITH {_AUTO_PLANES_CTE},
kq AS (SELECT GREATEST(1, count(*) // 64) AS kq FROM embeddings),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bkt AS (SELECT vec_id, v, CAST({_auto_bucket_sql()} AS BIGINT) AS bucket FROM e),
bq AS (SELECT vec_id FROM e WHERE {hq} % (SELECT kq FROM kq) = 0),
ls AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_DOT} AS dot_scaled
       FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
       WHERE a.vec_id IN (SELECT vec_id FROM bq)),
lr AS (SELECT query_id, cand_id FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY dot_scaled DESC, cand_id) AS rnk FROM ls) WHERE rnk <= {k}),
bs AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, {_DOT} AS dot_scaled
       FROM e a, e b WHERE a.vec_id IN (SELECT vec_id FROM bq)
         AND b.vec_id != a.vec_id),
br AS (SELECT query_id, cand_id FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY dot_scaled DESC, cand_id) AS rnk FROM bs) WHERE rnk <= {k})
SELECT CAST((SELECT count(DISTINCT query_id) FROM br) AS BIGINT) AS n_queries,
       CAST((SELECT count(*) FROM br JOIN lr USING (query_id, cand_id)) AS BIGINT)
         AS n_hits,
       CAST((SELECT count(*) FROM br) AS BIGINT) AS n_possible,
       CAST((1000000 * (SELECT count(*) FROM br JOIN lr USING (query_id, cand_id)))
            // (SELECT count(*) FROM br) AS BIGINT) AS recall_x1e6
"""


@query("ann_recall_at_k", _ann_recall_oracle())
def q_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY as a first-class metric: recall@3 of the auto-plane
    sign-LSH index against exact brute force on the query subset — the
    eval an index rollout gates on, now itself hash-checked (both
    rankings are deterministic integer-dot top-k, so the recall fraction
    is exact). Engine runs the production blocked-grid LSH path and the
    broadcast brute-force path and intersects."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    emb = load_table(spark, sf_dir, "embeddings")
    # BOUNDED eval sample (~64 queries regardless of corpus size): the sf1
    # probe measured the corpus-proportional %25 sample quadratic
    # (exponent 1.67) — recall evals run on a fixed-size probe set, the
    # brute-force leg is then O(64·n), linear.
    n = emb.count()
    kq = max(1, int(n) // 64)
    is_q = h15(F.col("vec_id").cast("string"), salt="annq") % kq == 0
    queries_df = emb.filter(is_q)
    br = brute_force_topk(queries_df, emb, k=3).select("query_id", "cand_id")
    lr = (
        lsh_topk(emb, k=3, n_planes="auto")
        .join(
            queries_df.select(F.col("vec_id").alias("query_id")), "query_id"
        )
        .select("query_id", "cand_id")
    )
    hits = br.join(lr, ["query_id", "cand_id"]).count()
    possible = br.count()
    nq = br.select("query_id").distinct().count()
    return spark.createDataFrame(
        [(nq, hits, possible, (1_000_000 * hits) // possible)],
        "n_queries long, n_hits long, n_possible long, recall_x1e6 long",
    )


# NDCG@10 with an EXACT integer discount table: disc(r) = int(1e6/log2(r+1))
# and its prefix sums are computed ONCE in Python and inlined literally in
# both engines, so no cross-engine log/float divergence can exist — the
# metric is pure int64 arithmetic end to end.
_NDCG_K = 10
_NDCG_DISC = [int(1_000_000 / __import__("math").log2(r + 1)) for r in range(1, _NDCG_K + 1)]
_NDCG_IDCG = [sum(_NDCG_DISC[:m]) for m in range(1, _NDCG_K + 1)]


def _ndcg_oracle() -> str:
    hq = h15_sql("CAST(vec_id AS VARCHAR)", salt="ndcg")
    disc = "list_value(" + ", ".join(map(str, _NDCG_DISC)) + ")"
    idcg = "list_value(" + ", ".join(map(str, _NDCG_IDCG)) + ")"
    return f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 64) AS kq FROM embeddings),
e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT * FROM e WHERE {hq} % (SELECT kq FROM kq) = 0),
s AS (SELECT a.vec_id AS query_id, a.label AS qlab, b.vec_id AS cand_id,
             b.label AS clab, {_DOT} AS dot
      FROM q a JOIN e b ON b.vec_id != a.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, cand_id) AS rnk FROM s),
pq AS (SELECT query_id, qlab,
              CAST(sum(CASE WHEN clab = qlab THEN {disc}[CAST(rnk AS INT)]
                            ELSE 0 END) AS BIGINT) AS dcg,
              min(CASE WHEN clab = qlab THEN rnk END) AS first_rel
       FROM r WHERE rnk <= {_NDCG_K} GROUP BY 1, 2),
lc AS (SELECT label, count(*) AS n_lab FROM e GROUP BY 1)
SELECT query_id, dcg,
       CAST(LEAST(n_lab - 1, {_NDCG_K}) AS BIGINT) AS n_rel,
       CAST(CASE WHEN n_lab > 1 THEN (1000000 * dcg)
                      // ({idcg}[CAST(LEAST(n_lab - 1, {_NDCG_K}) AS INT)])
                 ELSE 0 END AS BIGINT) AS ndcg_ppm,
       CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) AS rr_ppm
FROM pq JOIN lc ON lc.label = pq.qlab
"""


@query("retrieval_ndcg_eval", _ndcg_oracle())
def q_retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query NDCG@10 + reciprocal rank of exact dot-product retrieval,
    graded against label agreement — the ranking-quality eval a retrieval
    or embedding rollout gates on (the recall@k query grades the INDEX
    against brute force; this grades the RANKING against ground truth).
    Discount table and its prefix sums (IDCG for 0/1 relevance = sum of
    the first min(n_rel, 10) discounts) are Python-precomputed integer
    literals shared by both engines, so NDCG/MRR are exact int64 ppm.

    Scale shape: bounded probe set (~64 queries via corpus-derived h15
    modulus) collected into the mapInPandas brute-force kernel — corpus
    scans once, never shuffles; everything after the per-batch partial
    top-k is metadata-sized (|q|·k rows, 10-row label counts, broadcast
    joins only)."""
    from videos_to_tfrecords_spark.functions.hashing import h15

    emb = load_table(spark, sf_dir, "embeddings")
    n = int(emb.count())
    kq = max(1, n // 64)
    qdf = emb.filter(h15(F.col("vec_id").cast("string"), salt="ndcg") % kq == 0)
    br = brute_force_topk(qdf, emb, k=_NDCG_K)
    qlab = qdf.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlab"))
    hits = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("clab")
    ).join(F.broadcast(br.join(F.broadcast(qlab), "query_id")), "cand_id")
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISC]), F.col("rnk").cast("int")
    )
    rel = (F.col("clab") == F.col("qlab")).cast("long")
    pq = hits.groupBy("query_id", "qlab").agg(
        F.sum(rel * disc).cast("long").alias("dcg"),
        F.min(F.when(rel == 1, F.col("rnk"))).alias("first_rel"),
    )
    lc = emb.groupBy(F.col("label").alias("qlab")).agg(F.count("*").alias("n_lab"))
    n_rel = F.least(F.col("n_lab") - 1, F.lit(_NDCG_K))
    idcg = F.element_at(
        F.array(*[F.lit(s) for s in _NDCG_IDCG]),
        F.greatest(n_rel, F.lit(1)).cast("int"),
    )
    return (
        pq.join(F.broadcast(lc), "qlab")
        .withColumn("idcg", idcg)
        .select(
            "query_id",
            "dcg",
            n_rel.cast("long").alias("n_rel"),
            F.when(F.col("n_lab") > 1, F.expr("(1000000 * dcg) div idcg"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("ndcg_ppm"),
            F.when(
                F.col("first_rel").isNotNull(), F.expr("1000000 div first_rel")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_ppm"),
        )
    )


def _mmr_oracle(k: int = 5, n_cand: int = 20, qt: int = 50) -> str:
    """Unrolled greedy MMR: step 1 picks max-rel; each later step joins the
    pair-sim table to the selected union, takes max-sim per remaining
    candidate (LEFT-JOIN-flag anti, never correlated NOT IN), and window-
    picks argmax(rel − maxsim) with id tie-break — identical total order
    to the engine's unrolled rounds."""
    head = f"""
WITH kq AS (SELECT GREATEST(2, count(*) // {qt}) AS m FROM embeddings),
e AS (SELECT vec_id, {_IV} AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM kq) = 0),
t AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM kq) != 0),
s AS (SELECT a.vec_id AS qid, b.vec_id AS cid, b.v AS cv,
             {_int_dot('a.v', 'b.v')} AS rel
      FROM q a, t b),
cand AS (SELECT qid, cid, cv, rel FROM (
           SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid)
             AS rnk FROM s) WHERE rnk <= {n_cand}),
pairs AS (SELECT x.qid, x.cid AS ca, y.cid AS cb,
                 {_int_dot('x.cv', 'y.cv')} AS sim
          FROM cand x JOIN cand y ON x.qid = y.qid AND x.cid != y.cid),
sel1 AS (SELECT qid, cid, 1 AS step, rel AS score FROM (
           SELECT qid, cid, rel, row_number() OVER
             (PARTITION BY qid ORDER BY rel DESC, cid) AS rn
           FROM cand) WHERE rn = 1),
selu1 AS (SELECT * FROM sel1)"""
    steps = []
    for i in range(2, k + 1):
        p = i - 1
        steps.append(f"""
ms{i} AS (SELECT p.qid, p.ca AS cid, max(p.sim) AS maxsim
        FROM pairs p JOIN selu{p} s ON s.qid = p.qid AND s.cid = p.cb
        GROUP BY 1, 2),
sel{i} AS (SELECT qid, cid, {i} AS step, score FROM (
           SELECT c.qid, c.cid, c.rel - m.maxsim AS score,
                  row_number() OVER (PARTITION BY c.qid
                    ORDER BY c.rel - m.maxsim DESC, c.cid) AS rn
           FROM cand c
           JOIN ms{i} m ON m.qid = c.qid AND m.cid = c.cid
           LEFT JOIN selu{p} s0 ON s0.qid = c.qid AND s0.cid = c.cid
           WHERE s0.cid IS NULL) WHERE rn = 1),
selu{i} AS (SELECT * FROM selu{p} UNION ALL SELECT * FROM sel{i})""")
    tail = f"""
SELECT qid AS query_id, CAST(step AS BIGINT) AS step, cid AS cand_id,
       CAST(score AS BIGINT) AS mmr_score
FROM selu{k}"""
    return head + "," + ",".join(steps) + tail


@query("mmr_diversified_retrieval", _mmr_oracle())
def q_mmr_diversified_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 retrieval per probe query
    (operators/similarity.mmr_diversified_topk): greedy maximal-marginal-
    relevance re-ranking of the exact top-20 relevance candidates, λ=½ so
    the criterion collapses to the integer rel − max-sim-to-selected. The
    between-ANN-and-context diversity stage of the RAG mainline — the k
    passages returned are mutually non-redundant, not just individually
    relevant. Everything past candidate generation is bounded by
    |probe|·candidates², corpus-independent."""
    from videos_to_tfrecords_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_diversified_topk(emb, query_target=50, n_candidates=20, k=5)


def _kcenter_oracle(k: int = 8) -> str:
    """Unrolled farthest-first chain: c1 = min-id seed; d_i carries the
    running min-distance via a LEAST fold (identical to the engine's
    min-over-centers); c_{i+1} is TakeOrdered(1) under (−md, id)."""
    d2 = _int_dist2
    parts = [
        f"WITH e AS (SELECT vec_id, {_IV} AS v FROM embeddings)",
        "c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"d1 AS (SELECT e.vec_id, e.v, {d2('e.v', 'c.v')} AS md FROM e, c1 c)",
    ]
    for i in range(2, k + 1):
        p = i - 1
        parts.append(
            f"c{i} AS (SELECT vec_id, v, md FROM d{p} "
            f"ORDER BY md DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"d{i} AS (SELECT d.vec_id, d.v, "
            f"LEAST(d.md, {d2('d.v', 'c.v')}) AS md FROM d{p} d, c{i} c)"
        )
    sel = [
        "SELECT CAST(1 AS BIGINT) AS step, "
        "(SELECT vec_id FROM c1) AS center_id, CAST(0 AS BIGINT) AS radius2"
    ]
    for i in range(2, k + 1):
        sel.append(
            f"SELECT CAST({i} AS BIGINT), (SELECT vec_id FROM c{i}), "
            f"CAST((SELECT md FROM c{i}) AS BIGINT)"
        )
    sel.append(
        f"SELECT CAST({k + 1} AS BIGINT), CAST(-1 AS BIGINT), "
        f"CAST((SELECT max(md) FROM d{k}) AS BIGINT)"
    )
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(sel)


@query("kcenter_coreset", _kcenter_oracle())
def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus
    (operators/similarity.kcenter_greedy): 8 farthest-first prototypes +
    the final max-min coverage radius — the diversity-based subset
    selection primitive of coreset active learning and diverse-seed
    curation. Exact scaled-int64 distances; each round one corpus scan
    with the ≤8-center matrix broadcast; argmax is TakeOrdered(1)."""
    from videos_to_tfrecords_spark.operators.similarity import kcenter_greedy

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_greedy(emb, k=8)


def _hubness_oracle() -> str:
    return f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 400) AS m FROM embeddings),
e AS (SELECT vec_id, {_IV} AS v FROM embeddings),
s AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
             {_int_dot('a.v', 'b.v')} AS dot
      FROM e a, e b WHERE a.vec_id % (SELECT m FROM kq) = 0
        AND b.vec_id != a.vec_id),
r AS (SELECT qid, cid, row_number() OVER
        (PARTITION BY qid ORDER BY dot DESC, cid) AS rnk FROM s),
occ AS (SELECT cid AS cand_id, CAST(count(*) AS BIGINT) AS k_occ
        FROM r WHERE rnk <= 5 GROUP BY 1)
SELECT cand_id, k_occ FROM occ ORDER BY k_occ DESC, cand_id LIMIT 20
"""


@query("embedding_hubness_topk", _hubness_oracle())
def q_embedding_hubness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic of the embedding space (Radovanović et al., JMLR
    2010 — public): the k-occurrence count N_k(x) — how often each corpus
    point appears in OTHER points' exact top-5 — over a ~400-query
    corpus-derived probe. High-hub points dominate retrieval results and
    poison kNN-based dedup/curation; this query surfaces the top-20 hubs
    for inspection or down-weighting. Same bounded-probe brute-force
    kernel as knn_loo_accuracy; the count is one shuffle over
    |probe|·k rows, and the top-20 is TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = max(1, int(emb.count()) // 400)
    probe = emb.filter(F.col("vec_id") % m == 0)
    nn = brute_force_topk(probe, emb, k=5)
    return (
        nn.groupBy("cand_id")
        .agg(F.count("*").cast("long").alias("k_occ"))
        .orderBy(F.desc("k_occ"), F.asc("cand_id"))
        .limit(20)
    )


def _alignment_oracle() -> str:
    return f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 400) AS m FROM embeddings),
e AS (SELECT vec_id, label, {_IV} AS v FROM embeddings
      WHERE vec_id % (SELECT m FROM kq) = 0),
p AS (SELECT CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS same,
             {_int_dot('a.v', 'b.v')} AS dot
      FROM e a JOIN e b ON a.vec_id < b.vec_id),
agg AS (SELECT CAST(sum(same) AS BIGINT) AS ns,
              CAST(sum(1 - same) AS BIGINT) AS nc,
              CAST(sum(CASE WHEN same = 1 THEN dot ELSE 0 END) AS BIGINT) AS ss,
              CAST(sum(CASE WHEN same = 0 THEN dot ELSE 0 END) AS BIGINT) AS sc
       FROM p),
m AS (SELECT ns, nc,
             (ss + 20000000000000 * ns) // ns - 20000000000000 AS mean_same,
             (sc + 20000000000000 * nc) // nc - 20000000000000 AS mean_cross
      FROM agg)
SELECT ns AS n_same_pairs, nc AS n_cross_pairs,
       CAST(mean_same AS BIGINT) AS mean_same_dot,
       CAST(mean_cross AS BIGINT) AS mean_cross_dot,
       CAST(mean_same - mean_cross AS BIGINT) AS alignment_margin
FROM m
"""


@query("embedding_alignment_margin", _alignment_oracle())
def q_embedding_alignment_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment/uniformity-style embedding-space health check (Wang &
    Isola 2020 framing — public, integerized): mean exact dot within
    same-label pairs vs across labels over the bounded probe sample, and
    their margin — the one-number gate that an encoder clusters classes
    (margin ≫ 0) before its neighbors are trusted for label-propagation
    or semantic dedup. The probe is corpus-derived-modulus bounded
    (~400), so the pair volume (~80k) is constant at any corpus size;
    pair dots are the exact scaled-int kernel; means are integer
    floor-div (non-negative-dot caveat does not apply: sums may be
    negative, but BOTH engines floor — DuckDB // floors and the margin
    is a difference of the same two floored terms computed identically).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    m = max(1, int(emb.count()) // 400)
    probe = emb.filter(F.col("vec_id") % m == 0).select(
        "vec_id", "label", "embedding"
    )
    from videos_to_tfrecords_spark.operators.similarity import _pair_dot

    a = probe.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("va"),
    )
    b = probe.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
    )
    p = (
        F.broadcast(a)
        .join(b, F.col("id_a") < F.col("id_b"))
        .select(
            F.when(F.col("la") == F.col("lb"), 1).otherwise(0).alias("same"),
            _pair_dot()("va", "vb").alias("dot"),
        )
    )
    agg = p.agg(
        F.sum("same").cast("long").alias("ns"),
        F.sum(1 - F.col("same")).cast("long").alias("nc"),
        F.sum(F.when(F.col("same") == 1, F.col("dot")).otherwise(0))
        .cast("long")
        .alias("ss"),
        F.sum(F.when(F.col("same") == 0, F.col("dot")).otherwise(0))
        .cast("long")
        .alias("sc"),
    )
    # |dot| < 2e13 (= dim·(0.525e6)² with margin), so shifting by 2e13·n
    # makes the dividend non-negative and `div` == floor — the exact
    # integer mean on BOTH engines (sums exceed 2^53, double close would
    # lose ulps exactly where the floor boundary sits).
    c = 20_000_000_000_000
    mean_same = F.expr(f"(ss + {c} * ns) div ns - {c}")
    mean_cross = F.expr(f"(sc + {c} * nc) div nc - {c}")
    return agg.select(
        F.col("ns").alias("n_same_pairs"),
        F.col("nc").alias("n_cross_pairs"),
        mean_same.cast("long").alias("mean_same_dot"),
        mean_cross.cast("long").alias("mean_cross_dot"),
        (mean_same - mean_cross).cast("long").alias("alignment_margin"),
    )


def _anisotropy_oracle() -> str:
    shift = 20_000_000_000_000
    return f"""
WITH e AS (SELECT vec_id, {_IV} AS v FROM embeddings),
idx AS (SELECT unnest(range(1, (SELECT len(v) FROM e LIMIT 1) + 1)) AS k),
el AS (SELECT e.vec_id, i.k, e.v[i.k] AS q FROM e, idx i),
n0 AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM e),
dims AS (SELECT k, CAST(sum(q) AS HUGEINT) AS s FROM el GROUP BY k),
ss AS (SELECT CAST(sum(s * s) AS HUGEINT) AS ssq FROM dims),
n2 AS (SELECT CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sn FROM el)
SELECT CAST(n AS BIGINT) AS n_vectors,
       CAST(sn // n AS BIGINT) AS mean_norm2,
       CAST((ssq - sn + {shift} * n * (n - 1)) // (n * (n - 1)) - {shift}
         AS BIGINT) AS mean_pairwise_dot
FROM n0, ss, n2
"""


@query("embedding_anisotropy", _anisotropy_oracle())
def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding space (Ethayarajh 2019's mean pairwise
    similarity — public): the EXACT mean dot over all n(n−1) ordered
    pairs, computed WITHOUT a pair join via the sum-vector identity
    Σ_{{i≠j}} vᵢ·vⱼ = ‖Σv‖² − Σ‖vᵢ‖². A high mean pairwise similarity
    means the encoder squeezes everything into a narrow cone and cosine
    thresholds stop separating near-dups from unrelated docs — the
    one-scan health check before trusting any similarity pipeline.

    One posexplode pass → per-dim int64 sums (each ≪ 2^63 at any
    realistic corpus) → the squares and the n(n−1) close in
    DECIMAL(38,0)/HUGEINT (the acf overflow lesson); the pairwise mean
    is shifted non-negative before the floor-div (dots may be negative;
    div truncates, // floors — the centroids lesson). O(n·dim) total,
    map-side partial aggs, zero pair materialization."""
    shift = 20_000_000_000_000
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(round(x * 1000000) AS BIGINT))")
        ).alias("d", "q"),
    )
    n0 = emb.agg(F.count("*").cast("decimal(38,0)").alias("n"))
    dims = el.groupBy("d").agg(F.sum("q").cast("decimal(38,0)").alias("s"))
    ss = dims.agg(F.sum(F.col("s") * F.col("s")).alias("ssq"))
    n2 = el.agg(
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sn")
    )
    joined = F.broadcast(n0).crossJoin(F.broadcast(ss)).crossJoin(
        F.broadcast(n2)
    )
    return joined.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.expr("CAST(sn div n AS BIGINT)").alias("mean_norm2"),
        F.expr(
            f"CAST((ssq - sn + CAST({shift} AS DECIMAL(38,0)) * n * (n - 1))"
            f" div (n * (n - 1)) - {shift} AS BIGINT)"
        ).alias("mean_pairwise_dot"),
    )


def _quant_recall_oracle() -> str:
    q8 = (
        "CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT)) "
        "ELSE list_transform(v, x -> CAST(round(127.0 * x / ma) AS BIGINT)) END"
    )
    return f"""
WITH kq AS (SELECT GREATEST(1, count(*) // 100) AS m FROM embeddings),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_IV} AS iv FROM embeddings),
e8 AS (SELECT vec_id, iv,
              {q8.replace('ma', 'list_max(list_transform(v, x -> abs(x)))')} AS q,
              CAST(round(1000000 * list_max(list_transform(v, x -> abs(x))))
                AS BIGINT) AS ms
       FROM e),
qs AS (SELECT * FROM e8 WHERE vec_id % (SELECT m FROM kq) = 0),
full_r AS (SELECT qid, cid FROM (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY {_int_dot('a.iv', 'b.iv')} DESC, b.vec_id) AS rnk
  FROM qs a, e8 b WHERE b.vec_id != a.vec_id) WHERE rnk <= 5),
int8_r AS (SELECT qid, cid FROM (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY {_int_dot('a.q', 'b.q')} * b.ms DESC, b.vec_id) AS rnk
  FROM qs a, e8 b WHERE b.vec_id != a.vec_id) WHERE rnk <= 5),
common AS (SELECT f.qid, count(*) AS c FROM full_r f
           JOIN int8_r e ON e.qid = f.qid AND e.cid = f.cid GROUP BY 1),
per AS (SELECT q.vec_id AS qid, COALESCE(c.c, 0) AS n_common
        FROM qs q LEFT JOIN common c ON c.qid = q.vec_id)
SELECT CAST(n_common AS BIGINT) AS n_common,
       CAST(count(*) AS BIGINT) AS n_queries
FROM per GROUP BY 1
"""


@query("quantization_recall_eval", _quant_recall_oracle())
def q_quantization_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does int8 quantization hurt retrieval? Recall@5 histogram of the
    per-vector max-abs INT8 ranking (operators/similarity.
    int8_brute_force_topk — the ranking an index serves after the
    embedding_quantize_int8 storage diet) against the exact full-precision
    top-5, over a ~100-query corpus-derived probe: per query the overlap
    count 0..5, grouped. The acceptance gate a team runs BEFORE swapping
    the serving index to quantized vectors — pass = mass concentrated at
    n_common=5. Both rankings run the bounded-probe matmul kernel; the
    comparison is a |probe|·k-row join."""
    from videos_to_tfrecords_spark.operators.similarity import (
        brute_force_topk,
        int8_brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m = max(1, int(emb.count()) // 100)
    probe = emb.filter(F.col("vec_id") % m == 0)
    full = brute_force_topk(probe, emb, k=5).select("query_id", "cand_id")
    i8 = int8_brute_force_topk(probe, emb, k=5).select("query_id", "cand_id")
    common = full.join(i8, ["query_id", "cand_id"]).groupBy("query_id").agg(
        F.count("*").alias("c")
    )
    per = (
        probe.select(F.col("vec_id").alias("query_id"))
        .join(common, "query_id", "left")
        .select(F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_common"))
    )
    return per.groupBy("n_common").agg(
        F.count("*").cast("long").alias("n_queries")
    )


def _dedup_funnel_oracle() -> str:
    key = (
        "list_aggregate(list_transform(embedding::DOUBLE[], "
        "x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)), "
        "'string_agg', ',')"
    )
    return f"""
WITH sem AS MATERIALIZED ({_semantic_dedup_oracle(k="auto")}),
ek AS (SELECT vec_id, {key} AS vkey FROM embeddings),
keep1 AS (SELECT vec_id, vkey,
                 vec_id = min(vec_id) OVER (PARTITION BY vkey) AS exact_keep
          FROM ek),
j AS MATERIALIZED (SELECT k.vec_id, k.exact_keep, s.kept AS sem_keep, s.cid
      FROM keep1 k JOIN sem s ON s.vec_id = k.vec_id),
fin AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN exact_keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS exact_kept,
               CAST(sum(CASE WHEN exact_keep AND sem_keep THEN 1 ELSE 0 END)
                 AS BIGINT) AS final_kept
        FROM j),
cl AS (SELECT CAST(max(c) AS BIGINT) AS maxc FROM (
         SELECT count(*) AS c FROM j
         WHERE exact_keep AND sem_keep GROUP BY cid))
SELECT 'total' AS stage, total AS value FROM fin
UNION ALL SELECT 'exact_kept', exact_kept FROM fin
UNION ALL SELECT 'final_kept', final_kept FROM fin
UNION ALL SELECT 'max_cluster_share_ppm',
                 CAST((1000000 * cl.maxc) // fin.final_kept AS BIGINT)
FROM cl, fin
"""


@query("embedding_dedup_funnel_e2e", _dedup_funnel_oracle())
def q_embedding_dedup_funnel_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END embedding dedup funnel (the index-build preamble of an
    ANN serving stack, the embedding-modality sibling of
    corpus_curation_e2e): exact-vector dedup (group by the quantized
    vector, keep min id) → SemDeDup semantic dedup (integer k-means +
    within-cluster dominance, the verified semantic_dedup machinery) →
    funnel census plus the survivor set's worst cluster share (the
    balance number an IVF index builder checks before freezing lists).
    Every stage is the already-hash-verified construction; the funnel
    composes them without new primitives. Exact-dedup shuffles only
    (vkey, id); the semantic stage is the bounded-k kmeans prefix."""
    from videos_to_tfrecords_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    sem = semantic_dedup(
        emb, k="auto", iters=_IVF_ITERS, threshold_scaled=_SEMDEDUP_THR
    ).select("vec_id", "cid", F.col("kept").alias("sem_keep"))
    vkey = F.concat_ws(
        ",",
        F.expr(
            "transform(embedding, x ->"
            " CAST(CAST(round(x * 1000000) AS BIGINT) AS STRING))"
        ),
    )
    from pyspark.sql import Window

    keep1 = emb.select("vec_id", vkey.alias("vkey")).select(
        "vec_id",
        (
            F.col("vec_id")
            == F.min("vec_id").over(Window.partitionBy("vkey"))
        ).alias("exact_keep"),
    )
    j = keep1.join(sem, "vec_id").localCheckpoint(eager=True)
    fin = j.agg(
        F.count("*").cast("long").alias("total"),
        F.sum(F.when(F.col("exact_keep"), 1).otherwise(0))
        .cast("long")
        .alias("exact_kept"),
        F.sum(
            F.when(F.col("exact_keep") & F.col("sem_keep"), 1).otherwise(0)
        )
        .cast("long")
        .alias("final_kept"),
    )
    cl = (
        j.filter(F.col("exact_keep") & F.col("sem_keep"))
        .groupBy("cid")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("long").alias("maxc"))
    )
    both = F.broadcast(fin).crossJoin(F.broadcast(cl))
    return (
        fin.select(F.lit("total").alias("stage"), F.col("total").alias("value"))
        .unionByName(
            fin.select(F.lit("exact_kept").alias("stage"), F.col("exact_kept").alias("value"))
        )
        .unionByName(
            fin.select(F.lit("final_kept").alias("stage"), F.col("final_kept").alias("value"))
        )
        .unionByName(
            both.select(
                F.lit("max_cluster_share_ppm").alias("stage"),
                F.expr("CAST((1000000 * maxc) div final_kept AS BIGINT)").alias(
                    "value"
                ),
            )
        )
    )


def _fisher_oracle() -> str:
    return f"""
WITH e AS (SELECT vec_id, label, {_IV} AS v FROM embeddings),
idx AS (SELECT unnest(range(1, (SELECT len(v) FROM e LIMIT 1) + 1)) AS k),
el AS (SELECT e.label, i.k AS dim, e.v[i.k] AS q FROM e, idx i),
lg AS (SELECT label, dim, CAST(count(*) AS HUGEINT) AS nl,
              CAST(sum(q) AS HUGEINT) AS s,
              CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq
       FROM el GROUP BY 1, 2),
w AS (SELECT dim, CAST(sum((nl * qq - s * s) // nl) AS HUGEINT) AS within_ss,
             CAST(sum(nl) AS HUGEINT) AS n,
             CAST(sum(s) AS HUGEINT) AS st,
             CAST(sum(qq) AS HUGEINT) AS qt
      FROM lg GROUP BY 1),
f AS (SELECT dim, within_ss,
             GREATEST(CAST(0 AS HUGEINT),
                      (n * qt - st * st) // n - within_ss) AS between_ss
      FROM w)
SELECT CAST(dim - 1 AS BIGINT) AS dim,
       CAST(within_ss AS BIGINT) AS within_ss,
       CAST(between_ss AS BIGINT) AS between_ss,
       CAST(CASE WHEN within_ss = 0 THEN 0
                 ELSE (1000000 * between_ss) // within_ss END AS BIGINT)
         AS fisher_x1e6
FROM f
"""


@query("fisher_discriminant_ratio", _fisher_oracle())
def q_fisher_discriminant_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension Fisher discriminant ratio (between-class SS over
    within-class SS — the classic class-separability screen): which
    embedding dimensions actually carry the label signal. The
    variance-based complement to embedding_alignment_margin's pairwise
    view, and the feature-selection input for a cheap linear probe.

    Exactness: per-(label, dim) sufficient statistics are exact int64
    sums; each within-class sum of squares floors per label
    ((n_l·Σx² − (Σx)²) // n_l — the n·Σx²−(Σx)² class, closed in
    HUGEINT/DECIMAL(38,0)); between = total − within, clamped at 0 (the
    per-label floors can shave ulps). One posexplode scan + one
    (label, dim) aggregate — label-count-bounded state, map-side
    partials."""
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> CAST(round(x * 1000000) AS BIGINT))"
            )
        ).alias("dim", "q"),
    )
    lg = el.groupBy("label", "dim").agg(
        F.count("*").cast("decimal(38,0)").alias("nl"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("qq"),
    )
    w = lg.groupBy("dim").agg(
        F.sum(F.expr("(nl * qq - s * s) div nl").cast("decimal(38,0)")).alias(
            "within_ss"
        ),
        F.sum("nl").alias("n"),
        F.sum("s").alias("st"),
        F.sum("qq").alias("qt"),
    )
    f = w.select(
        "dim",
        "within_ss",
        F.greatest(
            F.lit(0).cast("decimal(38,0)"),
            F.expr("(n * qt - st * st) div n").cast("decimal(38,0)")
            - F.col("within_ss"),
        ).alias("between_ss"),
    )
    return f.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("within_ss").cast("long").alias("within_ss"),
        F.col("between_ss").cast("long").alias("between_ss"),
        F.expr(
            "CAST(CASE WHEN within_ss = 0 THEN 0"
            " ELSE (1000000 * between_ss) div within_ss END AS BIGINT)"
        ).alias("fisher_x1e6"),
    )


def _twonn_oracle() -> str:
    lnq = "CAST(floor(1000000000 * ln(CAST({x} AS DOUBLE))) AS BIGINT)"
    return f"""
WITH kq AS (SELECT GREATEST(2, count(*) // 200) AS m FROM embeddings),
e AS (SELECT vec_id, {_IV} AS v FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM kq) = 0),
t AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM kq) != 0),
s AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
             {_int_dist2('a.v', 'b.v')} AS d2
      FROM q a, t b),
r AS (SELECT qid, d2, row_number() OVER
        (PARTITION BY qid ORDER BY d2, cid) AS rnk FROM s),
p AS (SELECT qid,
             max(CASE WHEN rnk = 1 THEN d2 END) AS d1,
             max(CASE WHEN rnk = 2 THEN d2 END) AS d2_
      FROM r WHERE rnk <= 2 GROUP BY qid),
v AS (SELECT {lnq.format(x='d2_')} - {lnq.format(x='d1')} AS diff
      FROM p WHERE d1 > 0 AND d2_ IS NOT NULL),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(diff) AS BIGINT) AS sd
        FROM v)
SELECT n AS n_probes,
       CAST(CASE WHEN sd = 0 THEN 0
                 ELSE (2 * n * 1000000000 * CAST(1000 AS BIGINT)) // sd END
         AS BIGINT) AS intrinsic_dim_x1e3
FROM agg
"""


@query("embedding_intrinsic_dimension", _twonn_oracle())
def q_embedding_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate of the embedding manifold (Facco
    et al. 2017 — public): ID = 2n / Σ ln(d₂/d₁) over each probe's two
    exact nearest neighbors — the diagnostic that says how many of the 64
    ambient dimensions the data actually occupies (a low ID justifies
    aggressive JL/PCA compression; ID ≈ ambient means the encoder isn't
    compressing at all). Pairs with embedding_anisotropy (global shape)
    and fisher_discriminant_ratio (label alignment) as the
    embedding-geometry panel.

    Probe bounded (~200, corpus-derived modulus); neighbor distances come
    from the collected-matrix euclidean kernel
    (operators/similarity.euclidean_bottom2); each log ratio is the
    difference of per-row quantized-lns of exact int64 squared distances
    (ln d₂²−ln d₁² = 2 ln(d₂/d₁) — the 2 cancels into the estimator), so
    both engines sum identical terms; duplicate-point probes (d₁ = 0)
    are excluded identically."""
    from videos_to_tfrecords_spark.operators.similarity import euclidean_bottom2

    emb = load_table(spark, sf_dir, "embeddings")
    m = max(2, int(emb.count()) // 200)
    probe = emb.filter(F.col("vec_id") % m == 0)
    corpus = emb.filter(F.col("vec_id") % m != 0)
    nn = euclidean_bottom2(probe, corpus)
    p = nn.groupBy("query_id").agg(
        F.max(F.when(F.col("rnk") == 1, F.col("dist2"))).alias("d1"),
        F.max(F.when(F.col("rnk") == 2, F.col("dist2"))).alias("d2_"),
    )
    lnq = lambda c: F.floor(
        F.lit(1000000000) * F.log(F.col(c).cast("double"))
    ).cast("long")
    v = p.filter((F.col("d1") > 0) & F.col("d2_").isNotNull()).select(
        (lnq("d2_") - lnq("d1")).alias("diff")
    )
    agg = v.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("diff").cast("long").alias("sd"),
    )
    return agg.select(
        F.col("n").alias("n_probes"),
        F.expr(
            "CAST(CASE WHEN sd = 0 THEN 0"
            " ELSE (2 * n * 1000000000 * CAST(1000 AS BIGINT)) div sd END"
            " AS BIGINT)"
        ).alias("intrinsic_dim_x1e3"),
    )


_PQ_M, _PQ_K, _PQ_ITERS = 4, 16, 1


def _pq_profile_oracle(m: int = _PQ_M, k: int = _PQ_K, iters: int = _PQ_ITERS) -> str:
    """SQL twin of operators/similarity.pq_profile: m independent
    prefix-namespaced kmeans chains over list_slice subspaces (dim read
    from the table at oracle-build time is avoided — the slice bounds use
    a fixed dim/m of the 64-dim embeddings table), unioned into one
    (subspace, code, n_vecs, distortion_k) profile."""
    dim, width = 64, 64 // m
    parts: list[str] = []
    selects: list[str] = []
    for s in range(m):
        lo, hi = s * width + 1, (s + 1) * width
        iv = (
            f"list_transform(list_slice(embedding::DOUBLE[], {lo}, {hi}),"
            " x -> CAST(round(x * 1000000) AS BIGINT))"
        )
        chain = _kmeans_assign_parts(k, iters, prefix=f"q{s}", iv_expr=iv)
        if s > 0:
            chain[0] = chain[0].removeprefix("WITH ")
        parts += chain
        selects.append(
            f"""SELECT CAST({s} AS BIGINT) AS subspace,
       CAST(cid AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(d2 // 1000) AS BIGINT) AS distortion_k
FROM q{s}af GROUP BY cid"""
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@query("pq_codebook_profile", _pq_profile_oracle())
def q_pq_codebook_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (m=4 subspaces × k=16 codewords over the 64-dim
    embeddings): train per-subspace codebooks with deterministic integer
    kmeans-lite and profile the encode — per (subspace, code) member count
    and quantization distortion. The PQ leg of the ANN surface
    (IVF/LSH/multiprobe/brute-force already covered); hash-exact down to
    the trained codebooks because init and Lloyd are integer-deterministic."""
    from videos_to_tfrecords_spark.operators.similarity import pq_profile

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_profile(emb, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)


def _pq_adc_recall_oracle(
    m: int = _PQ_M, k_codes: int = _PQ_K, iters: int = _PQ_ITERS, k: int = 3
) -> str:
    """SQL twin of operators/similarity.pq_adc_recall: the same m
    namespaced kmeans chains give per-subspace codes (q{s}af) and
    codebooks (q{s}c{iters}); ADC sums the per-subspace dist² between each
    bounded query's subvector and every candidate's codeword; recall
    compares ADC top-k against exact full-dim int dist² top-k."""
    dim, width = 64, 64 // m
    parts: list[str] = []
    for s in range(m):
        lo, hi = s * width + 1, (s + 1) * width
        iv = (
            f"list_transform(list_slice(embedding::DOUBLE[], {lo}, {hi}),"
            " x -> CAST(round(x * 1000000) AS BIGINT))"
        )
        chain = _kmeans_assign_parts(k_codes, iters, prefix=f"q{s}", iv_expr=iv)
        if s > 0:
            chain[0] = chain[0].removeprefix("WITH ")
        parts += chain
    parts.append(f"fe AS (SELECT vec_id, {_IV} AS iv FROM embeddings)")
    parts.append(
        "qm AS (SELECT GREATEST(1, count(*) // 80) AS qmod FROM embeddings)"
    )
    parts.append(
        "qs AS (SELECT vec_id AS query_id FROM embeddings, qm"
        " WHERE vec_id % qmod = 0)"
    )
    terms = []
    for s in range(m):
        terms.append(
            f"""SELECT qq.vec_id AS query_id, a.vec_id AS cand_id,
       {_int_dist2("qq.iv", "cw.civ")} AS d
FROM q{s}e qq
JOIN qs ON qs.query_id = qq.vec_id
JOIN q{s}af a ON a.vec_id != qq.vec_id
JOIN q{s}c{iters} cw ON cw.cid = a.cid"""
        )
    parts.append(
        "adc AS (SELECT query_id, cand_id, CAST(sum(d) AS BIGINT) AS adc FROM ("
        + "\nUNION ALL\n".join(terms)
        + ") GROUP BY 1, 2)"
    )
    parts.append(
        f"""ann AS (SELECT query_id, cand_id FROM (
  SELECT query_id, cand_id,
         row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS rn
  FROM adc) WHERE rn <= {k})"""
    )
    parts.append(
        f"""ex AS (SELECT query_id, cand_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_int_dist2("q.iv", "c.iv")}, c.vec_id) AS rn
  FROM fe q JOIN qs ON qs.query_id = q.vec_id
  JOIN fe c ON c.vec_id != q.vec_id) WHERE rn <= {k})"""
    )
    parts.append(
        "h AS (SELECT CAST(count(*) AS BIGINT) AS hits FROM ann"
        " JOIN ex USING (query_id, cand_id))"
    )
    parts.append("nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qs)")
    return (
        ",\n".join(parts)
        + f"""
SELECT nq.n AS n_queries, h.hits AS hits,
       CAST((1000 * h.hits) // (nq.n * {k}) AS BIGINT) AS recall_x1000
FROM nq, h"""
    )


def _ivfpq_adc_topk_oracle(
    k_coarse: int = _IVF_K,
    coarse_iters: int = _IVF_ITERS,
    nprobe: int = _IVF_NPROBE,
    m: int = _PQ_M,
    k_codes: int = _PQ_K,
    pq_iters: int = _PQ_ITERS,
    k: int = 3,
) -> str:
    """SQL twin of operators/similarity.ivfpq_adc_topk (FAISS-IVFPQ, raw
    subvectors): the coarse full-dim kmeans chain (prefix g) gives
    inverted lists, m namespaced subspace chains (prefix q{s}) give codes
    and codebooks, probes rank coarse centroids per bounded query, and
    ADC sums per-subspace dist² between the query's subvector and each
    PROBED candidate's codeword."""
    dim, width = 64, 64 // m
    parts = _kmeans_assign_parts(k_coarse, coarse_iters, prefix="g")
    for s in range(m):
        lo, hi = s * width + 1, (s + 1) * width
        iv = (
            f"list_transform(list_slice(embedding::DOUBLE[], {lo}, {hi}),"
            " x -> CAST(round(x * 1000000) AS BIGINT))"
        )
        chain = _kmeans_assign_parts(k_codes, pq_iters, prefix=f"q{s}", iv_expr=iv)
        chain[0] = chain[0].removeprefix("WITH ")
        parts += chain
    parts.append(
        "qm AS (SELECT GREATEST(1, count(*) // 80) AS qmod FROM embeddings)"
    )
    parts.append(
        "qs AS (SELECT vec_id AS query_id FROM embeddings, qm"
        " WHERE vec_id % qmod = 0)"
    )
    parts.append(
        f"""pr AS (SELECT query_id, cid FROM (
  SELECT qs.query_id, c.cid,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {_int_dist2("qe.iv", "c.civ")}, c.cid) AS rn
  FROM ge qe JOIN qs ON qs.query_id = qe.vec_id, gc{coarse_iters} c)
 WHERE rn <= {nprobe})"""
    )
    parts.append(
        """cl AS MATERIALIZED (SELECT pr.query_id, a.vec_id AS cand_id
  FROM pr JOIN gaf a ON a.cid = pr.cid AND a.vec_id != pr.query_id)"""
    )
    terms = []
    for s in range(m):
        terms.append(
            f"""SELECT cl.query_id, cl.cand_id,
       {_int_dist2("qq.iv", "cw.civ")} AS d
FROM cl JOIN q{s}e qq ON qq.vec_id = cl.query_id
JOIN q{s}af a ON a.vec_id = cl.cand_id
JOIN q{s}c{pq_iters} cw ON cw.cid = a.cid"""
        )
    parts.append(
        "adc AS (SELECT query_id, cand_id, CAST(sum(d) AS BIGINT) AS adc_dist"
        " FROM (" + "\nUNION ALL\n".join(terms) + ") GROUP BY 1, 2)"
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT query_id, cand_id, adc_dist, CAST(rn AS BIGINT) AS rnk FROM (
  SELECT query_id, cand_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, cand_id) AS rn
  FROM adc)
WHERE rn <= {k}"""
    )


@query("ivfpq_adc_topk", _ivfpq_adc_topk_oracle())
def q_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k (FAISS IVFPQ composition): coarse inverted lists +
    per-subspace PQ codes, bounded queries scan only nprobe lists and
    rank by integer ADC — the billion-scale ANN serving architecture as
    one hash-checked query. One corpus scan emits (cid, codes); probes
    and LUTs broadcast; only candidate rows shuffle for the per-query
    top-k."""
    from videos_to_tfrecords_spark.operators.similarity import ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_adc_topk(
        emb,
        k_coarse=_IVF_K,
        coarse_iters=_IVF_ITERS,
        nprobe=_IVF_NPROBE,
        m=_PQ_M,
        k_codes=_PQ_K,
        pq_iters=_PQ_ITERS,
        k=3,
    )


@query("pq_adc_recall", _pq_adc_recall_oracle())
def q_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search accuracy: recall@3 of ADC ranking
    (m=4 × k=16 integer codebooks, LUT-gather scoring) against exact
    full-dimension distance for a bounded query set — the measurement that
    gates swapping exact vectors for 4-byte PQ codes. One corpus scan
    computes codes, ADC, and exact scores; only per-batch top-k rows
    shuffle."""
    from videos_to_tfrecords_spark.operators.similarity import pq_adc_recall

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_recall(emb, m=_PQ_M, k_codes=_PQ_K, iters=_PQ_ITERS, k=3)
