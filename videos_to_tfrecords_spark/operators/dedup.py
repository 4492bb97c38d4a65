"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
(SURVEY §7.1 M5 — first-class engine components for LLM-data pipelines).

Scale design notes (the 100 TB posture):
- exact dedup: hash-groupBy on a 128-bit content hash — one shuffle of
  (hash, id), never of the text itself.
- MinHash+LSH: signatures are computed in ONE pass over exploded shingles
  (16 mins as columnar aggregates — no per-permutation jobs); banding
  explodes 8 small rows per doc; the band-bucket self-join only materializes
  same-bucket pairs, and exact-Jaccard verification touches only candidate
  docs. This is the classic shingle→minhash→band→bucket-join pipeline and
  every step is a built-in DataFrame op.
- SimHash: 16 conditional sums per doc in a single aggregation — near-dups
  land on equal/near fingerprints; grouping by fingerprint is exact-dedup
  machinery reused.
- all hashes are the portable md5-prefix (functions/hashing.py) so results
  are oracle-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.hashing import h15
from videos_to_tfrecords_spark.functions.textfn import shingles, tokens

N_PERM = 16
BAND_ROWS = 2  # 8 bands × 2 rows: P(miss) at J=0.9 ≈ (1-0.81)^8 ≈ 1.7e-6
N_BANDS = N_PERM // BAND_ROWS


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on content hash: every row keeps its canonical (minimum)
    id within its md5 group. Only (md5, id) shuffles."""
    keyed = df.select(id_col, F.md5(F.col(text_col)).alias("content_md5"))
    w = Window.partitionBy("content_md5")
    return keyed.select(
        id_col,
        "content_md5",
        F.min(id_col).over(w).alias("canonical_id"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_duplicate"),
    )


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs — the unit of Jaccard similarity."""
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, n))).alias("s")
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", n_perm: int = N_PERM) -> DataFrame:
    """One columnar aggregation computes all permutations' minima."""
    mins = [F.min(h15("s", salt=str(i))).alias(f"sig{i}") for i in range(n_perm)]
    return sh.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str = "doc_id", n_perm: int = N_PERM, band_rows: int = BAND_ROWS
) -> DataFrame:
    """Band the signature, bucket-join within bands → distinct (a, b) pairs.

    The exploded band table is tiny (n_bands rows/doc of (band, key, id));
    the self-join is an equi-join on (band, key) that only same-bucket rows
    survive — the shuffle is proportional to docs, not pairs."""
    n_bands = n_perm // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"sig{b * band_rows + r}").cast("string") for r in range(band_rows)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id", threshold_x1000: int = 500
) -> DataFrame:
    """Exact Jaccard on candidate pairs (common / (|A|+|B|-common)),
    integer-scaled ×1000 so the comparison is engine-exact."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    common = (
        pairs.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, (F.col("id_b") == F.col(f"sb.{id_col}")) & (F.col("sa.s") == F.col("sb.s")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    j = (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "j_x1000",
            F.floor(
                F.lit(1000) * F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).cast("long"),
        )
    )
    return j.filter(F.col("j_x1000") >= threshold_x1000).select("id_a", "id_b", "j_x1000")


def minhash_lsh_dedup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", threshold_x1000: int = 500
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → candidate
    pairs → exact-Jaccard verification. False positives are removed by the
    verify step; the band geometry makes misses negligible above the
    threshold (see module docstring)."""
    sh = shingle_table(df, id_col, text_col)
    sig = minhash_signatures(sh, id_col)
    cand = lsh_candidate_pairs(sig, id_col)
    return jaccard_verify(cand, sh, id_col, threshold_x1000)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", threshold_x1000: int = 500
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via the inverted shingle index (pairs
    sharing ≥1 shingle). Quadratic in bucket size — the exact baseline the
    LSH path approximates; at 100 TB use minhash_lsh_dedup_pairs."""
    sh = shingle_table(df, id_col, text_col)
    sa, sb = sh.alias("sa"), sh.alias("sb")
    pairs = (
        sa.join(sb, (F.col("sa.s") == F.col("sb.s")) & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")))
        .groupBy(F.col(f"sa.{id_col}").alias("id_a"), F.col(f"sb.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    j = (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "j_x1000",
            F.floor(
                F.lit(1000) * F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).cast("long"),
        )
    )
    return j.filter(F.col("j_x1000") >= threshold_x1000).select("id_a", "id_b", "j_x1000")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-bit ±1 votes of (multiset) token hashes,
    assembled into a ``bits``-wide integer. Single explode + one aggregation."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    th = h15("tok", salt="tok")
    votes = [
        F.sum(
            F.when(F.shiftright(th, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sh = F.lit(0).cast("long")
    for b in range(bits):
        sh = sh + F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(0)
    return agg.select(F.col(id_col), sh.cast("long").alias("simhash"))
