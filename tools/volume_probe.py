"""Measure the BINDING data volumes behind the sf1 watch-list exponents
(VERDICT r6 #5): for each ≥0.90-exponent query family, count the
intermediate whose size the plan's cost is proportional to, at two SFs,
so a near-linear wall-time exponent can be attributed to near-linear DATA
(inherent) rather than plan overhead. Prints one JSON line per volume:
{"volume": name, "sf0.1": n, "sf1": n, "ratio": r}.

Usage: python tools/volume_probe.py [sf_small_dir] [sf_big_dir]
Defaults: /root/testdata/sf0.1  .scale_probe/sf1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from videos_to_tfrecords_spark.session import get_spark  # noqa: E402
from videos_to_tfrecords_spark.sources.tables import load_table  # noqa: E402


def span_volumes(spark, sf_dir: str) -> dict[str, int]:
    """Span-dedup family (dup_span_length_histogram 0.93,
    cross_doc_span_removal 0.91): cost ∝ total n-token windows (the
    inverted-index shuffle) + flagged occurrences (everything after the
    hash→doc-count join)."""
    from videos_to_tfrecords_spark.operators.dedup import window_hash_table

    sh = window_hash_table(load_table(spark, sf_dir, "documents"), n=8)
    sh = sh.localCheckpoint(eager=True)
    total = sh.count()
    multi = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    flagged = sh.join(multi, "h").count()
    return {"span_windows_total": total, "span_flagged_occurrences": flagged}


def semdedup_volume(spark, sf_dir: str) -> dict[str, int]:
    """semantic_dedup_keep (0.94): cost ∝ within-cluster pairwise dots =
    Σ C(n_c, 2) over auto-k clusters — SemDeDup bounds this to
    ~n·target_cluster_rows/2 by scaling k with n."""
    from videos_to_tfrecords_spark.operators.similarity import (
        _SEMDEDUP_TARGET_CLUSTER_ROWS,
        kmeans_lite,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    k = max(8, (n + _SEMDEDUP_TARGET_CLUSTER_ROWS - 1) // _SEMDEDUP_TARGET_CLUSTER_ROWS)
    cents = kmeans_lite(emb, "vec_id", "embedding", k=k, iters=2)

    from videos_to_tfrecords_spark.operators.similarity import (
        _dist2_matrix,
        _to_int_matrix,
    )

    @F.pandas_udf("int")
    def assign_cid(vs: pd.Series) -> pd.Series:
        vi = _to_int_matrix(vs)
        return pd.Series(
            np.argmin(_dist2_matrix(vi, cents), axis=1).astype("int32")
        )

    sizes = (
        emb.select(assign_cid(F.col("embedding")).alias("cid"))
        .groupBy("cid")
        .count()
    )
    pairs = sizes.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long")
    ).collect()[0][0]
    return {"semdedup_within_cluster_pairs": int(pairs), "semdedup_k": int(k)}


def minhash_volume(spark, sf_dir: str) -> dict[str, int]:
    """minhash_estimate_calibration (0.90): cost ∝ LSH banding candidate
    pairs (the verify join's left side)."""
    from videos_to_tfrecords_spark.functions.hashing import h15
    from videos_to_tfrecords_spark.operators.dedup import (
        lsh_candidate_pairs,
        shingle_table,
    )

    p = 1_000_000_007
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_table(docs).distinct()
    h = h15(F.col("s"))
    x1 = h % F.lit(1 << 30)
    x2 = (h / F.lit(1 << 30)).cast("long")
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min((x1 * (2 * i + 1) + x2 * (4 * i + 3) + i) % p).alias(f"sig{i}")
            for i in range(16)
        ]
    )
    return {"minhash_lsh_candidate_pairs": lsh_candidate_pairs(sig).count()}


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_probe",
            "sf1",
        )
    )
    spark = get_spark("volume_probe")
    out: dict[str, dict[str, int]] = {}
    for name, fn in (
        ("span", span_volumes),
        ("semdedup", semdedup_volume),
        ("minhash", minhash_volume),
    ):
        s = fn(spark, small)
        b = fn(spark, big)
        for key in s:
            out[key] = {"sf0.1": s[key], "sf1": b[key]}
            r = b[key] / s[key] if s[key] else float("nan")
            print(
                json.dumps(
                    {"volume": key, "sf0.1": s[key], "sf1": b[key], "ratio": round(r, 3)}
                )
            )


if __name__ == "__main__":
    main()
