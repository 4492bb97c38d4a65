"""Stage-level profiling of the shared heavy cores (guide §1: measure
first, empirical loop). Times each sub-pipeline of a core with the noop
sink so the cost attribution inside one query is visible — bench.py only
sees whole queries.

Usage: python tools/profile_cores.py [sf_dir] [core ...]
Cores: ngram, adamic, pagerank, ivfpq, rag
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401
from pyspark.sql import functions as F


def t(label, df):
    sp = df.sparkSession
    sp.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"  {label:45s} {dt:7.2f} s", flush=True)
    sp.sparkContext.setJobDescription(None)
    return dt


def profile_ngram(spark, sf_dir):
    from videos_to_tfrecords_spark.functions.hashing import h15
    from videos_to_tfrecords_spark.operators.dedup import (
        jaccard_verify_from_texts,
        ngram_jaccard_pairs,
        shingle_table,
    )
    from videos_to_tfrecords_spark.sources.tables import load_table
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    print("== ngram_jaccard_pairs decomposition ==")
    sh = shingle_table(docs).persist()
    t("shingle_table (persist+materialize)", sh)
    freq = sh.groupBy("s").agg(F.count("*").alias("df_s"))
    t("freq groupBy(s)", freq)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("d_len"))
    t("sizes groupBy(id)", sizes)
    worder = Window.partitionBy("doc_id").orderBy("df_s", "s")
    tx = 500
    prefix_keep = F.expr(f"d_len - ((d_len * {tx} + 999) div 1000) + 1")
    prefix = (
        sh.join(freq, "s")
        .join(sizes, "doc_id")
        .withColumn("rn", F.row_number().over(worder))
        .filter(F.col("rn") <= prefix_keep)
        .select("doc_id", "s", "d_len", "rn")
    )
    t("prefix (join+join+window+filter)", prefix)
    prefix_c = prefix.persist()
    prefix_c.write.format("noop").mode("overwrite").save()
    sa, sb = prefix_c.alias("sa"), prefix_c.alias("sb")
    pos_ok = F.lit(1) + F.least(
        F.col("sa.d_len") - F.col("sa.rn"), F.col("sb.d_len") - F.col("sb.rn")
    ) >= F.expr(
        f"((sa.d_len + sb.d_len) * {tx} + {1000 + tx - 1}) div {1000 + tx}"
    )
    pairs = (
        sa.join(
            sb,
            (F.col("sa.s") == F.col("sb.s"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id"))
            & (F.col("sb.d_len") * tx <= F.col("sa.d_len") * 1000)
            & (F.col("sa.d_len") * tx <= F.col("sb.d_len") * 1000)
            & pos_ok,
        )
        .select(F.col("sa.doc_id").alias("id_a"), F.col("sb.doc_id").alias("id_b"))
        .distinct()
    )
    t("self-join+distinct (from cached prefix)", pairs)
    pairs_c = pairs.persist()
    pairs_c.write.format("noop").mode("overwrite").save()
    out = jaccard_verify_from_texts(pairs_c, docs, threshold_x1000=500)
    t("verify (from cached pairs)", out)
    for c in (sh, prefix_c, pairs_c):
        c.unpersist(blocking=False)
    t("FULL ngram_jaccard_pairs", ngram_jaccard_pairs(docs, threshold_x1000=500))


def profile_adamic(spark, sf_dir):
    from videos_to_tfrecords_spark.plans.graph_queries import _copurchase_und
    from videos_to_tfrecords_spark.operators.graph import adamic_adar_pairs

    print("== graph_adamic_adar_topk decomposition ==")
    und = _copurchase_und(spark, sf_dir)
    t("copurchase und derivation", und)
    undc = und.persist()
    undc.write.format("noop").mode("overwrite").save()
    t("adamic_adar_pairs (from cached und)", adamic_adar_pairs(undc))
    undc.unpersist(blocking=False)
    t("FULL adamic_adar (derivation+pairs)", adamic_adar_pairs(_copurchase_und(spark, sf_dir)))


def profile_pagerank(spark, sf_dir):
    from videos_to_tfrecords_spark.plans.graph_queries import _trade_edges
    from videos_to_tfrecords_spark.operators.graph import pagerank_integer

    print("== graph_pagerank_trade decomposition ==")
    e = _trade_edges(spark, sf_dir)
    t("trade edges derivation", e)
    t("FULL pagerank 5 iter", pagerank_integer(_trade_edges(spark, sf_dir)))


def profile_ivfpq(spark, sf_dir):
    from videos_to_tfrecords_spark.operators.similarity import (
        ivfpq_adc_topk,
        kmeans_lite,
    )
    from videos_to_tfrecords_spark.sources.tables import load_table

    print("== ivfpq_adc_topk decomposition ==")
    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.time()
    kmeans_lite(emb, k=8, iters=2)
    print(f"  {'coarse kmeans_lite (3 jobs)':45s} {time.time()-t0:7.2f} s")
    t0 = time.time()
    kmeans_lite(
        emb.select(F.col("vec_id"), F.slice(F.col("embedding"), 1, 2).alias("_subv")),
        "vec_id",
        "_subv",
        k=16,
        iters=1,
    )
    print(f"  {'one PQ book kmeans_lite (2 jobs)':45s} {time.time()-t0:7.2f} s")
    t("FULL ivfpq_adc_topk", ivfpq_adc_topk(emb))


def profile_rag(spark, sf_dir):
    from videos_to_tfrecords_spark.plans.pipeline_queries import _rag_ranked

    print("== _rag_ranked core ==")
    t("FULL _rag_ranked", _rag_ranked(spark, sf_dir))


CORES = {
    "ngram": profile_ngram,
    "adamic": profile_adamic,
    "pagerank": profile_pagerank,
    "ivfpq": profile_ivfpq,
    "rag": profile_rag,
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or list(CORES)
    from videos_to_tfrecords_spark.session import get_spark

    spark = get_spark("profile_cores")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).write.format("noop").mode("overwrite").save()
    for n in names:
        CORES[n](spark, sf_dir)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
