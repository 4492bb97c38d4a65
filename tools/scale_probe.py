"""Measure sf0.1 -> sf1 (10x rows) wall-time scaling for the most
expensive query families (VERDICT r03 #7). Prints one JSON line per query:
{"query", "t_sf01", "t_sf1", "ratio", "exponent"} where exponent =
log10(t_sf1/t_sf01) (1.0 = linear, 2.0 = quadratic)."""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pandas as pd  # noqa: F401

import __spark_entry__ as entrymod
from videos_to_tfrecords_spark.session import get_spark

FAMILIES = [
    "doc_minhash_lsh_pairs",      # minhash + LSH banding
    "doc_ngram_jaccard_pairs",    # prefix-filtered similarity self-join
    "graph_triangles_copurchase", # adjacency-intersection triangles
    "ann_topk_lsh",               # sign-LSH ANN (auto planes)
    "graph_pagerank_trade",       # 5-iteration integer PageRank
    "doc_simhash_hamming_pairs",  # simhash + pigeonhole pairing
    "doc_exact_dedup",            # exact dedup baseline
    # round-4 session additions
    "fuzzy_name_pairs",           # FastSS deletion-signature join
    "graph_link_prediction",      # capped common-neighbor wedges
    "graph_local_clustering",     # per-node triangle credits
    "graph_kcore_trade",          # 4-round synchronous peel
    "media_phash_dup_pairs",      # phash bands + popcount verify
    "packed_concat_spans",        # two-level distributed prefix sum
    "kmeans_cluster_profile",     # 2-iteration integer Lloyd
    "table_profile_lineitem",     # melt + two-phase profile agg
]
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale_probe", "sf1")


def timed(fn, spark, sf_dir, n=2):
    import gc

    runs = []
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
        gc.collect()  # release checkpoint blocks between runs (bench.py note)
    return min(runs)


def main():
    spark = get_spark("scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    out = []
    names = sys.argv[1:] or FAMILIES
    for name in names:
        fn = qs[name]
        t01 = timed(fn, spark, "/root/testdata/sf0.1")
        t1 = timed(fn, spark, SF1)
        rec = {
            "query": name,
            "t_sf01": round(t01, 2),
            "t_sf1": round(t1, 2),
            "ratio": round(t1 / t01, 2),
            "exponent": round(math.log10(t1 / t01), 2),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(SF1), "scale_probe_results.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
