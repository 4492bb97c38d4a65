"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crop_video query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
twin for each hash-checkable query. Implementations live in
``videos_to_tfrecords_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing the query modules populates the registry
import videos_to_tfrecords_spark.plans.reference_queries  # noqa: F401,E402
import videos_to_tfrecords_spark.plans.relational_queries  # noqa: F401,E402

try:  # extension modules land incrementally; keep the contract importable
    import videos_to_tfrecords_spark.plans.text_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.similarity_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.pipeline_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.advanced_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.tpch_queries  # noqa: F401,E402
except ImportError:
    pass
try:
    import videos_to_tfrecords_spark.plans.graph_queries  # noqa: F401,E402
except ImportError:
    pass

from videos_to_tfrecords_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Queries already hash-verified by the driver in CORRECTNESS_r01/r02. The
# driver's per-round snapshot only covers a prefix of the registry, so we
# order never-driver-checked (and newly added) queries FIRST and push these
# previously-verified ones to the back — every query gets driver coverage
# across rounds without dropping any from the registry.
_DRIVER_VERIFIED_R1_R2 = (
    "crop_video_events", "tumbling_window_stats", "full_video_sequences",
    "single_frame_sequences", "filename_extension_filter",
    "filename_extract_label", "hash_bucket_split_counts",
    "random_split_sizes", "shuffle_preserves_multiset",
    "frame_downsample_buckets", "arithmetic_normalize", "url_parsing",
    "timestamp_formatting", "sliding_window_stats_paned", "pricing_summary",
    "customers_by_region", "revenue_by_priority", "customers_with_orders",
    "customers_without_orders", "order_status_set_ops",
    "top_orders_per_customer", "running_quantity_by_supplier",
    "distinct_flag_status", "rollup_quantity", "pivot_status_quantity",
    "global_top_orders", "distinct_parts_per_flag", "approx_distinct_parts",
    "json_props_histogram", "part_brand_stats", "supplier_shipped_revenue",
    "tpch_q3_shipping_priority", "tpch_q10_returned_items",
    "doc_token_stats", "doc_quality_score", "doc_lang_id",
    "doc_fingerprint", "doc_exact_dedup", "doc_minhash_lsh_pairs",
    "doc_ngram_jaccard_pairs", "doc_simhash", "doc_dup_clusters",
    "corpus_bigram_topk", "dedup_corpus_summary", "lateral_token_positions",
    "doc_normalized_text", "sequence_packing_summary", "stratified_sample",
    "doc_characteristic_terms", "quality_filter_by_lang",
    "ann_topk_bruteforce", "ann_topk_ivf", "ann_topk_lsh",
    "embedding_norm_by_label", "embedding_threshold_pairs", "multimodal_meta",
)


def _rotated(mapping: dict) -> dict:
    verified = set(_DRIVER_VERIFIED_R1_R2)
    order = [k for k in mapping if k not in verified]
    order += [k for k in mapping if k in verified]
    return {k: mapping[k] for k in order}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1 M0): the reference's crop_video mode —
    sliding event-time windows × key, P9 partial-window suppression,
    time-sorted sequence assembly — on /root/testdata/sf0.001."""
    return QUERIES["crop_video_events"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(ORACLES))
