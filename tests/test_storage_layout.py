"""Storage-layout scale techniques: partitioned writes with partition
pruning, and bucketed tables giving shuffle-free joins."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from videos_to_tfrecords_spark.operators.split import hash_bucket_split
from videos_to_tfrecords_spark.sources.tables import load_table
from tests.test_plans import plan_of


def test_partitioned_write_prunes(spark, sf_dir):
    """df.write.partitionBy('dataset') + a dataset filter on read must show
    PartitionFilters (only one directory scanned) — the layout that makes
    per-split training reads at 100 TB touch 1/3 of the data."""
    ev = hash_bucket_split(load_table(spark, sf_dir, "events"), "event_id")
    with tempfile.TemporaryDirectory() as out:
        path = os.path.join(out, "events_by_split")
        ev.write.mode("overwrite").partitionBy("dataset").parquet(path)
        assert sorted(
            d for d in os.listdir(path) if d.startswith("dataset=")
        ) == ["dataset=Test", "dataset=Train", "dataset=Val"]
        back = spark.read.parquet(path).filter(F.col("dataset") == "Val")
        plan = plan_of(back)
        assert "PartitionFilters: [isnotnull(dataset" in plan
        n_val = back.count()
        assert n_val == ev.filter(F.col("dataset") == "Val").count()


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """bucketBy on the join key co-locates both sides: the join plan has no
    Exchange — the pre-shuffled layout big recurring joins want."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # external bucketed tables (warehouse dir is a static conf — use paths)
    orders.write.mode("overwrite").option("path", str(tmp_path / "orders_b")).bucketBy(
        4, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").option("path", str(tmp_path / "lineitem_b")).bucketBy(
        4, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("lineitem_b")
    # small tables would broadcast; force the sort-merge path the demo is about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("orders_b")
            .join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        # bucketed scans feed the join directly: the ONLY shuffle is the
        # final groupBy on o_orderpriority
        assert plan.count("Exchange hashpartitioning") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    got = {r.o_orderpriority: r.n for r in j.collect()}
    want = {
        r.o_orderpriority: r.n
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
