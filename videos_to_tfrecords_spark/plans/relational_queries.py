"""Relational surface queries (SURVEY §2.7 — absent in the reference, free
from Spark SQL): joins of every flavor, aggregates, sorts/limits/top-k, set
ops, analytic window functions, rollup/pivot, approx sketches.

Money aggregates use exact integer cents (see plans/registry.py) so hashes
match DuckDB bit-for-bit. Scale notes are per-query docstrings: which side
broadcasts, where the shuffles are, why the plan survives 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.plans.registry import query
from videos_to_tfrecords_spark.sources.tables import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


@query(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))
                * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS charge_c6,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan→filter→groupBy-agg. The shipdate predicate and
    the 6-column projection push down to the parquet scan; the single shuffle
    is the 2-key groupBy with map-side partial aggregation — the canonical
    plan that scales linearly to 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    base_c = _cents("l_extendedprice")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    tax_pct = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(base_c).alias("sum_base_cents"),
            F.sum(base_c * (100 - disc_pct)).alias("revenue_c4"),
            F.sum(base_c * (100 - disc_pct) * (100 + tax_pct)).alias("charge_c6"),
            F.count("*").alias("n"),
        )
    )


@query(
    "customers_by_region",
    """
SELECT r_name, n_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ two dims. Both dims are broadcast (explicit hint;
    nation/region are tiny at every SF), so the join is shuffle-free — only
    the final groupBy exchanges. The plan a 1000-executor cluster wants."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(_cents("c_acctbal")).alias("acctbal_cents"),
        )
    )


@query(
    "revenue_by_priority",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def q_join_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact equi-join (orders×lineitem). Left unhinted: Catalyst/AQE
    picks sort-merge (both sides shuffle on the join key) and splits skewed
    partitions at runtime — the correct strategy when neither side fits in
    memory at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _cents("l_extendedprice") * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), F.sum(rev).alias("revenue_c4"))
    )


@query(
    "customers_with_orders",
    """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). Semi joins ship only the key column of the
    probe side — at scale, dramatically narrower than an inner join + distinct."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


@query(
    "customers_without_orders",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "order_status_set_ops",
    """
SELECT 'f_only' AS op, CAST(count(*) AS BIGINT) AS n FROM
  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
   EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
UNION ALL
SELECT 'both' AS op, CAST(count(*) AS BIGINT) AS n FROM
  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
   INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='O')
UNION ALL
SELECT 'either' AS op, CAST(count(*) AS BIGINT) AS n FROM
  (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
   UNION SELECT o_custkey FROM orders WHERE o_orderstatus='O')
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.7: the reference's 3-way split is the
    inverse of a union and never recombines). EXCEPT/INTERSECT/UNION with
    set (distinct) semantics in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")

    def count_as(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        count_as(f_cust.subtract(o_cust), "f_only")  # subtract = EXCEPT (set)
        .unionByName(count_as(f_cust.intersect(o_cust), "both"))
        .unionByName(count_as(f_cust.union(o_cust).distinct(), "either"))
    )


@query(
    "top_orders_per_customer",
    """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""",
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window function — one shuffle on the
    partition key, no global sort. The deterministic tie-break (orderkey)
    makes it hash-comparable."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", _cents("o_totalprice").alias("price_cents"), "rnk")
    )


@query(
    "running_quantity_by_supplier",
    """
WITH r AS (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
            PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_qty
  FROM lineitem
)
SELECT * FROM r WHERE l_orderkey % 25 = 0
""",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic running aggregate over a total (tie-broken) per-partition
    order; output subsampled so the compared result stays small while the
    window computes over everything."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.withColumn("run_qty", F.sum(F.col("l_quantity").cast("long")).over(w))
        .filter(F.col("l_orderkey") % 25 == 0)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "run_qty")
    )


@query(
    "distinct_flag_status",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — a groupBy-all-columns shuffle with map-side partial dedup."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "rollup_quantity",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total as NULL rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "pivot_status_quantity",
    """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus='O') AS BIGINT) AS qty_o,
       CAST(sum(CAST(l_quantity AS BIGINT)) FILTER (WHERE l_linestatus='F') AS BIGINT) AS qty_f
FROM lineitem GROUP BY l_returnflag
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rows → columns on a low-cardinality key. Values enumerated
    up-front so the plan is a single pass (no extra distinct-values job)."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("long")))
    )
    return piv.select(
        "l_returnflag", F.col("O").alias("qty_o"), F.col("F").alias("qty_f")
    )


@query(
    "global_top_orders",
    """
SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition top-K then a tiny driver merge, never a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", _cents("o_totalprice").alias("price_cents"))
    )


@query(
    "distinct_parts_per_flag",
    """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem GROUP BY l_returnflag
""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT (expand + two-phase agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("approx_distinct_parts")  # no oracle: HLL sketches differ per engine
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). Sketch values are
    implementation-specific so there is no cross-engine oracle; accuracy vs
    the exact count is pytest-asserted (±5%) in tests/test_relational.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )


@query(
    "json_props_histogram",
    r"""
SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON value extraction from the events.props payload (SURVEY §2.2
    extension). Implemented with get_json_object (Jackson, JVM-side); the
    oracle uses a regex so no DuckDB JSON extension is assumed."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


@query(
    "part_brand_stats",
    """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
       CAST(min(p_size) AS BIGINT) AS min_size,
       CAST(max(p_size) AS BIGINT) AS max_size,
       CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
FROM part GROUP BY p_brand
""",
)
def q_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-catalog profile: min/max/count-distinct over the part table."""
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum(_cents("p_retailprice")).alias("price_cents"),
        F.min("p_size").cast("long").alias("min_size"),
        F.max("p_size").cast("long").alias("max_size"),
        F.countDistinct("p_type").alias("n_types"),
    )


@query(
    "supplier_shipped_revenue",
    """
SELECT s_name, n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
""",
)
def q_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ two broadcast dims (supplier, nation): revenue per supplier —
    completes table coverage (every TESTDATA table now exercised)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = _cents("l_extendedprice") * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("n_items"), F.sum(rev).alias("revenue_c4"))
    )


@query(
    "tpch_q3_shipping_priority",
    """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10
""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) adapted to the synthetic schema
    (o_orderpriority for o_shippriority): segment-filtered 3-way join,
    revenue in exact cents×100, top-10 with tie-break. Plan: customer
    (filtered, small) broadcasts; the orders↔lineitem join shuffles on
    orderkey; TakeOrderedAndProject for the limit."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_c4"))
        .select(
            "l_orderkey",
            "revenue_c4",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue_c4"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q10_returned_items",
    """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4,
       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_c
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue_c4 DESC, c_custkey LIMIT 20
""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter-windowed orders,
    returned lineitems, customer/nation dims broadcast, exact-cents
    revenue, top-20 customers with tie-break."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(rev).alias("revenue_c4"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue_c4",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
        )
        .orderBy(F.desc("revenue_c4"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_volume",
    """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice_c DESC, o_orderkey LIMIT 100
""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): group-by-HAVING top-k over a
    SEMI-join — the qualifying-order set (sum(qty) > 250, the synthetic
    data's ~p99) comes from a partial→final aggregate whose filtered
    output is tiny, so it BROADCASTS into a left-semi join against orders;
    lineitem then re-joins on orderkey for the reported sum. Quantities in
    exact integers, price in cents, top-100 with orderkey tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "leftsemi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("totalprice_c"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice_c"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
WITH lo AS (SELECT l.*, o.o_orderdate FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F')
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 365 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey != l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey != l1.l_suppkey
                    AND l3.l_shipdate > l3.o_orderdate + INTERVAL 365 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    synthetic schema: with no commit/receipt dates, "late" is l_shipdate >
    o_orderdate + 365 days. The join SHAPE is the point — the suite's one
    multi-way EXISTS / NOT-EXISTS: late lineitems of 'F'-status orders,
    LEFT-SEMI against other-supplier lineitems of the same order (the
    order involved someone else) and LEFT-ANTI against other-supplier LATE
    lineitems (only this supplier was late). Both rewrite to equi-joins on
    orderkey with a suppkey-inequality residual, so they shuffle-partition
    on orderkey — no cross product; the supplier dim broadcasts."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
    l1 = lo.filter(late).select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        lo.filter(late)
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.k3) & (F.col("l_suppkey") != l3.s3),
            "leftanti",
        )
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@query(
    "tpch_q6_forecast_revenue",
    """
SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
               * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND round(l_discount*100) BETWEEN 5 AND 7
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical scan-heavy
    filter+aggregate — no join, no shuffle beyond the final partial→final
    agg; every predicate pushes to the parquet scan. Discount compared in
    exact integer hundredths."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long") * disc_c
            ).alias("revenue_c4"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    """
WITH c AS (SELECT c_custkey, c_nationkey,
                  CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
           FROM customer),
avg_src AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM c WHERE bal_c > 0)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
FROM c JOIN nation ON c_nationkey = n_nationkey, avg_src
WHERE bal_c * avg_src.cnt > avg_src.sum_c
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
ORDER BY n_name
""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to the synthetic
    schema (nation for the phone-prefix country code): customers above the
    positive-balance average with no RECENT orders (every synthetic
    customer has some order, so "dormant since 2000" keeps the anti-join
    non-trivial at every SF). The average threshold is
    applied by integer cross-multiplication (bal·cnt > sum) — exact
    cross-engine, no float average. Plan: the 1-row aggregate and the
    nation dim broadcast; NOT EXISTS is a left-anti join on custkey."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    avg_src = c.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"), F.count("*").alias("cnt")
    )
    n = load_table(spark, sf_dir, "nation")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_src))
        .filter(F.col("bal_c") * F.col("cnt") > F.col("sum_c"))
        .join(o, c.c_custkey == o.o_custkey, "leftanti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
        .orderBy("n_name")
    )


@query(
    "grouping_sets_revenue",
    """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than ROLLUP/CUBE: a chosen lattice
    subset) with the GROUPING() id disambiguating real NULL keys from
    subtotal rows — one shuffle computes all three granularities
    (Catalyst Expand + single partial→final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gid"),
            F.sum("cents").alias("rev_cents"),
            F.count("*").alias("n"),
        )
    )


@query(
    "unpivot_part_metrics",
    """
SELECT metric,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(val) AS BIGINT) AS total,
       CAST(min(val) AS BIGINT) AS vmin,
       CAST(max(val) AS BIGINT) AS vmax
FROM (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
) UNPIVOT (val FOR metric IN (price_cents, size))
GROUP BY metric
""",
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide columns → long (metric, value) rows) — the
    inverse of pivot, a narrow codegen Expand with no shuffle of its own;
    the per-metric aggregate that follows is the only exchange."""
    part = load_table(spark, sf_dir, "part")
    melted = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    ).unpivot("p_partkey", ["price_cents", "size"], "metric", "val")
    return melted.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.sum("val").alias("total"),
        F.min("val").alias("vmin"),
        F.max("val").alias("vmax"),
    )


@query(
    "incremental_agg_maintenance",
    """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM orders GROUP BY o_orderpriority
""",
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance: the engine computes the
    per-priority aggregate as BASE (orders before 1996-01-01) plus DELTA
    (orders after), then MERGES the two partial states algebraically
    (counts add, sums add, maxes max) — the daily-refresh shape that lets
    a 100 TB rollup absorb a day's CDC without rescanning history. The
    oracle computes the full aggregate directly: merged(base, delta)
    must equal it exactly (integer cents ⇒ order-independent)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate"),
    )
    cut = "1996-01-01"

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("rev_cents"),
            F.max("cents").alias("max_cents"),
        )

    base = state(orders.filter(F.col("o_orderdate") < cut))
    delta = state(orders.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("rev_cents").alias("rev_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return merged.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        F.col("rev_cents").cast("long").alias("rev_cents"),
        F.col("max_cents").cast("long").alias("max_cents"),
    )


@query(
    "incremental_join_maintenance",
    """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-JOIN maintenance under two-sided deltas (classic IVM
    delta algebra: Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB): orders and
    lineitem each split into base/delta at independent cut dates, the
    engine computes base⋈base plus the THREE delta joins and unions them
    — the refresh shape that lets a 100 TB materialized join view absorb
    a day's CDC on BOTH inputs without rescanning history (each delta
    join has at least one small side, typically broadcastable). The
    oracle aggregates the direct full join: the maintained view must
    match exactly (integer cents)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_shipdate",
    )
    ob = orders.filter(F.col("o_orderdate") < "1996-01-01")
    od = orders.filter(F.col("o_orderdate") >= "1996-01-01")
    lb = li.filter(F.col("l_shipdate") < "1996-06-01")
    ld = li.filter(F.col("l_shipdate") >= "1996-06-01")
    parts = [
        ob.join(lb, "ok"),   # base view
        ob.join(ld, "ok"),   # old ⋈ Δlineitem
        od.join(lb, "ok"),   # Δorders ⋈ old
        od.join(ld, "ok"),   # Δorders ⋈ Δlineitem
    ]
    view = parts[0]
    for p in parts[1:]:
        view = view.unionByName(p)
    return view.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("rev_cents"),
    )


@query(
    "range_window_revenue",
    """
WITH d AS (SELECT l_suppkey AS supp,
                  CAST(datediff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS day,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
           FROM lineitem GROUP BY 1, 2),
w AS (SELECT supp, day,
             CAST(sum(rev) OVER (PARTITION BY supp ORDER BY day
                  RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT)
               AS rev_11d
      FROM d)
SELECT supp, day, rev_11d FROM w
ORDER BY rev_11d DESC, supp, day LIMIT 20
""",
)
def q_range_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frame (the frame type ROWS can't express:
    '±5 calendar days around each shipping day', gaps included): per
    supplier-day revenue, the 11-day centered revenue sum, top-20 peaks —
    the burst-detection readout of a shipping/ops dashboard. Exercises
    Spark's RangeFrame (long offsets over the epoch-day ordering; the
    per-day pre-aggregate makes ordering keys unique so the frame is
    deterministic). One groupBy + one partitioned window; top-20 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.col("l_suppkey").alias("supp"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("supp").orderBy("day").rangeBetween(-5, 5)
    out = d.select(
        "supp", "day", F.sum("rev").over(w).cast("long").alias("rev_11d")
    )
    return out.orderBy(F.desc("rev_11d"), F.asc("supp"), F.asc("day")).limit(20)


@query(
    "ship_latency_by_priority",
    """
WITH v AS (SELECT o.o_orderpriority AS pri,
                  CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                    AS days
           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
c AS (SELECT pri, days, CAST(count(*) AS BIGINT) AS t FROM v GROUP BY 1, 2),
n AS (SELECT pri, CAST(sum(t) AS BIGINT) AS n FROM c GROUP BY 1),
m AS (SELECT c.pri, CAST(min(c.days) AS BIGINT) AS med FROM (
        SELECT pri, days, t,
               CAST(coalesce(sum(t) OVER (PARTITION BY pri ORDER BY days
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum
        FROM c) c JOIN n ON n.pri = c.pri
      WHERE c.cum < (n.n + 1) // 2 AND c.cum + c.t >= (n.n + 1) // 2
      GROUP BY 1)
SELECT n.pri AS priority, n.n AS n_lines, m.med AS median_latency_days
FROM n JOIN m ON m.pri = n.pri
""",
)
def q_ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median order→ship latency per order priority — the SLA
    readout next to shipping_survival_curve's full distribution: does
    URGENT actually ship faster at the median? Per-group exact lower
    medians over the day-domain census (latency days are a bounded
    calendar domain, so per-group window state is domain-sized, never
    corpus-sized — the census order-statistic discipline, grouped). One
    join + one census shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    from pyspark.sql import Window

    v = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("days"),
    )
    c = v.groupBy("pri", "days").agg(F.count("*").cast("long").alias("t"))
    n = c.groupBy("pri").agg(F.sum("t").cast("long").alias("n"))
    wb = Window.partitionBy("pri").orderBy("days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = c.select(
        "pri",
        "days",
        "t",
        F.coalesce(F.sum("t").over(wb), F.lit(0)).cast("long").alias("cum"),
    )
    m = (
        cum.join(n, "pri")
        .filter(
            (F.col("cum") < F.expr("(n + 1) div 2"))
            & (F.col("cum") + F.col("t") >= F.expr("(n + 1) div 2"))
        )
        .groupBy("pri")
        .agg(F.min("days").cast("long").alias("med"))
    )
    return n.join(m, "pri").select(
        F.col("pri").alias("priority"),
        F.col("n").alias("n_lines"),
        F.col("med").alias("median_latency_days"),
    )


@query(
    "subscription_regularity_topk",
    """
WITH o AS (SELECT o_custkey AS cust,
                  CAST(datediff('day', DATE '1970-01-01', o_orderdate)
                    AS BIGINT) AS day,
                  o_orderkey
           FROM orders),
g AS (SELECT cust,
             day - lag(day) OVER (PARTITION BY cust
                                  ORDER BY day, o_orderkey) AS gap
      FROM o QUALIFY gap IS NOT NULL),
s AS (SELECT cust, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap) AS BIGINT) AS sg,
             CAST(sum(gap * gap) AS BIGINT) AS sgg
      FROM g GROUP BY 1 HAVING count(*) >= 5 AND sum(gap) > 0)
SELECT cust AS custkey, n AS n_gaps,
       CAST(sg // n AS BIGINT) AS mean_gap_days,
       CAST((1000000 * (n * sgg - sg * sg)) // (sg * sg) AS BIGINT)
         AS cv2_x1e6
FROM s ORDER BY cv2_x1e6, cust LIMIT 20
""",
)
def q_subscription_regularity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-regular repeat customers by order-interval dispersion: squared
    coefficient of variation of inter-order gaps, cv² = n·Σg²/(Σg)² − 1
    ×1e6 — near-zero means metronome-regular ordering (the
    subscription/bot detection readout; high means bursty one-off
    behavior). Exact integers throughout (gaps are bounded calendar
    days); one lag() window per customer, one grouped aggregate, top-20
    lowest-dispersion customers with ≥5 gaps via
    TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    o = orders.select(
        F.col("o_custkey").alias("cust"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
        "o_orderkey",
    )
    w = Window.partitionBy("cust").orderBy("day", "o_orderkey")
    g = o.select(
        "cust", (F.col("day") - F.lag("day").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    s = (
        g.groupBy("cust")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("gap").cast("long").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("long").alias("sgg"),
        )
        .filter((F.col("n") >= 5) & (F.col("sg") > 0))
    )
    return (
        s.select(
            F.col("cust").alias("custkey"),
            F.col("n").alias("n_gaps"),
            F.expr("CAST(sg div n AS BIGINT)").alias("mean_gap_days"),
            F.expr(
                "CAST((1000000 * (n * sgg - sg * sg)) div (sg * sg) AS BIGINT)"
            ).alias("cv2_x1e6"),
        )
        .orderBy(F.asc("cv2_x1e6"), F.asc("custkey"))
        .limit(20)
    )
