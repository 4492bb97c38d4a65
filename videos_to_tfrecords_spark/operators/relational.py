"""Advanced relational operators Spark has no single built-in for
(SURVEY §2.7 + pyspark guide 'Common OLAP patterns'): as-of join,
sessionization, skew-safe salted aggregation.

Each is a composition of built-in DataFrame ops — no Python in the hot
path — chosen for its shuffle profile at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """For each left row, the latest right row with right_ts ≤ left_ts per
    key (inclusive) — left-outer semantics (no prior right ⇒ nulls).

    Physical strategy: tag + union + one window pass. Both sides union into
    a single per-key timeline sorted by (ts, right-first); each right row's
    values carry forward via last(ignorenulls) and every left row reads the
    carried values. ONE shuffle on the key — no range join explosion, no
    per-group Python (pd.merge_asof), and skew rides the same AQE handling
    as any window. Right side should be unique per (key, ts); pre-aggregate
    if not (ties would be carry-order dependent).

    All right value columns ride in ONE struct, so the carry is ATOMIC:
    a right row with NULL in some value column still supersedes the
    previous row wholesale (matching ASOF JOIN / pd.merge_asof), rather
    than mixing columns from different right rows."""
    keys = list(key_cols)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_value_cols])
    rstruct_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_value_cols
    ) + ">"
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        rstruct.alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal ts so ≤ is inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_struct = F.last("_r", ignorenulls=True).over(w)
    carried = unioned.select(
        *keys,
        "_ts",
        "_is_right",
        *lcols,
        *[
            carried_struct.getField(c).alias(f"asof_{c}")
            for c in right_value_cols
        ],
        F.last(F.when(F.col("_is_right") == 1, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("asof_ts"),
    )
    return carried.filter(F.col("_is_right") == 0).drop("_is_right").withColumnRenamed(
        "_ts", left_ts
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: Column | int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event (per key, time-ordered) exceeds ``gap`` (same units as
    ts_col). session_seq is 0-based per key. One shuffle; the lag + running
    sum share a single window sort."""
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(prev.isNull() | (F.col(ts_col) - prev > gap), 1).otherwise(0)
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new", is_new).withColumn(
        "session_seq", (F.sum("_new").over(running) - 1).cast("long")
    ).drop("_new")


def salted_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: Column | str,
    alias: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-safe aggregation: pre-aggregate on (key, salt) so a hot key's
    rows split across ``n_salt`` reducers, then combine the partials. Same
    result as a plain groupBy-sum (the oracle checks exactly that); at
    100 TB this is the standard defense when one key holds 10% of a table
    and map-side combine alone can't save the final reducer."""
    keys = list(key_cols)
    partial = salted_sum_partials(df, keys, value_col, n_salt)
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def salted_sum_partials(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: Column | str,
    n_salt: int = 8,
) -> DataFrame:
    """The first (salted) stage of :func:`salted_sum`, exposed so tests and
    diagnostics can observe the hot key actually splitting across salts —
    one row per (key, salt) that received data."""
    keys = list(key_cols)
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salt))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(v).alias("_partial"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    n_salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side ``n_salt`` times and
    spread the big side's hot keys across salts, so one hot join key fans
    out over ``n_salt`` reducers instead of melting one. Result-identical
    to the plain join (its oracle); the manual twin of AQE's skew-join
    splitting for when the small side is replicable but not broadcast-able."""
    keys = list(key_cols)
    salt = F.pmod(
        F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salt)
    ).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    salts = big.sparkSession.range(n_salt).select(F.col("id").cast("int").alias("_salt"))
    small_s = small.crossJoin(F.broadcast(salts))
    out = big_s.join(small_s, [*keys, "_salt"])
    return out.drop("_salt")


def merge_upsert(
    target: DataFrame, updates: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """MERGE/upsert emulation without a lakehouse format (pyspark guide:
    'MERGE INTO needs Delta; emulate with anti-join + union'): rows from
    ``updates`` win, unmatched target rows survive. At 100 TB both legs are
    one shuffle on the key (or zero with bucketed storage); Delta/Iceberg
    would add ACID on top of the same plan shape."""
    keys = list(key_cols)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def sessionize_udtf_sessions(
    spark,
    events: DataFrame,
    gap_us: int = 7_200_000_000,
) -> DataFrame:
    """Per-user session aggregates via a Spark 4 Python UDTF called with
    ``TABLE(...) PARTITION BY user_id ORDER BY ts_us, event_id`` — the
    UDTF analog of a keyed DoFn with per-key ordered input: one class
    instance per partition key, ``eval`` per row IN ORDER, ``terminate``
    flushes that key's sessions. Semantics identical to
    :func:`sessionize` + rollup (same oracle); exists to exercise the
    partition-aware UDTF execution path, which is how arbitrary
    per-key sequential algorithms (CRDT merges, compaction, legacy
    per-entity code) mount onto Spark without a window-function rewrite.

    Scale: PARTITION BY shuffles once on user_id; each instance holds ONE
    user's open-session accumulator (O(1) state — rows stream through in
    order, they are not buffered)."""
    import uuid as _uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id long, session_seq long, session_start_us long, n_events long")
    class SessionRollup:
        def __init__(self):
            self._out = []
            self._key = None
            self._seq = self._start = self._last = self._n = 0

        def _close(self):
            if self._n:
                self._out.append((self._key, self._seq, self._start, self._n))

        def eval(self, row):
            ts = row["ts_us"]
            if self._n == 0:
                self._key = row["user_id"]
                self._seq, self._start, self._n = 0, ts, 1
            elif ts - self._last > gap_us:
                self._close()
                self._seq += 1
                self._start, self._n = ts, 1
            else:
                self._n += 1
            self._last = ts

        def terminate(self):
            self._close()
            yield from self._out

    name = f"session_rollup_{_uuid.uuid4().hex[:8]}"
    spark.udtf.register(name, SessionRollup)
    view = f"_sess_in_{_uuid.uuid4().hex[:8]}"
    events.select("user_id", "ts_us", "event_id").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT * FROM {name}(TABLE({view}) "
        f"PARTITION BY user_id ORDER BY (ts_us, event_id))"
    )


def ewma_taps(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    taps: int = 8,
) -> DataFrame:
    """Per-key exponentially weighted moving "average" as a FIXED-TAP FIR
    filter: ewma_t = Σ_{j<taps} alpha^j · value_{t-j} over the key's
    time-ordered history — the streaming-feature primitive (recent-activity
    score, decayed counters) a training pipeline attaches to events.

    The true infinite-horizon EWMA is a sequential recurrence (s_t =
    αs_{t-1} + v_t) that either serializes the scan or overflows the
    closed-form (a^-n) rewrite; truncating to ``taps`` terms makes it a pure
    window expression — per-key parallel, one shuffle on the key, exact.
    With alpha=0.5 every weight is a power of two, so each product is an
    EXACT double scaling and the fixed left-to-right summation order is
    reproducible bit-for-bit in any IEEE engine.

    Adds ``ewma`` (double) and ``ewma_x1e6`` (floor-scaled long, for
    cross-engine hashing).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    expr = F.coalesce(F.col(value_col), F.lit(0.0))
    for j in range(1, taps):
        expr = expr + (alpha ** j) * F.coalesce(
            F.lag(value_col, j).over(w), F.lit(0.0)
        )
    out = df.withColumn("ewma", expr)
    return out.withColumn(
        "ewma_x1e6", F.floor(F.col("ewma") * 1_000_000).cast("long")
    )


def skyline_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pareto frontier minimizing (x, y): rows no other row dominates
    (other.x ≤ x ∧ other.y ≤ y with at least one strict) — the
    multi-objective filter shape (cheapest-and-smallest part, best
    quality-per-cost document).

    The naive dominance test is an O(n²) theta-self-join. This plan is
    O(n log n)-shaped instead: aggregate to one row per distinct x with the
    group's min y (a keyed shuffle), take the running min of y over
    x-ascending groups with the DISTRIBUTED ordered prefix-min
    (``operators.ordered.global_cummin`` — range-partitioned distinct-x
    rows + a ≤shuffle-partitions offset table, so even an adversarial
    all-distinct x never lands on one task), broadcast the per-x
    thresholds back, and keep rows dominated by neither a
    strictly-cheaper group (cheaper_min_y ≤ y) nor a same-x
    strictly-smaller y (group_min_y < y). Duplicate (x,y) points are all
    kept, matching the strict-dominance NOT EXISTS semantics.
    """
    from videos_to_tfrecords_spark.operators.ordered import global_cummin

    g = df.groupBy(x_col).agg(F.min(y_col).alias("_gmin_y"))
    g = global_cummin(g, [F.col(x_col)], "_gmin_y", "_cheaper_min_y", before=True)
    out = df.join(F.broadcast(g), x_col)
    keep = ~(
        (F.col("_cheaper_min_y").isNotNull() & (F.col("_cheaper_min_y") <= F.col(y_col)))
        | (F.col("_gmin_y") < F.col(y_col))
    )
    return out.filter(keep).drop("_gmin_y", "_cheaper_min_y")


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Snapshot CDC diff — classify every key across two table versions as
    insert / delete / update / unchanged (the change feed a lakehouse
    time-travel DIFF produces, computed from plain tables). One
    null-safe full-outer equi-join on the key: shuffles both sides once on
    the key, comparisons are narrow — at 100 TB co-locate both snapshots
    with write_bucketed and even that shuffle disappears.

    Returns the coalesced key columns + ``change_type``."""
    pa = a.select(*keys, *compare_cols).withColumn("_a", F.lit(1))
    pb = b.select(*keys, *compare_cols).withColumn("_b", F.lit(1))
    for c in list(keys) + list(compare_cols) + ["_b"]:
        pb = pb.withColumnRenamed(c, f"__b_{c}")
    cond = [F.col(k).eqNullSafe(F.col(f"__b_{k}")) for k in keys]
    j = pa.join(pb, cond, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"__b_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_a").isNull(), F.lit("insert"))
        .when(F.col("__b__b").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_keys = [
        F.coalesce(F.col(k), F.col(f"__b_{k}")).alias(k) for k in keys
    ]
    return j.select(*out_keys, change.alias("change_type"))


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    tolerance: int,
) -> DataFrame:
    """Nearest-in-time as-of join with tolerance: each left row pairs with
    the CLOSEST right row per key whose |right_ts − left_ts| ≤ tolerance,
    ties to the earlier (backward) side — the sensor-alignment /
    feature-join variant where "latest prior" is wrong if a reading lands
    just after the query point (pd.merge_asof direction='nearest').

    Same one-shuffle timeline strategy as :func:`asof_join`, run in BOTH
    directions over one union: a backward pass (ascending ts, right rows
    first at equal ts, unbounded-PRECEDING last(ignorenulls)) and a
    forward pass (the SAME O(n) accumulator frame over DESCENDING ts —
    never an unbounded-FOLLOWING frame, which re-aggregates per row).
    The nearest pick is then a row-local CASE. Output adds
    nearest_<col> columns and a signed gap_us (right − left; ≤0 means
    the match is in the past)."""
    keys = list(key_cols)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_value_cols])
    rstruct_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_value_cols
    ) + ">"
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        rstruct.alias("_r"),
    )
    u = l_tagged.unionByName(r_tagged)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.desc("_ts"), F.desc("_is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_ts_col = F.when(F.col("_is_right") == 1, F.col("_ts"))
    carried = u.select(
        *keys,
        "_ts",
        "_is_right",
        *lcols,
        F.last("_r", ignorenulls=True).over(wb).alias("_rb"),
        F.last(right_ts_col, ignorenulls=True).over(wb).alias("_bts"),
        F.last("_r", ignorenulls=True).over(wf).alias("_rf"),
        F.last(right_ts_col, ignorenulls=True).over(wf).alias("_fts"),
    ).filter(F.col("_is_right") == 0)
    gb = F.col("_ts") - F.col("_bts")
    gf = F.col("_fts") - F.col("_ts")
    valid_b = F.col("_bts").isNotNull() & (gb <= tolerance)
    valid_f = F.col("_fts").isNotNull() & (gf <= tolerance)
    use_b = valid_b & (~valid_f | (gb <= gf))
    picked = F.when(use_b, F.col("_rb")).when(valid_f, F.col("_rf"))
    gap = F.when(use_b, -gb).when(valid_f, gf).cast("long")
    return carried.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *lcols,
        *[
            picked.getField(c).alias(f"nearest_{c}")
            for c in right_value_cols
        ],
        gap.alias("gap_us"),
    )
