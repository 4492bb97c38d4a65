"""Deterministic sketch operators: Count-Min frequency estimation and
integer power iteration over a Gram matrix.

Sketches are how a 100 TB pipeline answers frequency/spectrum questions
without corpus-sized state. Both operators here are built so the WHOLE
computation is reproducible across engines (portable hash families, exact
integer arithmetic), making even the *approximate* answers hash-checkable
against a SQL oracle — the same trick as the engine's integer PageRank and
kmeans_lite (operators/graph.py, operators/similarity.py).

Count-Min: the counter table is depth × width integer cells; every item
instance increments one cell per row via an independent salted hash. The
corpus-side aggregation collapses to ≤ depth·width keys with map-side
partial sums — the shuffle is sketch-sized, not corpus-sized. Estimates
(min over rows of the item's cells) are biased up, never down; the bias is
visible in the query output as ``overcount``.

Power iteration: the Gram matrix (dim×dim, from similarity.gram_matrix) is
planning-metadata sized, so iterating on the driver is the engineering-
correct choice (same stance as kmeans_lite's k×dim centroids); keeping the
iteration in scaled-int64 with truncating division makes the result exact,
so the dominant-eigenvector direction itself is oracle-checked — not just
"close to numpy".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.hashing import h15

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_counts_weighted(
    counts: DataFrame,
    item_col: str,
    n_col: str = "n",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min counter table from a PRE-AGGREGATED (item, n) frame.

    Hashing once per DISTINCT item and summing weights is identical math to
    hashing every instance, but the explode runs over the vocabulary, not
    the corpus — at 100 TB that's the difference between a second corpus
    pass and a vocab-sized one. Output (d, bucket, c): ≤ depth·width rows.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(h15(F.col(item_col), salt=f"cms{d}"), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for d in range(depth)
        ]
    )
    return (
        counts.select(F.col(n_col).alias("_n"), F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("_n").alias("c"))
    )


def cms_counts(items: DataFrame, item_col: str, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min counter table over one row per ITEM INSTANCE: aggregate to
    (item, n) first (map-side combine shrinks the shuffle to the
    vocabulary), then hash each distinct item once."""
    counts = items.groupBy(item_col).agg(F.count("*").alias("n"))
    return cms_counts_weighted(counts, item_col, "n", depth, width)


def cms_estimate(items: DataFrame, queries: DataFrame, item_col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                 counter_table: DataFrame | None = None) -> DataFrame:
    """Estimate each query item's frequency from the sketch: min over the
    item's depth cells. ``queries`` has one row per distinct item to probe
    (a broadcast-sized set); the join against the counter table is on the
    (d, bucket) key. Pass ``counter_table`` to reuse an already-built
    sketch (avoids a second corpus pass)."""
    counts = (
        counter_table
        if counter_table is not None
        else cms_counts(items, item_col, depth, width)
    )
    probes = queries.select(F.col(item_col)).withColumn(
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            h15(F.col(item_col), salt=f"cms{d}"), F.lit(width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ),
    ).select(item_col, F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counts), ["d", "bucket"])
        .groupBy(item_col)
        .agg(F.min("c").alias("cms_n"))
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark's `div`. Python's
    // floors, which disagrees on negatives; the SQL oracles mirror this
    exact CASE."""
    q = abs(a) // b
    return q if a >= 0 else -q


def power_iteration_int(gram_rows, iters: int = 4, scale: int = 1_000_000):
    """Dominant-eigenvector direction of a symmetric matrix given as upper-
    triangle (i, j, g) rows, in EXACT scaled-int64 arithmetic.

    Every step renormalizes to ≤ ``scale`` via data-derived truncating
    divisors, so no intermediate exceeds ~64·scale² (≪ 2⁶³) and the whole
    trajectory is bit-reproducible in any engine with 64-bit integers.
    Returns dict i -> component (scaled).
    """
    full: dict[tuple[int, int], int] = {}
    dims = set()
    for i, j, g in gram_rows:
        full[(i, j)] = g
        full[(j, i)] = g
        dims.add(i)
        dims.add(j)
    n = sorted(dims)
    s = max(abs(g) for g in full.values())
    d0 = s // scale + 1
    m = {k: _tdiv(g, d0) for k, g in full.items()}
    v = {i: scale for i in n}
    for _ in range(iters):
        w = {i: sum(m[(i, j)] * v[j] for j in n if (i, j) in m) for i in n}
        mx = max(abs(x) for x in w.values())
        dv = mx // scale + 1
        v = {i: _tdiv(x, dv) for i, x in w.items()}
    return v


def misra_gries_candidates(
    items: DataFrame, item_col: str, n_counters: int, item_type: str = "long"
) -> DataFrame:
    """Per-partition Misra–Gries summaries: the bounded-memory candidate
    stage of exact distributed heavy-hitter detection.

    Each partition keeps ≤ ``n_counters`` counters regardless of partition
    size (the frequent-items analog of a fixed-width CMS row). Batches are
    folded in VECTORIZED: the Arrow batch's exact ``value_counts`` is added
    to the running summary, then — the mergeable-summaries decrement
    (Agarwal et al., PODS'12) — the (k+1)-th largest counter value is
    subtracted from every counter and non-positive ones dropped, restoring
    the width bound while keeping MG's guarantee: any item with partition
    frequency > n_p/(k+1) survives in the summary. Hence any item with
    GLOBAL frequency > n/T for T ≤ k is emitted by at least one partition
    (if every partition had f_i(p) ≤ n_p/T the global sum could not exceed
    n/T), so the union of summaries is a sound candidate set of ≤
    k·n_partitions rows — metadata-sized, never the corpus.
    """
    import pandas as pd

    def mg(batches):
        counters: pd.Series | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf[item_col].value_counts()
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > n_counters:
                kth = counters.nlargest(n_counters + 1).iloc[-1]
                counters = counters.sub(kth)
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame({item_col: counters.index})

    return items.mapInPandas(mg, f"{item_col} {item_type}").distinct()


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str,
    t_ratio: int = 100,
    n_counters: int = 256,
) -> DataFrame:
    """EXACT heavy hitters (frequency·t_ratio > total) without a
    corpus-sized shuffle: Misra–Gries candidates per partition, then one
    verification scan that exact-counts ONLY the candidate keys (everything
    else collapses into a single overflow bucket that still contributes to
    the exact total). Requires ``t_ratio <= n_counters`` for the MG
    soundness bound; output == the naive full groupBy, but the one shuffle
    carries ≤ candidates+1 keys instead of the item domain.

    The candidate collect is bounded by n_counters · n_partitions — the
    broadcast-variable shape, not a data-sized collect.
    """
    if t_ratio > n_counters:
        raise ValueError("MG soundness needs t_ratio <= n_counters")
    cand = [
        r[0]
        for r in misra_gries_candidates(items, item_col, n_counters).collect()
    ]
    counts = items.groupBy(
        F.when(F.col(item_col).isin(cand), F.col(item_col)).alias(item_col)
    ).agg(F.count("*").cast("long").alias("freq"))
    tot = counts.groupBy().agg(F.sum("freq").cast("long").alias("n_total"))
    return (
        counts.filter(F.col(item_col).isNotNull())
        .crossJoin(F.broadcast(tot))
        .filter(F.col("freq") * t_ratio > F.col("n_total"))
    )
