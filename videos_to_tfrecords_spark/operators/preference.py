"""Preference-data aggregation (the RLHF/data-ranking side of a training
pipeline): Bradley-Terry strength fitting over pairwise comparisons.

Exact-integer discipline (registry.py rules): the MM update runs in BIGINT
floor arithmetic so a SQL oracle can unroll the iterations CTE-for-CTE and
hash-match the fitted strengths bit-for-bit — the same technique as
operators/graph.pagerank_integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point unit for strengths (s0 = 1 * SCALE)
BT_SCALE = 10**6
#: numerator scaling for the per-opponent denominator terms — keeps
#: n_ij·Q div (s_i+s_j) ≈ n_ij·5e5 exact instead of flooring to 0
BT_Q = 10**12


def bradley_terry_integer(
    wins: DataFrame,
    winner: str = "winner",
    loser: str = "loser",
    n: str = "n",
    n_iter: int = 3,
    broadcast_strengths: bool = True,
) -> DataFrame:
    """Fit Bradley-Terry strengths with ``n_iter`` rounds of the MM
    (minorization-maximization) update, entirely in BIGINT floor
    arithmetic:

        s0(i)   = SCALE
        d_k(i)  = Σ_j (n_ij · Q) div (s_k(i) + s_k(j))
        s_k+1(i) = max( (W_i · Q) div d_k(i), 1 )

    with n_ij the total comparisons between i and j (either direction),
    W_i the total wins of i. The update is homogeneous in s, so the
    fixed-point magnitude stays ~SCALE without renormalization; the max(·,1)
    floor keeps all-loser players out of zero divisions. Magnitudes:
    W_i·Q ≤ 1e4·1e12 at sf0.1 — int64 with 1e2 headroom; at larger W the
    one-line DECIMAL(38,0) swap applies (SCALE.md int64 audit).

    ``wins``: aggregated (winner, loser, n) win counts. Returns
    (player, wins, n_comparisons, strength).

    Scale shape (per iteration): the strength table has one row per
    PLAYER — in preference data that's the model/policy/supplier roster,
    orders of magnitude below the comparison volume — so with
    ``broadcast_strengths`` (default) both endpoint attachments are
    map-side broadcast joins against the once-persisted comparison graph
    and the only exchange is the player-keyed partial→final aggregate.
    Set it False for corpus-sized player sets (e.g. per-document duels):
    the joins fall back to the keyed-equi-join PageRank message-passing
    shape.
    """
    # the win-count input feeds three branches (both union sides of the
    # undirected graph + the per-player win totals) — cache it or its
    # derivation (often a groupBy over an exploded duel stream) runs 3×
    w = wins.select(
        F.col(winner).alias("i"), F.col(loser).alias("j"), F.col(n).alias("nw")
    ).persist()
    # undirected comparison counts, materialized in BOTH orientations so
    # each player's denominator is one groupBy over its out-rows
    und = (
        w.select("i", "j", "nw")
        .unionAll(w.select(F.col("j").alias("i"), F.col("i").alias("j"), "nw"))
        .groupBy("i", "j")
        .agg(F.sum("nw").alias("nij"))
        .persist()
    )
    w_i = und.groupBy("i").agg(F.sum("nij").alias("n_comparisons")).join(
        w.groupBy("i").agg(F.sum("nw").alias("wins")), "i", "left"
    ).select(
        "i",
        F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
        F.col("n_comparisons").cast("long").alias("n_comparisons"),
    ).persist()

    mark = F.broadcast if broadcast_strengths else (lambda df: df)
    s = w_i.select("i", F.lit(BT_SCALE).cast("long").alias("s"))
    for _ in range(n_iter):
        d = (
            und.join(
                mark(s.withColumnRenamed("i", "j").withColumnRenamed("s", "sj")), "j"
            )
            .join(mark(s.withColumnRenamed("s", "si")), "i")
            .groupBy("i")
            .agg(
                F.sum(F.expr(f"(nij * {BT_Q}) div (si + sj)")).alias("d")
            )
        )
        # checkpoint per round: s feeds the next round TWICE (si and sj),
        # so a lazy chain doubles the logical plan per iteration (the BFS
        # frontier lesson) — the table is roster-sized, the cut is cheap
        s = d.join(mark(w_i.select("i", "wins")), "i").select(
            "i",
            F.greatest(F.expr(f"(wins * {BT_Q}) div d"), F.lit(1))
            .cast("long")
            .alias("s"),
        ).localCheckpoint(eager=True)
    out = (
        w_i.join(s, "i")
        .select(
            F.col("i").alias("player"),
            "wins",
            "n_comparisons",
            F.col("s").alias("strength"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist(blocking=False)
    w_i.unpersist(blocking=False)
    w.unpersist(blocking=False)
    return out
