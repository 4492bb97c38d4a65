"""Round-5 addition tests: Bradley-Terry fitting, Cohen's kappa, scene
segmentation, shard manifest, and the privacy audits — closed-form
invariants on tiny hand-built frames (the registry queries themselves are
oracle-checked; these pin the operator semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from videos_to_tfrecords_spark.operators.preference import (
    BT_SCALE,
    bradley_terry_integer,
)


def test_bt_dominant_player_ranks_first(spark):
    # player 1 beats everyone, 3 beats no one; strengths must order 1>2>3
    wins = spark.createDataFrame(
        [(1, 2, 4), (1, 3, 4), (2, 3, 4)],
        "winner long, loser long, n long",
    )
    out = {r.player: r for r in bradley_terry_integer(wins).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].wins == 8 and out[3].wins == 0
    assert out[1].n_comparisons == 8 and out[2].n_comparisons == 8
    assert out[1].strength > out[2].strength > out[3].strength
    assert out[3].strength >= 1  # the all-loser floor, not a zero-division


def test_bt_symmetric_duel_is_even(spark):
    # perfectly balanced head-to-head: identical strengths, exactly SCALE
    # (the MM update is a fixed point at s_i = s_j by symmetry)
    wins = spark.createDataFrame(
        [(1, 2, 5), (2, 1, 5)], "winner long, loser long, n long"
    )
    out = {r.player: r.strength for r in bradley_terry_integer(wins).collect()}
    assert out[1] == out[2]
    assert abs(out[1] - BT_SCALE) <= 1  # floor-arithmetic off-by-one budget


def test_bt_shuffle_join_path_matches_broadcast(spark):
    wins = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 2), (3, 1, 1), (1, 3, 2)],
        "winner long, loser long, n long",
    )
    a = sorted(map(tuple, bradley_terry_integer(wins).collect()))
    b = sorted(
        map(tuple, bradley_terry_integer(wins, broadcast_strengths=False).collect())
    )
    assert a == b


def test_kappa_identical_annotators_is_one(spark, sf_dir):
    # kappa formula sanity through the registered query's exact algebra:
    # derive per-lang counts with a==b forced — kappa_ppm must be 1e6
    # unless an annotator is constant within a lang (pe == 1 guard).
    from videos_to_tfrecords_spark.functions.hashing import h15
    from videos_to_tfrecords_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", (h15(F.col("text"), "kap-sig") % 3).alias("a")
    )
    agg = docs.groupBy("lang").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.count("*").cast("decimal(38,0)").alias("n_agree"),
        *[
            F.sum(F.when(F.col("a") == k, 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias(f"na{k}")
            for k in range(3)
        ],
    )
    pe = "(na0*na0 + na1*na1 + na2*na2)"
    rows = agg.select(
        "lang",
        F.expr(
            f"CAST((1000000 * (n * n_agree - {pe})) div (n * n - {pe}) AS BIGINT)"
        ).alias("kappa_ppm"),
    ).collect()
    assert rows and all(r.kappa_ppm == 1_000_000 for r in rows)


def test_scene_segments_partition_frames(spark, sf_dir):
    # every decoded frame lands in exactly one segment; segment bounds are
    # consistent and per-doc frame totals match the decode law 1 + id % 4
    import __spark_entry__ as e

    segs = e.queries()["video_scene_segments"](spark, sf_dir).collect()
    per_doc: dict[int, int] = {}
    for r in segs:
        assert r.start_ms <= r.end_ms and r.n_frames >= 1
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_frames
    from videos_to_tfrecords_spark.sources.tables import load_table

    ids = [r.doc_id for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()]
    assert per_doc == {i: 1 + i % 4 for i in ids}


def test_shard_manifest_covers_corpus(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["shard_manifest"](spark, sf_dir).collect()
    from videos_to_tfrecords_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n, chars = docs.groupBy().agg(
        F.count("*"), F.sum("n_chars")
    ).first()
    assert sum(r.n_docs for r in rows) == n
    assert sum(r.total_chars for r in rows) == chars
    ns = max(4, (n + 255) // 256)
    assert all(0 <= r.shard_id < ns for r in rows)
