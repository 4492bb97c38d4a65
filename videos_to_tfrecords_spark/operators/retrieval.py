"""Lexical retrieval over a document corpus: inverted-index term stats and
BM25 ranking — the search/filter primitive an LLM data pipeline uses for
targeted corpus slicing (pulling topical subsets, deduplicating against a
query set, building retrieval-augmented training examples).

The reference has no retrieval surface (SURVEY §2.7 lists no joins or
ranking at all); this is a §7/§8-style engine extension expressed entirely
in Catalyst built-ins:

  tokens → explode → filter to query terms → per-(doc,term) tf
         → per-term document frequency (tiny, broadcast)
         → BM25 score → per-doc sum → global top-k

Scale posture (100 TB corpus):
- the explode is filtered to the query's terms BEFORE any shuffle, so the
  shuffled volume is ∝ matching postings, not corpus tokens;
- per-term df and the corpus avgdl are k-row / 1-row aggregates joined back
  by broadcast — no corpus-sized shuffle on the stats side;
- the final ranking is a global top-k (TakeOrderedAndProject): per-partition
  heaps, no global sort.

Float determinism for the oracle: idf and the tf saturation are computed in
DOUBLE with an identical operation order in Spark and the SQL twin, then
floor-scaled to integers (×1e6) for hashing; both engines evaluate the same
IEEE-754 expression tree, and ln() agrees to the ulp on the moderate values
involved (ratios of counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from videos_to_tfrecords_spark.functions.textfn import tokens

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms.

    Returns (doc_id, n_hit_terms, score_x1e6, rnk) — score floor-scaled for
    cross-engine hashing; ties broken by doc_id so the ranking is total.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    ).withColumn("dl", F.size("t"))

    # 1-row corpus stats: N and avgdl (exact integer token counts)
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    postings = (
        toks.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )

    # per-term document frequency: ≤ |query| rows — broadcast back
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (
                F.col("tf")
                + K1
                * (
                    F.lit(1.0)
                    - F.lit(B)
                    + F.lit(B) * F.col("dl") * F.col("n_docs") / F.col("total_dl")
                )
            ),
        )
    )

    ranked = (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.floor(F.sum("term_score") * 1_000_000).cast("long").alias("score_x1e6"),
        )
        .orderBy(F.desc("score_x1e6"), F.asc("doc_id"))
        .limit(k)
    )
    # rnk over the ≤k surviving rows only — the window sees a k-row input,
    # not the corpus (limit already applied), so the single-partition sort
    # under row_number is bounded by k.
    w_rank = Window.orderBy(F.desc("score_x1e6"), F.asc("doc_id"))
    return ranked.withColumn("rnk", F.row_number().over(w_rank).cast("long"))


def bm25_oracle_sql(query_terms: list[str], k: int = 20) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical expression tree and
    float operation order, identical floor scaling."""
    terms_in = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dl AS (SELECT doc_id, len(t) AS dl, t FROM toks),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
postings AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM dl)
  WHERE term IN ({terms_in})
  GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * ({K1} + 1))
           / (p.tf + {K1} * (1.0 - {B} + {B} * p.dl * s.n_docs / s.total_dl))
           AS term_score
  FROM postings p JOIN dfreq d ON p.term = d.term CROSS JOIN stats s),
ranked AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_hit_terms,
         CAST(floor(sum(term_score) * 1000000) AS BIGINT) AS score_x1e6
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_hit_terms, score_x1e6,
       CAST(row_number() OVER (ORDER BY score_x1e6 DESC, doc_id) AS BIGINT) AS rnk
FROM ranked
ORDER BY score_x1e6 DESC, doc_id
LIMIT {k}
"""


def rerank_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k_recall: int = 50,
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval — the retrieve-then-rerank architecture every
    production search / RAG-curation stack runs: a cheap high-recall BM25
    stage over the whole corpus, then a richer scorer over the BOUNDED
    candidate set only (here an exact-integer hashed cross-scorer — the
    stand-in for a cross-encoder, same role as ml.int_hash_linear_model's
    stand-in for a neural model).

    Rerank score (exact int64, cross-engine):
        Σ_t w_t · ((1000·tf_t) div dl) + 1000 · n_hit_terms
    with per-term weight w_t = md5_60bit("rr:"+t) % 201 − 100 (the
    engine's portable-hash weight family). Output: the final top-``k``
    (doc_id, n_hit_terms, score_x1e6, rerank_score, rnk); ties break on
    (bm25 score, doc_id) so the ranking is total.

    Scale: stage 1 is bm25_topk's filtered-posting shuffle + global
    top-k_recall; stage 2 touches ONLY k_recall documents (one
    broadcast-joined semi-join back to the corpus for their tokens), so
    the expensive scorer's cost is O(k_recall), independent of corpus
    size — the whole point of the two-stage shape at 100 TB."""
    import hashlib

    cands = bm25_topk(docs, query_terms, id_col, text_col, k=k_recall)
    corpus = docs.select(F.col(id_col).alias("_cid"), F.col(text_col))
    cand_toks = (
        corpus.join(F.broadcast(cands), corpus["_cid"] == cands["doc_id"])
        .select(
            "doc_id",
            "n_hit_terms",
            "score_x1e6",
            tokens(text_col).alias("t"),
        )
        .withColumn("dl", F.size("t"))
    )
    tf = (
        cand_toks.select(
            "doc_id", "dl", F.explode("t").alias("term")
        )
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    w_map = {
        t: int(hashlib.md5(f"rr:{t}".encode()).hexdigest()[:15], 16) % 201 - 100
        for t in query_terms
    }
    w_col = F.coalesce(
        *[
            F.when(F.col("term") == t, F.lit(w)).otherwise(F.lit(None))
            for t, w in w_map.items()
        ]
    )
    term_part = tf.withColumn(
        "part", w_col * F.expr("(1000 * tf) div dl")
    )
    rerank = term_part.groupBy("doc_id").agg(
        F.sum("part").cast("long").alias("w_sum")
    )
    out = cands.join(rerank, "doc_id").withColumn(
        "rerank_score",
        (F.col("w_sum") + F.lit(1000) * F.col("n_hit_terms")).cast("long"),
    )
    w_rank = Window.orderBy(
        F.desc("rerank_score"), F.desc("score_x1e6"), F.asc("doc_id")
    )
    return (
        out.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "n_hit_terms", "score_x1e6", "rerank_score", "rnk")
    )


def rerank_oracle_sql(
    query_terms: list[str], k_recall: int = 50, k: int = 10
) -> str:
    """DuckDB twin of :func:`rerank_topk`: the bm25 oracle CTEs at
    ``k_recall``, then the same integer cross-scorer over the candidate
    set."""
    terms_in = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dl AS (SELECT doc_id, len(t) AS dl, t FROM toks),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
postings AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(t) AS term FROM dl)
  WHERE term IN ({terms_in})
  GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * ({K1} + 1))
           / (p.tf + {K1} * (1.0 - {B} + {B} * p.dl * s.n_docs / s.total_dl))
           AS term_score
  FROM postings p JOIN dfreq d ON p.term = d.term CROSS JOIN stats s),
ranked AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_hit_terms,
         CAST(floor(sum(term_score) * 1000000) AS BIGINT) AS score_x1e6
  FROM scored GROUP BY doc_id),
cands AS (
  SELECT doc_id, n_hit_terms, score_x1e6
  FROM ranked ORDER BY score_x1e6 DESC, doc_id LIMIT {k_recall}),
rr AS (
  SELECT p.doc_id,
         CAST(sum((CAST(concat('0x', substr(md5('rr:' || p.term), 1, 15))
                     AS BIGINT) % 201 - 100)
                  * ((1000 * p.tf) // p.dl)) AS BIGINT) AS w_sum
  FROM postings p JOIN cands USING (doc_id) GROUP BY p.doc_id)
SELECT c.doc_id, c.n_hit_terms, c.score_x1e6,
       CAST(rr.w_sum + 1000 * c.n_hit_terms AS BIGINT) AS rerank_score,
       CAST(row_number() OVER (ORDER BY rr.w_sum + 1000 * c.n_hit_terms DESC,
                               c.score_x1e6 DESC, c.doc_id) AS BIGINT) AS rnk
FROM cands c JOIN rr USING (doc_id)
ORDER BY rerank_score DESC, score_x1e6 DESC, doc_id
LIMIT {k}
"""
