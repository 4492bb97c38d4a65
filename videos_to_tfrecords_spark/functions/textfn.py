"""Text primitives: tokenization and shingling — pure Catalyst expressions.

Whitespace tokenization matches the documents table's space-separated text;
shingles are n-token windows (the MinHash/Jaccard unit). Both stay inside
whole-stage codegen: no UDFs in the hot path of a 100 TB text scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Array of n-token shingles ('tok1 tok2 tok3'); empty if < n tokens.

    Built as ``zip_with`` over n shifted ``slice``s of the token array —
    the token split is evaluated O(n) times per ROW. The previous
    ``transform(sequence, i -> element_at(toks, i+j))`` form re-evaluated
    the captured split expression per ELEMENT inside the interpreted HOF
    (no CSE across the lambda boundary): O(tokens²) string work per doc,
    measured 4-5× of whole-query time on the n-gram LM family at sf1.
    """
    toks = tokens(col)
    m = F.size(toks) - (n - 1)  # number of shingles when positive
    shifted = [F.slice(toks, 1 + j, m) for j in range(n)]
    acc = shifted[0]
    for nxt in shifted[1:]:
        acc = F.zip_with(acc, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(toks_col: str = "t", n: int = 3) -> str:
    """DuckDB twin of :func:`shingles`, over a pre-split list column
    (1-based list indexing; lambdas capture outer columns)."""
    joined = " || ' ' || ".join(f"{toks_col}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks_col}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks_col}) - {n - 1}), i -> {joined}) "
        f"ELSE [] END"
    )


def exploded_shingles(df, id_cols, text_col: str, n: int = 3):
    """(id..., shingle) rows — the explode-oriented twin of :func:`shingles`.

    ``shingles()`` builds the array with a higher-order ``transform``
    lambda, which Spark evaluates INTERPRETED (higher-order functions are
    outside whole-stage codegen) — fine when the array stays an array, but
    ~5× slower than codegen when the very next step is an explode. This
    shape explodes the start positions first and builds each shingle with
    plain ``slice`` + ``array_join`` projections, which stay inside
    codegen. Same output multiset as ``explode(shingles(text, n))``.
    """
    from pyspark.sql import functions as F

    toks = tokens(text_col)
    base = df.select(*id_cols, toks.alias("_toks"))
    pos = base.select(
        *id_cols,
        "_toks",
        F.explode(
            F.when(
                F.size("_toks") >= n,
                F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("_i"),
    )
    return pos.select(
        *id_cols,
        F.array_join(F.slice("_toks", F.col("_i"), F.lit(n)), " ").alias("shingle"),
    )
