"""Cogrouped-map over two keyed DataFrames — ``groupBy().cogroup().
applyInPandas`` (SPARK-28006), the API surface for per-key merges of two
tables that built-in joins can't express row-by-row.

The reference's Beam model has CoGroupByKey as a core primitive (the
composite-transform family SURVEY §2.6 U8 builds on); Spark's DataFrame
twin is the cogrouped pandas map. The engine's native as-of join
(operators/rangejoin.py) covers the declarative path; this module covers
the imperative one — both sides of a key arrive as two aligned pandas
frames in one task — and the registry query checks them against the same
SQL semantics.

Scale: cogroup hash-shuffles BOTH sides on the key, one task per key
group; per-task memory is the key's rows from each side (entity-bounded —
the same per-user contract as user_sessions_udtf). The merge itself is a
vectorized numpy searchsorted per Arrow batch, not a Python row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def cogroup_asof_enrich(
    facts: DataFrame,
    hist: DataFrame,
    *,
    default: str = "__none__",
) -> DataFrame:
    """Enrich ``facts`` with the value of the most recent ``hist`` row
    at-or-before each fact's timestamp, per key — a backward as-of match
    computed imperatively inside one cogrouped pandas task per key.

    Contracts (both frames pre-normalized by the caller):
      facts: ``k long, us long`` + any number of LONG passthrough columns;
      hist:  ``k long, us long, tie long, val string`` — ties on ``us``
      resolve to the largest ``tie`` (deterministic across engines).
    Facts with no hist row at-or-before get ``default``.
    """
    pass_cols = [c for c in facts.columns if c not in ("k",)]
    out_schema = ", ".join(
        [f"{c} long" for c in pass_cols] + ["val string"]
    )

    def merge(f_pdf: pd.DataFrame, h_pdf: pd.DataFrame) -> pd.DataFrame:
        if f_pdf.empty:
            return pd.DataFrame(
                {**{c: pd.Series(dtype="int64") for c in pass_cols},
                 "val": pd.Series(dtype="object")}
            )
        out = {c: f_pdf[c].to_numpy(np.int64) for c in pass_cols}
        if h_pdf.empty:
            out["val"] = np.full(len(f_pdf), default, dtype=object)
        else:
            h = h_pdf.sort_values(["us", "tie"], kind="mergesort")
            hus = h["us"].to_numpy(np.int64)
            vals = h["val"].to_numpy(dtype=object)
            idx = (
                np.searchsorted(hus, f_pdf["us"].to_numpy(np.int64),
                                side="right") - 1
            )
            out["val"] = np.where(
                idx >= 0, vals[np.clip(idx, 0, None)], default
            )
        return pd.DataFrame(out)

    return (
        facts.groupBy("k")
        .cogroup(hist.groupBy("k"))
        .applyInPandas(merge, out_schema)
    )
