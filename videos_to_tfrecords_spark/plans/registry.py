"""Query registry backing ``__spark_entry__``.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable, usually
paired with an equivalent ANSI-SQL oracle string DuckDB can run on the same
parquet tables. Queries without an oracle are genuinely non-SQL-expressible
(proto serialization, seeded randomness, approximate sketches) and get the
driver's weaker rows-only check; each says why in its docstring.

Cross-engine determinism rules used throughout (so value hashes match):
- money/doubles are aggregated in exact integer cents (``round(x*100)`` per
  row, then integer sums) — float summation order is engine-dependent,
  integer sums are not;
- every collected sequence is sorted by a total (tie-broken) key;
- window bounds and timestamps are exact integer epoch µs/ms;
- column aliases are identical on both sides (the driver sorts columns by
  name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
#: names whose REGISTRATION is environment-gated (the row only exists
#: where an optional dependency imports — e.g. video_decode_real_census
#: iff cv2). Always populated, present in QUERIES or not, so gate-merge
#: tooling can compute "missing" independently of the merging box's env
#: (ADVICE r09: the merged verdict must not depend on where the merge ran).
ENV_GATED: set[str] = set()
#: defining module per query (e.g. "videos_to_tfrecords_spark.plans.
#: text_queries") — lets tools/check_oracle.py --changed map a git diff to
#: the queries it can affect
MODULES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        # a silent dict overwrite once shadowed an upgraded query with a
        # stale twin in another module (which version ran depended on
        # import order) — duplicate registration is always a bug, so fail
        # loud at import time instead
        if name in QUERIES:
            raise ValueError(
                f"query {name!r} already registered by {MODULES[name]};"
                f" duplicate registration from {fn.__module__}"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        MODULES[name] = fn.__module__
        return fn

    return deco
