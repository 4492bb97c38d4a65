"""Python STREAMING data source (Spark 4 ``DataSource.simpleStreamReader``,
SPARK-45065) — the streaming twin of sources/tfrecord_datasource.py's batch
reader: a user-defined source whose offsets, chunking and replay are plain
Python, driven by the engine's microbatch loop.

``EventsReplaySource`` replays a parquet events table in K deterministic
row-range chunks (pyarrow read, file order): offset {"i": k} → chunk k,
empty read past the end, so ``processAllAvailable`` drains it like any
bounded source and the census downstream is hash-checkable against the
parquet directly — exactly-once chunk replay pinned by value.

Scale posture: the SIMPLE stream-reader API is by design driver-side (the
engine prefetches ``read()`` results on the driver and ships them to
executors) — it is the control surface for custom offset schemes, not the
data path. At data scale you implement ``streamReader`` (partition-planning
API, executors pull) or stay on the built-in file/kafka sources; this
module documents and tests the API contract, with chunk sizes bounded by
the offset step.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

N_CHUNKS = 4


class _EventsReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str):
        self._path = path

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        import pyarrow.parquet as pq

        k = start["i"]
        if k >= N_CHUNKS:
            return iter([]), {"i": k}
        tbl = pq.read_table(
            self._path, columns=["event_id", "event_type", "value"]
        )
        n = tbl.num_rows
        lo = k * n // N_CHUNKS
        hi = (k + 1) * n // N_CHUNKS
        chunk = tbl.slice(lo, hi - lo).to_pylist()
        # list, not generator: the engine pickles the prefetched rows
        rows = [
            (r["event_id"], r["event_type"], int(round(r["value"] * 100)))
            for r in chunk
        ]
        return iter(rows), {"i": k + 1}

    def readBetweenOffsets(self, start, end):
        # deterministic replay on recovery: same chunk arithmetic
        rows, _ = self.read(start)
        return rows


class EventsReplaySource(DataSource):
    """``spark.readStream.format("events_replay").option("path", ...)``."""

    @classmethod
    def name(cls):
        return "events_replay"

    def schema(self):
        return "event_id long, event_type string, cents long"

    def simpleStreamReader(self, schema):
        return _EventsReplayReader(self.options["path"])
