"""Sequence packing: fill fixed-size token bins with documents (the step
between a tokenized corpus and fixed-length training batches).

Greedy first-fit is inherently a sequential scan, so packing runs
per-partition in an Arrow batch (mapInPandas): documents are packed in
(partition, arrival) order into bins of ``capacity`` tokens; a document
longer than the capacity gets its own bin (truncation is the tokenizer's
job, not the packer's). Bin ids are globally unique via the partition id.

Scale: no shuffle at all — each partition packs independently, which is
exactly what a 100 TB packing job wants (global optimality of bin usage is
irrelevant next to throughput; per-partition fill rates are asserted in
tests). Deterministic given a deterministic upstream ordering (e.g. after
repartitionByRange on doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    capacity: int = 256,
) -> DataFrame:
    """Assign each doc a (bin_id, offset): greedy first-fit-in-order per
    partition. Output: id, n_tokens, bin_id (string 'partition-seq'),
    offset (token start within the bin)."""

    def pack(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bin_seq, fill = 0, 0
        rows = {"_id": [], "_n": [], "bin_id": [], "offset": []}
        for pdf in batches:
            for doc_id, n in zip(pdf[id_col], pdf[n_tokens_col]):
                n = int(n)
                if fill > 0 and fill + n > capacity:
                    bin_seq += 1
                    fill = 0
                rows["_id"].append(doc_id)
                rows["_n"].append(n)
                rows["bin_id"].append(f"{pid}-{bin_seq}")
                rows["offset"].append(fill)
                fill += n
                if fill >= capacity:
                    bin_seq += 1
                    fill = 0
            out = pd.DataFrame(rows)
            rows = {"_id": [], "_n": [], "bin_id": [], "offset": []}
            yield out.rename(columns={"_id": id_col, "_n": n_tokens_col})

    return df.select(id_col, n_tokens_col).mapInPandas(
        pack, f"{id_col} long, {n_tokens_col} long, bin_id string, offset long"
    )
