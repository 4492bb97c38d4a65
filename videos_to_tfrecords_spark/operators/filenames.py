"""File-listing source ops: wrap, filter by extension, extract label.

Reference parity:
- ``create_filenames`` — reference preprocess.py:313-324 (Create → Map to
  {"filename"} dict → extension filter).
- extension filter — reference preprocess.py:320-323: keep rows whose
  ``filename.split(".")[-1]`` ∈ {mkv, avi, mp4}.
- ``extract_label`` — reference preprocess.py:268-274: label is the
  3rd-from-last "/"-separated path segment.

All three are pure Catalyst expressions (split/element_at/isin) — no UDFs, so
they stay inside whole-stage codegen and push no work to Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VIDEO_EXTENSIONS = ("mkv", "avi", "mp4")  # reference preprocess.py:321


def create_filenames(
    spark: SparkSession,
    files: Sequence[str],
    extensions: Sequence[str] = VIDEO_EXTENSIONS,
) -> DataFrame:
    """In-memory file list → filtered filename table.

    Mirrors the reference's driver-side listing (preprocess.py:373-381); for
    real storage prefer ``spark.read.format("binaryFile")`` which lists
    distributed and streams content (SURVEY §2.1 S1/S3).
    """
    df = spark.createDataFrame([(f,) for f in files], "filename string")
    return filter_extensions(df, extensions=extensions)


def filter_extensions(
    df: DataFrame,
    col: str = "filename",
    extensions: Sequence[str] = VIDEO_EXTENSIONS,
) -> DataFrame:
    """Keep rows whose last '.'-segment is a known extension (P2)."""
    ext = F.element_at(F.split(F.col(col), "\\."), -1)
    return df.filter(ext.isin(*extensions))


def extract_label(df: DataFrame, col: str = "filename", out: str = "label") -> DataFrame:
    """label = split(filename, "/")[-3] (P3, reference preprocess.py:273)."""
    return df.withColumn(out, F.element_at(F.split(F.col(col), "/"), -3))
