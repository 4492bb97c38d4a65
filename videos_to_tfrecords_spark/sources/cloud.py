"""Cloud-storage ingestion: the swap-in point for the reference's GCS
signed-URL video reader (reference preprocess.py:131-153, which builds a
V4 signed URL per blob so cv2.VideoCapture can stream it).

Spark-first, the reference's two storage concerns split cleanly:

1. **Listing + bytes** — `spark.read.format("binaryFile")` against a
   ``gs://`` glob does both distributively once the GCS Hadoop connector
   is on the classpath (`spark.jars.packages =
   com.google.cloud.bigdataoss:gcs-connector:hadoop3-<ver>`, plus
   `google.cloud.auth.service.account.enable=true` or workload
   identity). No driver-side listing, no signed URLs: executors read
   blob ranges directly, and `pathGlobFilter` / `modifiedAfter` push
   into the listing. :func:`read_binary_blobs` is that path, local or
   cloud — the engine's tests drive it on file:// URIs.

2. **Streaming decode without full download** — the one case the
   reference's signed URLs actually buy (cv2 seeking over HTTP).
   :func:`sign_gcs_urls` is the executor-side twin: a mapInPandas stage
   that signs each ``gs://`` path with the worker's service-account
   credentials, so a downstream decoder can hand cv2/ffmpeg a URL
   instead of staging bytes. Import-gated on google-cloud-storage (not
   in this container); the Arrow plumbing — schema, batching, per-worker
   client — is the engine's standard decode-stage shape (ml/video.py).

Both are public-API integrations (Spark binaryFile + GCS connector,
google-cloud-storage V4 signing); no proprietary systems involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_binary_blobs(
    spark: SparkSession,
    path_glob: str,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """Distributed blob scan: (path, modificationTime, length, content)
    via the binaryFile source — works for file://, gs://, s3a://, abfss://
    given the matching Hadoop connector. The production replacement for
    the reference's driver-side bucket listing (preprocess.py:120-129)."""
    reader = spark.read.format("binaryFile")
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return reader.load(path_glob)


def sign_gcs_urls(
    files: DataFrame,
    path_col: str = "path",
    url_col: str = "signed_url",
    expiration_minutes: int = 60,
) -> DataFrame:
    """Executor-side V4 URL signing (reference preprocess.py:131-153, the
    ``generate_signed_url`` helper, re-expressed as a distributed column
    transform): one google-cloud-storage client per Python worker, one
    signed URL per ``gs://bucket/name`` row, Arrow-batched. Downstream,
    ml/video.decode_videos(use_real=True) can read the URL instead of a
    staged blob — cv2.VideoCapture accepts HTTP(S) sources.

    Import-gated: google-cloud-storage is not in this container, so the
    stage raises at execution with the install recipe; the plumbing shape
    (mapInPandas, per-worker client cache, schema passthrough + one added
    string column) is the engine's standard pattern and is what a cloud
    deployment runs unchanged."""
    import pandas as pd

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in files.schema.fields
    ) + f", {url_col} string"

    def sign(batches):
        try:
            from datetime import timedelta

            from google.cloud import storage  # type: ignore
        except ImportError as e:  # pragma: no cover - env without GCS sdk
            raise ImportError(
                "sign_gcs_urls needs google-cloud-storage: "
                "pip install google-cloud-storage (executors need "
                "service-account credentials with signBlob permission)"
            ) from e
        client = storage.Client()
        for pdf in batches:
            urls = []
            for p in pdf[path_col]:
                assert p.startswith("gs://"), f"not a GCS path: {p}"
                bucket_name, blob_name = p[5:].split("/", 1)
                blob = client.bucket(bucket_name).blob(blob_name)
                urls.append(
                    blob.generate_signed_url(
                        version="v4",
                        expiration=timedelta(minutes=expiration_minutes),
                        method="GET",
                    )
                )
            out = pdf.copy()
            out[url_col] = pd.Series(urls, index=pdf.index)
            yield out

    return files.mapInPandas(sign, out_schema)
