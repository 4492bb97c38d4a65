"""SparkSession factory tuned for this engine.

Replaces the reference's runner selection (reference run_preprocess.py:136-144:
``"DataflowRunner" if args.cloud else "DirectRunner"``) with a single
SparkSession whose physical execution is delegated to Catalyst + AQE.

Scale posture: AQE on (runtime coalesce, skew-join splitting), shuffle
partitions sized by caller (defaults to cores in local mode), UTC session
timezone so results are oracle-comparable, Arrow enabled for every
Python-boundary crossing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "videos_to_tfrecords_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode there is a single JVM; on a real cluster the same conf
    holds — AQE re-plans shuffles at runtime, which is what makes the
    sf0.001 plans survive a 100 TB scale-up without retuning.
    """
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    if os.environ.get("SPARK_GRAFT_JVM_PRETOUCH", "1") != "0":
        driver_jvm_opts = f"-Xms{driver_mem} -XX:+AlwaysPreTouch"
    else:
        driver_jvm_opts = ""
    # Python workers allocate/free large Arrow buffers per batch; glibc
    # munmaps them on free, so every batch re-faults fresh pages. Keep the
    # buffers in the reusable heap instead (same slow-fault-path rationale
    # as the JVM pre-touch above). Set in our own env before the JVM (and
    # hence the python daemon) is forked, and mirrored to executorEnv for
    # non-local masters.
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet files whose timestamps are stored without a UTC-adjustment
        # flag (isAdjustedToUTC=false, e.g. pyarrow timestamp[us]) would be
        # inferred as TIMESTAMP_NTZ by Spark 4, which unix_micros()/window()
        # reject or reinterpret. Read them as TIMESTAMP_LTZ under the UTC
        # session zone instead — byte-identical epoch micros either way, and
        # the whole operator surface (event-time windows, as-of joins,
        # unix_micros) expects the instant type.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: the driver JVM IS the executor — size its heap for 32
        # concurrent tasks (the box has 128 GiB; 8g let accumulated
        # localCheckpoint blocks + a big sort evict each other at sf1,
        # killing every query after the pressure point in one session)
        .config("spark.driver.memory", driver_mem)
        # Pin the heap: commit Xms=Xmx up front and pre-touch it so the
        # committed range is faulted once at startup. Without this, G1
        # uncommits after every full GC and the next query re-faults the
        # pages — on hosts with an overcommitted/slow anonymous-fault path
        # (measured ~0.33 GB/s vs ~13 GB/s resident on this sandbox) that
        # turns heap churn into the dominant query cost. On a healthy host
        # the pre-touch costs a few seconds of startup, outside any timed
        # region. Opt out with SPARK_GRAFT_JVM_PRETOUCH=0.
        .config("spark.driver.extraJavaOptions", driver_jvm_opts)
        .config("spark.ui.enabled", "false")
        # Parquet scans: pushdown + pruning are on by default; keep splits
        # bounded so a 100 TB table yields sane task counts.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "268435456")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "268435456")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
