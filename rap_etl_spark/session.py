"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set per-executor on a real
cluster: AQE on (runtime coalesce + skew-join split), shuffle partition
count matched to parallelism, Arrow transfer for the vectorized token
kernels, UTC session timezone so parquet timestamps compare stably
against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rap-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` controls local[N]; default comes from $SPARK_GRAFT_CPUS or
    all cores. ``shuffle_partitions`` defaults to 2x parallelism — small
    enough to avoid tiny-task overhead locally, and AQE coalesces
    further at runtime. On a real cluster these would scale with
    executor count; nothing here is local-mode-only logic.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # ParallelGC: the token-array payloads allocate heavily in scans and
        # aggregations; G1 at high thread counts spent more time pacing than
        # collecting here (measured 2-4x slowdowns at local[32]).
        # Override with SPARK_GRAFT_JAVA_OPTS for GC experiments.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        # hash joins over sort-merge where legal: CDC winner-join and merge
        # joins are selective; sorting the big side is wasted work (AQE can
        # still demote to broadcast at runtime)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Python worker crash diagnostics (no steady-state cost): this VM
        # intermittently kills workers mid-synthesis; with these on, a real
        # fault prints the worker's Python traceback instead of a bare EOF
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # deterministic timestamp behavior for oracle comparison
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
