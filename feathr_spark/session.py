"""SparkSession construction for the feathr_spark engine.

Local-mode defaults mirror what a 1000-executor deployment would set
cluster-wide: AQE on (runtime skew-join splitting + partition
coalescing), Arrow enabled for the pandas-kernel operators, UTC session
timezone (oracle comparisons are TZ-naive), and shuffle parallelism
sized to the actual core count rather than the 200 default.

Reference analogue: the reference clamps join parallelism to
[10, 10000] (feathr-impl/.../offline/job/FeatureJoinJob.scala:57-65);
we let AQE coalesce instead and expose the knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    cpus: int | None = None,
    app_name: str = "feathr_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this engine.

    ``cpus`` controls ``local[N]`` parallelism — the bench harness runs
    the same job at two values (8 and 32) to evidence scaling
    efficiency, so this must actually change executor-thread count.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("FEATHR_SPARK_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        # runtime bloom-filter join: Spark-native replacement for the
        # reference's explicit bloom-filter semi-join reduction
        # (offline/join/OptimizerUtils.scala:117-161)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
