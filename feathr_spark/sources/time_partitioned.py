"""Time-partitioned source scan.

Reference: PathPartitionedTimeSeriesSourceAccessor.scala:53-66 discovers
``base/yyyy/MM/dd[/HH]`` partition directories inside a requested time
range, unions them reconciling schema drift (``fuzzyUnion``,
DataFrameExt.scala:36-41), and can synthesize a timestamp column from
the partition path (timePartitionPattern,
TimeBasedHdfsPathGenerator.scala).

Spark-first shape: at cluster scale this directory zoo is ONE
partitioned table (Iceberg / Hive-style ``date=``/``hour=`` columns)
and the range filter is a partition-pruning predicate; this reader
exists for parity with the reference's layout and for migrating such
layouts in. Discovery lists only directories inside the requested range
(no full-tree listing) and each day loads through one ``spark.read``,
so the scan parallelism is Spark-native.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feathr_spark.sources.batch import read_batch


def _hour_range(start_epoch_s: int, end_epoch_s: int, hourly: bool):
    step = timedelta(hours=1) if hourly else timedelta(days=1)
    t = datetime.fromtimestamp(start_epoch_s, tz=timezone.utc)
    t = t.replace(minute=0, second=0, microsecond=0)
    if not hourly:
        t = t.replace(hour=0)
    end = datetime.fromtimestamp(end_epoch_s, tz=timezone.utc)
    out = []
    while t <= end:
        out.append(t)
        t = t + step
    return out


def read_time_partitioned(
    spark: SparkSession,
    base_path: str,
    start_epoch_s: int,
    end_epoch_s: int,
    hourly: bool = False,
    fmt: Optional[str] = None,
    timestamp_col: Optional[str] = None,
) -> DataFrame:
    """Union all ``base/yyyy/MM/dd[/HH]`` partitions in the range
    [start, end] (UTC). Missing partitions are skipped; schema drift is
    reconciled union-by-name with nulls for missing columns. If
    ``timestamp_col`` is given, the partition time is synthesized into
    that column (epoch seconds) — the reference's
    ``timePartitionPattern`` semantics.
    """
    dfs = []
    for t in _hour_range(start_epoch_s, end_epoch_s, hourly):
        rel = t.strftime("%Y/%m/%d/%H" if hourly else "%Y/%m/%d")
        p = os.path.join(base_path, rel)
        if not os.path.exists(p):
            continue
        df = read_batch(spark, p, fmt=fmt)
        if timestamp_col:
            df = df.withColumn(timestamp_col, F.lit(int(t.timestamp())))
        dfs.append(df)
    if not dfs:
        raise FileNotFoundError(
            f"no partitions under {base_path} in [{start_epoch_s}, {end_epoch_s}]")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
