"""Sinks.

Reference: WriteToHDFSOutputProcessor + FeatureGenerationPathName
(daily/hourly output layout ``root/df0/daily/yyyy/MM/dd``), plus the
generic ``df.write.format(...)`` sinks (definition/sink.py:169-380).
The Redis/online sinks are out of scope — offline parquet is the
contract here; resumable materialization sinks live in
feathr_spark.materialize.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Optional

from pyspark.sql import DataFrame


def write_sink(df: DataFrame, path: str, fmt: str = "parquet",
               mode: str = "overwrite", options: Optional[dict] = None,
               partition_by: Optional[list] = None) -> None:
    """Generic sink: ``df.write.format(fmt)`` with options/partitioning."""
    w = df.write.format(fmt).mode(mode).options(**(options or {}))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_partitioned(df: DataFrame, root: str, cutoff_epoch_s: int,
                      hourly: bool = False, fmt: str = "parquet") -> str:
    """Write one snapshot under the reference's daily/hourly layout:
    ``root/daily/yyyy/MM/dd`` or ``root/hourly/yyyy/MM/dd/HH``. Returns
    the partition path."""
    t = datetime.fromtimestamp(cutoff_epoch_s, tz=timezone.utc)
    rel = t.strftime("hourly/%Y/%m/%d/%H" if hourly else "daily/%Y/%m/%d")
    path = os.path.join(root, rel)
    df.write.format(fmt).mode("overwrite").save(path)
    return path


def feature_stats(df: DataFrame, cols: Optional[list] = None) -> DataFrame:
    """Per-feature summary statistics, long format: one row per feature
    with (n_rows, n_null, mean, stddev, min, max).

    The reference's feature-monitoring output processor computes per-
    feature stats and writes them to a SQL sink
    (offline/generation/outputProcessor/FeatureMonitoringProcessor.scala);
    here it is one full scan with map-side partial aggregation (a single
    agg over all columns — NOT one job per feature), then a row-explode
    of the single aggregate row, so cost at 100 TB is one pass.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if cols is None:
        cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, T.NumericType)]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.count(d).alias(f"{c}__nn"),
            F.avg(d).alias(f"{c}__mean"),
            F.stddev_samp(d).alias(f"{c}__std"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    packed = [
        F.struct(
            F.lit(c).alias("feature"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__mean").alias("mean"),
            F.col(f"{c}__std").alias("stddev"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*packed)).alias("s")).select("s.*")


def monitor_sink(df: DataFrame, path: str, cols: Optional[list] = None,
                 fmt: str = "parquet") -> None:
    """Write feature_stats(df) — the offline analogue of the reference's
    monitoring output processor."""
    feature_stats(df, cols).coalesce(1).write.format(fmt).mode("overwrite").save(path)
