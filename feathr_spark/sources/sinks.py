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
