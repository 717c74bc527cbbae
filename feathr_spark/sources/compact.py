"""Parquet dataset compaction — the small-file maintenance pass.

Incremental pipelines in this repo append output in many small pieces:
per-epoch dynamic-partition overwrites (streaming/dedup.py), per-cutoff
materialization snapshots (materialize.py), per-wave shard files
(sources/shards.py). At 100 TB the resulting file population is the
classic small-file problem — scan planning cost, footer overhead, and
task fan-out all scale with file COUNT, not bytes. Compaction rewrites
a dataset into size-targeted files, optionally re-sorted for
row-group/file skipping, and swaps it in atomically.

Reference analogue: table-maintenance `rewrite_data_files` of the
Iceberg ecosystem the reference targets for storage (SURVEY §2.1
bucketed/Iceberg rows); here as a connector-free parquet form.

Storage note: byte accounting and the atomic swap use driver-local
``os`` calls — same contract as sources/shards.py manifest I/O
(driver-visible filesystem; for raw HDFS/S3 use the Hadoop FileSystem
API instead).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def dataset_file_stats(path: str) -> dict:
    """File-population stats for a parquet dataset directory:
    ``{files, bytes, mean_file_mb, small_files}`` (small = <8 MB, the
    regime where footer+planning overhead dominates)."""
    files = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                files.append(os.path.getsize(os.path.join(root, n)))
    total = sum(files)
    return {
        "files": len(files),
        "bytes": total,
        "mean_file_mb": round(total / len(files) / 2**20, 3) if files else 0.0,
        "small_files": sum(1 for s in files if s < 8 * 2**20),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    sort_by: Sequence[str] = (),
    partition_by: Sequence[str] = (),
    compression: Optional[str] = None,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite the parquet dataset at ``path`` into ~``target_file_mb``
    files and atomically swap it in. Returns a report with before/after
    file stats.

    - ``sort_by``: range-partition + sort within files on these columns
      (clusters row groups for min/max skipping — e.g. ``(source, ts)``
      so time-range scans prune files). Without it, a plain coalesce-
      style repartition preserves existing order per file.
    - ``partition_by``: re-emit these as directory partitions (pass the
      existing partition columns to keep the layout; file counts are
      then per-partition).
    - Datasets already at ``min_files_to_compact`` files or fewer are
      left untouched (report says ``skipped``).

    Atomicity: the rewrite lands in ``<path>.__compact_tmp``; the old
    dataset moves to ``<path>.__compact_old`` and the new one renames
    in, then the old is deleted — a crash leaves either the original or
    the finished dataset plus a stray directory, never a half-written
    dataset at ``path``. Scale: one scan + one (optional range)
    exchange; file sizing derives from the dataset's REAL bytes, not a
    row-count guess.
    """
    before = dataset_file_stats(path)
    if before["files"] <= min_files_to_compact:
        return {"path": path, "skipped": True, "before": before,
                "after": before, "wall_s": 0.0}
    t0 = time.monotonic()
    n_files = max(1, round(before["bytes"] / (target_file_mb * 2**20)))
    df: DataFrame = spark.read.parquet(path)
    if sort_by:
        out = (df.repartitionByRange(n_files, *sort_by)
               .sortWithinPartitions(*sort_by))
    else:
        out = df.repartition(n_files)
    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path.rstrip("/"), old)
    os.replace(tmp, path.rstrip("/"))
    shutil.rmtree(old, ignore_errors=True)
    return {
        "path": path,
        "skipped": False,
        "before": before,
        "after": dataset_file_stats(path),
        "target_file_mb": target_file_mb,
        "n_files_planned": n_files,
        "wall_s": round(time.monotonic() - t0, 3),
    }
