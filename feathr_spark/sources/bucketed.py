"""Bucketed + sorted fact-table storage (shuffle-free SWA scans).

The north-star storage layout is an Iceberg table hash-partitioned by
entity key and sorted by timestamp within partitions (SURVEY.md §1.2).
No Iceberg runtime ships in this sandbox, so the functional equivalent
is Spark's native bucketed tables: ``bucketBy(N, key).sortBy(key, ts)``
parquet written through the catalog.

Why it matters at 100 TB: a bucketed scan reports
``HashPartitioning(key, N)``, which satisfies the ClusteredDistribution
required by ``Window.partitionBy(key)`` and by equi-joins/groupBy on the
key — Catalyst elides the Exchange, so the SWA union strategy reads the
fact table WITHOUT re-shuffling it (the dominant cost at scale: the
fact side is orders of magnitude larger than the observation side).
``verify_no_fact_exchange`` asserts that plan property in tests.

Reference analogue: the reference re-sorts per job
(swj/SlidingWindowJoin.scala:44-45 repartition + sortWithinPartitions);
persistent bucketing amortizes that across every job that reads the
table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    sort_cols: Optional[Sequence[str]] = None,
    num_buckets: int = 128,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: Optional[str] = None,
) -> None:
    """Write ``df`` as a bucketed, within-bucket-sorted catalog table.

    ``sort_cols`` defaults to ``bucket_keys`` (+ nothing): pass
    ``[key, ts]`` for the SWA layout so in-bucket files are
    timestamp-sorted per entity.
    """
    sort_cols = list(sort_cols or bucket_keys)
    w = df.write.format(fmt).mode(mode) \
        .bucketBy(num_buckets, *bucket_keys).sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — must go through the table (not the raw path) or
    Spark forgets the bucketing metadata and re-shuffles."""
    return spark.table(table)


def verify_no_fact_exchange(df: DataFrame, scan_table: Optional[str] = None) -> bool:
    """True when no Exchange sits between the bucketed scan and its
    consumer — i.e. bucketing actually removed the fact-side shuffle.

    With ``scan_table`` given, only the plan lines BETWEEN the root and
    that table's scan line are inspected (an observation-side or
    post-aggregation Exchange elsewhere in the plan is fine); without
    it, the whole plan must be Exchange-free (single-branch plans).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if scan_table is None:
        return "Exchange" not in plan
    lines = plan.splitlines()
    scan_idx = [i for i, ln in enumerate(lines)
                if "Scan" in ln and scan_table in ln]
    if not scan_idx:
        return False  # scan not found -> cannot verify
    # plan strings print parents above children: an Exchange ABOVE the
    # scan line at greater-or-equal indentation depth belongs to another
    # branch; walk up from the scan following decreasing indentation
    # (the ancestor chain) and fail on any Exchange ancestor.
    def indent(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" +-:*"))

    for si in scan_idx:
        depth = indent(lines[si])
        for i in range(si - 1, -1, -1):
            d = indent(lines[i])
            if d < depth:
                depth = d
                if "Exchange" in lines[i]:
                    return False
    return True
