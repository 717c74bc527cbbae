"""Multi-level time-bucket rollups.

Reference: MultiLevelAggregationTransform.scala:13-120 — the
BUCKETED_COUNT_DISTINCT / BUCKETED_SUM aggregates roll metrics up a
fixed ladder of time resolutions (5m -> 1h -> 1d -> 1w -> 1M -> 1y),
each level computed from the previous with Spark window/groupBy ops
rather than the SWA merge iterator.

Spark-first shape: level 0 is ONE ``groupBy(keys, window(ts, res))``
over the raw data (map-side partial agg, single shuffle); every coarser
level re-aggregates the previous level's buckets — rows shrink by the
resolution ratio at each step, so the total cost is dominated by the
finest level. SUM/COUNT/MIN/MAX re-aggregate exactly; COUNT_DISTINCT
cannot be re-aggregated from counts, so distinct levels either
recompute from raw (exact=True) or merge HLL sketches
(approx, exact=False) — the scalable default at corpus size.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# resolution ladder (seconds): 5m, 1h, 1d, 1w
LEVELS = {"5m": 300, "1h": 3600, "1d": 86400, "1w": 604800}

_REAGG = {"SUM": F.sum, "COUNT": F.sum, "MIN": F.min, "MAX": F.max}
_BASE = {"SUM": F.sum, "COUNT": F.count, "MIN": F.min, "MAX": F.max}


def time_bucket(ts_col, resolution_s: int):
    """Floor an epoch-seconds column to its bucket start."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.floor(c.cast("double") / resolution_s) * resolution_s).cast("long")


def bucketed_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    metric: str,
    agg: str,
    resolution_s: int,
    out_name: str = "value",
    bucket_name: str = "bucket_start",
) -> DataFrame:
    """One level: groupBy(keys, bucket) agg(metric)."""
    agg = agg.upper()
    fn = _BASE.get(agg)
    if fn is None:
        raise ValueError(f"bucketed_agg supports {sorted(_BASE)}, got {agg}")
    return (
        df.groupBy(*keys, time_bucket(ts_col, resolution_s).alias(bucket_name))
        .agg(fn(F.expr(metric)).alias(out_name))
    )


def multi_level_rollup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    metric: str,
    agg: str = "SUM",
    levels: Optional[Sequence[str]] = None,
    out_name: str = "value",
) -> dict[str, DataFrame]:
    """Rollup ladder: {level_name: DataFrame(keys..., bucket_start, value)}.

    Coarser levels re-aggregate the finest level's buckets — the
    reference's RollUpLevel chain — so raw data is scanned once.
    """
    agg = agg.upper()
    names = list(levels or LEVELS.keys())
    secs = [LEVELS[n] if n in LEVELS else int(n) for n in names]
    order = sorted(range(len(secs)), key=lambda i: secs[i])
    names = [names[i] for i in order]
    secs = [secs[i] for i in order]
    for a, b in zip(secs, secs[1:]):
        if b % a != 0:
            raise ValueError(f"levels must nest: {b} not a multiple of {a}")

    out: dict[str, DataFrame] = {}
    base = bucketed_agg(df, keys, ts_col, metric, agg, secs[0], out_name)
    out[names[0]] = base
    prev = base
    reagg = _REAGG[agg]
    for name, res in zip(names[1:], secs[1:]):
        prev = (
            prev.groupBy(*keys, time_bucket("bucket_start", res).alias("__b2"))
            .agg(reagg(F.col(out_name)).alias(out_name))
            .withColumnRenamed("__b2", "bucket_start")
            .select(*keys, "bucket_start", out_name)
        )
        out[name] = prev
    return out


def bucketed_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    metric: str,
    levels: Optional[Sequence[str]] = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> dict[str, DataFrame]:
    """Distinct-count ladder. ``exact=True`` recomputes each level from
    raw rows (distinct counts don't re-aggregate); the default merges
    approx sketches level-to-level is NOT possible with the DataFrame
    API's approx_count_distinct output (a finalized long), so approx
    mode also computes each level from raw — still one scan per level
    but no per-bucket state explosion."""
    names = list(levels or LEVELS.keys())
    out: dict[str, DataFrame] = {}
    for name in names:
        res = LEVELS[name] if name in LEVELS else int(name)
        fn = F.count_distinct(F.expr(metric)) if exact \
            else F.approx_count_distinct(F.expr(metric), rsd)
        out[name] = (
            df.groupBy(*keys, time_bucket(ts_col, res).alias("bucket_start"))
            .agg(fn.alias("n_distinct"))
        )
    return out
