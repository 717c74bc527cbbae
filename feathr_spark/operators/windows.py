"""Per-entity ordered window operators: lag / lead / backfill / sessionize.

These are the north-rule extras the reference expresses indirectly
(LATEST / TIMESINCE / bucketed rollups, SURVEY.md §2.5); in Spark they
are pure ``Window.partitionBy(entity).orderBy(ts)`` expressions —
JVM-side, whole-stage codegen, one shuffle per distinct partitioning.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feathr_spark.functions.timestamps import to_epoch_micros

MICROS = 1_000_000


def _entity_window(keys: Sequence[str], order_col):
    return Window.partitionBy(*[F.expr(k) for k in keys]).orderBy(order_col)


def with_lag_lead(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cols: Sequence[str],
    offsets: Sequence[int] = (1,),
    ts_format: str = "epoch",
) -> DataFrame:
    """Add ``{col}_lag{n}`` / ``{col}_lead{n}`` columns per entity, ordered
    by event time (ties broken by full column order stability is NOT
    guaranteed by Spark — pass a unique ts or add a tiebreaker)."""
    order_col = to_epoch_micros(F.expr(ts), ts_format)
    w = _entity_window(keys, order_col)
    out = df
    for c in cols:
        for n in offsets:
            out = out.withColumn(f"{c}_lag{n}", F.lag(c, n).over(w))
            out = out.withColumn(f"{c}_lead{n}", F.lead(c, n).over(w))
    return out


def backfill(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cols: Sequence[str],
    ts_format: str = "epoch",
    direction: str = "forward",
    suffix: str = "_filled",
) -> DataFrame:
    """Fill nulls from the last (or next) non-null value per entity.

    ``forward`` = last-observation-carried-forward
    (``F.last(ignorenulls=True)`` over unbounded-preceding — the
    reference's LATEST semantics applied row-wise)."""
    order_col = to_epoch_micros(F.expr(ts), ts_format)
    out = df
    for c in cols:
        if direction == "forward":
            w = _entity_window(keys, order_col).rowsBetween(Window.unboundedPreceding, 0)
            filled = F.last(c, ignorenulls=True).over(w)
        elif direction == "backward":
            w = _entity_window(keys, order_col).rowsBetween(0, Window.unboundedFollowing)
            filled = F.first(c, ignorenulls=True).over(w)
        else:
            raise ValueError("direction must be forward|backward")
        out = out.withColumn(f"{c}{suffix}", filled)
    return out


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap: float,
    ts_format: str = "epoch",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per entity.

    A new session starts when the time since the previous event exceeds
    ``gap`` seconds. ``session_id`` is 0-based per entity (cumulative sum
    of boundary flags — the standard Spark sessionization; streaming
    equivalent is ``F.session_window``).
    """
    gap_us = int(round(gap * MICROS))
    out = df.withColumn("__ts", to_epoch_micros(F.expr(ts), ts_format))
    w = _entity_window(keys, F.col("__ts"))
    prev = F.lag("__ts", 1).over(w)
    new_session = F.when(prev.isNull() | ((F.col("__ts") - prev) > gap_us), 1).otherwise(0)
    wcum = _entity_window(keys, F.col("__ts")).rowsBetween(Window.unboundedPreceding, 0)
    out = out.withColumn(session_col, (F.sum(new_session).over(wcum) - 1).cast("long"))
    return out.drop("__ts")


def session_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap: float,
    ts_format: str = "epoch",
    agg_exprs: Optional[dict] = None,
) -> DataFrame:
    """Sessionize then aggregate one row per (entity, session):
    start/end/duration/n_events plus optional extra SQL aggregate exprs
    ``{out_name: sql_agg_expr}``."""
    s = sessionize(df, keys, ts, gap, ts_format)
    s = s.withColumn("__ts", to_epoch_micros(F.expr(ts), ts_format))
    aggs = [
        F.min("__ts").alias("session_start_us"),
        F.max("__ts").alias("session_end_us"),
        ((F.max("__ts") - F.min("__ts")) / F.lit(1e6)).alias("session_duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for name, expr in (agg_exprs or {}).items():
        aggs.append(F.expr(expr).alias(name))
    gb = [F.expr(k).alias(f"key{i}") if k not in s.columns else F.col(k)
          for i, k in enumerate(keys)] + [F.col("session_id")]
    return s.groupBy(*gb).agg(*aggs)


def rolling_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    col: str,
    window_sec: float,
    ts_format: str = "epoch",
    prefix: Optional[str] = None,
) -> DataFrame:
    """Self-windowed rolling aggregates ``(t - window, t]`` per row —
    the event-stream analogue of the SWA join where every fact row is
    also an observation (one shuffle, range frames share the sort)."""
    p = prefix or f"{col}_roll"
    out = df.withColumn("__ts", to_epoch_micros(F.expr(ts), ts_format))
    w = (
        Window.partitionBy(*[F.expr(k) for k in keys])
        .orderBy("__ts")
        .rangeBetween(-int(round(window_sec * MICROS)) + 1, 0)
    )
    out = (
        out.withColumn(f"{p}_sum", F.sum(col).over(w))
        .withColumn(f"{p}_cnt", F.count(col).over(w).cast("long"))
        .withColumn(f"{p}_avg", F.avg(col).over(w))
        .withColumn(f"{p}_min", F.min(col).over(w))
        .withColumn(f"{p}_max", F.max(col).over(w))
    )
    return out.drop("__ts")
