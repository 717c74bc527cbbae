"""Sequential (lookup) join: use a feature value as the key into another
feature table, then aggregate back to observation cardinality.

Reference: offline/derived/strategies/SequentialJoinAsDerivation.scala:44-167 —
obs ⟕ base feature → (explode array-valued base key :205-224) → join
expansion feature on the base value → groupBy(uid).agg to restore
cardinality; null-key rows are split out and unioned back
(DataFrameSplitterMerger.splitOnNull). The reference's uid is
``monotonically_increasing_id`` (non-deterministic across retries, noted
at :125-129); we require the caller to name an existing unique id column
instead — content-derived and retry-safe.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOOKUP_AGGS = {"SUM", "AVG", "MAX", "MIN", "UNION", "LATEST", "FIRST", "COUNT"}


def lookup_join(
    obs: DataFrame,
    uid_col: str,
    base_key: str,
    expansion: DataFrame,
    expansion_key: str,
    expansion_value: str,
    out_name: str,
    aggregation: str = "UNION",
    explode_base: bool = False,
    broadcast_expansion: bool = False,
) -> DataFrame:
    """Join ``expansion`` on ``obs[base_key]`` (optionally exploding an
    array-valued base key), aggregate ``expansion_value`` back to one row
    per ``uid_col``.

    ``aggregation``: UNION → collect_list, SUM/AVG/MAX/MIN/COUNT → the
    numeric aggregate, FIRST/LATEST → arbitrary single value (FIRST) —
    matching feathr_project/feathr/definition/aggregation.py:4-27.
    """
    aggregation = aggregation.upper()
    if aggregation not in LOOKUP_AGGS:
        raise ValueError(f"unknown lookup aggregation {aggregation}")
    if out_name in obs.columns:
        raise ValueError(f"output column {out_name} already exists")

    work = obs.select(uid_col, F.col(base_key).alias("__bk"))
    if explode_base:
        work = work.select(uid_col, F.explode_outer("__bk").alias("__bk"))

    # null-key segregation: nulls never match and must not shuffle-skew
    matched = work.where(F.col("__bk").isNotNull())
    exp = expansion.select(
        F.col(expansion_key).alias("__bk"),
        F.expr(expansion_value).alias("__val"),
    ).where(F.col("__bk").isNotNull())
    if broadcast_expansion:
        exp = F.broadcast(exp)
    joined = matched.join(exp, on="__bk", how="left")

    if aggregation == "UNION":
        agg = F.collect_list("__val")
    elif aggregation == "COUNT":
        agg = F.count("__val")
    elif aggregation in ("FIRST", "LATEST"):
        agg = F.first("__val", ignorenulls=True)
    else:
        agg = getattr(F, aggregation.lower())("__val")
    per_uid = joined.groupBy(uid_col).agg(agg.alias(out_name))

    return obs.join(per_uid, on=uid_col, how="left")
