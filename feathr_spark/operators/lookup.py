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

ELEMENTWISE_* aggregations (SequentialJoinAsDerivation.scala:300-663 —
the reference's Spark-UDAF family over array-valued expansion features)
are pure JVM here: ``collect_list`` of the arrays per uid, then a
higher-order ``aggregate``/``zip_with`` fold. Arrays must share one
length per group (the reference's UDAFs assert the same;
mismatched-length positions come out null via zip_with's null-padding).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOOKUP_AGGS = {"SUM", "AVG", "MAX", "MIN", "UNION", "LATEST", "FIRST", "COUNT",
               "ELEMENTWISE_SUM", "ELEMENTWISE_AVG", "ELEMENTWISE_MAX",
               "ELEMENTWISE_MIN"}

_EW_MERGE = {
    "ELEMENTWISE_SUM": lambda a, b: a + b,
    "ELEMENTWISE_AVG": lambda a, b: a + b,  # sum now, divide by n after
    "ELEMENTWISE_MAX": lambda a, b: F.greatest(a, b),
    "ELEMENTWISE_MIN": lambda a, b: F.least(a, b),
}


def _elementwise_agg(grouped_src: DataFrame, uid_cols: Sequence[str],
                     aggregation: str, out_name: str) -> DataFrame:
    """Fold array-valued ``__val`` rows elementwise per uid group.

    One groupBy (map-side combine on collect_list) + a codegen'd
    ``aggregate`` fold seeded with the first array — no Python, no
    explode blow-up. Output element type: double.
    """
    merge = _EW_MERGE[aggregation]
    lists = grouped_src.groupBy(*uid_cols).agg(
        F.collect_list("__val").alias("__vals"),
        F.count("__val").alias("__n"),
    )
    vals = F.col("__vals")
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.zip_with(acc, x, merge),
    )
    if aggregation == "ELEMENTWISE_AVG":
        folded = F.transform(folded, lambda x: x / F.col("__n"))
    out = F.when(F.size(vals) > 0, folded)
    return lists.select(*uid_cols, out.alias(out_name))


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
    numeric aggregate, FIRST/LATEST → arbitrary single value (FIRST),
    ELEMENTWISE_SUM/AVG/MAX/MIN → elementwise fold over array-valued
    expansion values — matching
    feathr_project/feathr/definition/aggregation.py:4-27.

    ``uid_col`` should be unique per observation row; duplicate uids are
    deduped on the slim projection before the expansion join (duplicate
    rows share all hashed content, so their aggregates are identical and
    the join-back fans the one computed row to every duplicate).
    """
    aggregation = aggregation.upper()
    if aggregation not in LOOKUP_AGGS:
        raise ValueError(f"unknown lookup aggregation {aggregation}")
    if out_name in obs.columns:
        raise ValueError(f"output column {out_name} already exists")

    work = obs.select(uid_col, F.col(base_key).alias("__bk")).dropDuplicates([uid_col])
    if explode_base:
        work = work.select(uid_col, F.explode_outer("__bk").alias("__bk"))

    # null-key segregation: nulls never match and must not shuffle-skew
    matched = work.where(F.col("__bk").isNotNull())
    val_expr = F.expr(expansion_value)
    if aggregation.startswith("ELEMENTWISE_"):
        val_expr = F.transform(val_expr, lambda x: x.cast("double"))
    exp = expansion.select(
        F.col(expansion_key).alias("__bk"),
        val_expr.alias("__val"),
    ).where(F.col("__bk").isNotNull())
    if broadcast_expansion:
        exp = F.broadcast(exp)
    joined = matched.join(exp, on="__bk", how="left")

    if aggregation.startswith("ELEMENTWISE_"):
        per_uid = _elementwise_agg(joined.where(F.col("__val").isNotNull()),
                                   [uid_col], aggregation, out_name)
    else:
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
