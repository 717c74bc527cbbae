"""Sliding-window aggregation (SWA) join: the engine's crown jewel.

Joins an observation (label) DataFrame against a time-stamped fact
DataFrame, producing one aggregate feature column per
:class:`~feathr_spark.definitions.SWAFeature`, each computed over the
window ``(t_obs - width - delay, t_obs - delay]`` per entity key —
point-in-time correct, zero temporal leakage.

Two physical strategies, picked automatically:

1. ``union`` (pure JVM / Catalyst / whole-stage codegen): observation
   and fact rows are unioned on (key, ts) and every aggregate becomes a
   Spark SQL window frame ``rangeBetween(-(width+delay)+1, -delay)``
   over int64 microsecond timestamps, evaluated only at observation
   rows. One shuffle + one sort per key; no Python in the hot path.
   Used when every feature is a plain frame-expressible aggregate.

2. ``cogroup`` (vectorized Arrow kernel): both sides are cogrouped by
   key and merged with numpy ``searchsorted`` + prefix sums
   (:mod:`feathr_spark.operators.kernels`) — the vectorized analogue of
   the reference's sorted-merge iterator
   (feathr-impl/.../swj/SlidingWindowJoin.scala:31-110). Required for
   grouped top-K output, element-wise pooling, and any custom
   aggregate. Hot-key skew is handled by replicating fact rows for hot
   keys across salt buckets and hashing observations into buckets
   (the reference's SaltedSparkJoin.scala:37-130 scheme — AQE cannot
   split a cogroup, so salting is explicit here).

Shared optimizations (reference parity):
- fact time-range prefilter ``[min_obs - max(width+delay), max_obs - min(delay)]``
  (AnchorToDataSourceMapper.scala:105-145) → partition pruning at the scan
- null-key observation segregation: null keys never match and are
  unioned back with null features (SlidingWindowJoinIterator.scala:350-353,
  SlidingWindowAggregationJoiner.scala:232-234,275-278)
- optional left-semi reduction of fact by observed keys (the explicit
  form of the reference's bloom-filter reduction, OptimizerUtils.scala:117-161;
  Spark's runtime bloom-filter join covers the equi-join path natively)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feathr_spark.definitions import FRAME_AGGS, SWAFeature
from feathr_spark.functions.timestamps import to_epoch_micros
from feathr_spark.operators import kernels

_NUMERIC_AGGS = {"SUM", "AVG", "MIN", "MAX"}


# ---------------------------------------------------------------------------
# shared prep
# ---------------------------------------------------------------------------


def _key_cols(n: int) -> list[str]:
    return [f"__k{i}" for i in range(n)]


def _with_keys_ts(df: DataFrame, keys: Sequence[str], ts: str, ts_format: str) -> DataFrame:
    out = df
    for i, k in enumerate(keys):
        out = out.withColumn(f"__k{i}", F.expr(k))
    return out.withColumn("__ts", to_epoch_micros(F.expr(ts), ts_format))


def _metric_expr(f: SWAFeature):
    """Metric column expr with the reference's COUNT rewrite and filter
    fold (CASE WHEN filter THEN metric ELSE NULL END,
    FeatureTransformer.scala:24-46; COUNT rewrite
    SlidingWindowFeatureUtils.scala:184-188)."""
    raw = F.expr(f.metric)
    if f.agg == "COUNT":
        raw = F.when(raw.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    if f.filter:
        raw = F.when(F.expr(f.filter), raw)
    return raw


def _out_field(f: SWAFeature, metric_dtype: T.DataType) -> T.StructField:
    if f.group_by is not None:
        return T.StructField(
            f.name,
            T.ArrayType(T.StructType([
                T.StructField("group", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ])),
        )
    if f.agg in ("COUNT", "COUNT_DISTINCT", "APPROX_COUNT_DISTINCT"):
        return T.StructField(f.name, T.LongType())
    if f.agg == "LATEST":
        return T.StructField(f.name, metric_dtype)
    if f.agg.endswith("_POOLING"):
        return T.StructField(f.name, T.ArrayType(T.DoubleType()))
    return T.StructField(f.name, T.DoubleType())


def _split_null_keys(obs: DataFrame, n_keys: int):
    """Null join keys never match (reference compares them as -1); null
    timestamps can't be windowed. Segregate those rows; they are unioned
    back with all-null features."""
    cond = F.col("__ts").isNotNull()
    for c in _key_cols(n_keys):
        cond = cond & F.col(c).isNotNull()
    return obs.where(cond), obs.where(~cond)


def _null_features(df: DataFrame, fields: list[T.StructField]) -> DataFrame:
    for fld in fields:
        df = df.withColumn(fld.name, F.lit(None).cast(fld.dataType))
    return df


def _apply_defaults(df: DataFrame, features: Sequence[SWAFeature]) -> DataFrame:
    for f in features:
        if f.default is not None:
            df = df.withColumn(f.name, F.coalesce(F.col(f.name), F.lit(f.default)))
    return df


def _time_prefilter(obs: DataFrame, fact: DataFrame, features: Sequence[SWAFeature]) -> DataFrame:
    """Load fact only for the reachable time range — at scale this is the
    partition-pruning predicate (reference: AnchorToDataSourceMapper.scala:115-128)."""
    rng = obs.agg(F.min("__ts").alias("lo"), F.max("__ts").alias("hi")).first()
    if rng is None or rng["lo"] is None:
        return fact
    reach_back = max(f.window.width_us + f.window.delay_us for f in features)
    min_delay = min(f.window.delay_us for f in features)
    return fact.where(
        (F.col("__ts") > F.lit(int(rng["lo"]) - reach_back))
        & (F.col("__ts") <= F.lit(int(rng["hi"]) - min_delay))
    )


# ---------------------------------------------------------------------------
# strategy 1: union + window frames (pure JVM)
# ---------------------------------------------------------------------------


def _swa_union(obs: DataFrame, fact_proj: DataFrame, features, metric_col, n_keys) -> DataFrame:
    kcols = _key_cols(n_keys)
    obs_u = obs.withColumn("__is_obs", F.lit(1))
    fact_u = fact_proj.withColumn("__is_obs", F.lit(0)).withColumn("__fact_ts", F.col("__ts"))
    unioned = obs_u.unionByName(fact_u, allowMissingColumns=True)

    out = unioned
    for f in features:
        w = (
            Window.partitionBy(*kcols)
            .orderBy("__ts")
            .rangeBetween(-(f.window.width_us + f.window.delay_us) + 1, -f.window.delay_us)
        )
        m = F.col(metric_col[f.name])
        if f.agg in ("SUM", "COUNT"):
            col = F.sum(m).over(w)
            if f.agg == "COUNT":
                col = col.cast("long")
        elif f.agg == "AVG":
            col = F.avg(m).over(w)
        elif f.agg == "MIN":
            col = F.min(m).over(w)
        elif f.agg == "MAX":
            col = F.max(m).over(w)
        elif f.agg == "LATEST":
            col = F.last(m, ignorenulls=True).over(w)
        elif f.agg == "TIMESINCE":
            col = (F.col("__ts") - F.max("__fact_ts").over(w)) / F.lit(1e6)
        elif f.agg in ("COUNT_DISTINCT", "APPROX_COUNT_DISTINCT"):
            nonnull = F.count(m).over(w)
            col = F.when(nonnull > 0, F.size(F.collect_set(m).over(w)).cast("long"))
        else:  # pragma: no cover - routed to cogroup by the picker
            raise ValueError(f"union strategy cannot evaluate {f.agg}")
        out = out.withColumn(f.name, col)

    return out.where(F.col("__is_obs") == 1)


# ---------------------------------------------------------------------------
# strategy 2: cogrouped Arrow merge kernel
# ---------------------------------------------------------------------------


def _make_kernel(obs_schema: T.StructType, out_schema: T.StructType, specs: list[dict]):
    obs_out_cols = [f.name for f in obs_schema.fields]
    feat_names = [s["name"] for s in specs]
    int_feats = {
        fld.name for fld in out_schema.fields
        if fld.name in set(feat_names) and isinstance(fld.dataType, T.LongType)
    }

    def kernel(obs_pdf: pd.DataFrame, fact_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(obs_pdf) == 0:
            return pd.DataFrame({c.name: pd.Series(dtype="object") for c in out_schema.fields})
        obs_ts = obs_pdf["__ts"].to_numpy(dtype=np.int64)
        order = np.argsort(fact_pdf["__ts"].to_numpy(dtype=np.int64), kind="stable") \
            if len(fact_pdf) else np.array([], dtype=np.int64)
        fact_ts = fact_pdf["__ts"].to_numpy(dtype=np.int64)[order] if len(fact_pdf) else np.array([], dtype=np.int64)

        result = obs_pdf[[c for c in obs_out_cols]].copy()
        for s in specs:
            name, agg = s["name"], s["agg"]
            lo, hi = kernels.window_bounds(fact_ts, obs_ts, s["width_us"], s["delay_us"])
            if len(fact_ts) == 0:
                result[name] = pd.array([None] * len(obs_pdf), dtype="object") \
                    if agg == "LATEST" or s["group_col"] or agg.endswith("_POOLING") \
                    else np.full(len(obs_pdf), np.nan)
                continue
            if s["group_col"] is not None:
                graw = fact_pdf[s["group_col"]].to_numpy(dtype=object)[order]
                gser = pd.Series(graw)
                codes, groups = pd.factorize(gser)
                v = fact_pdf[s["metric"]].to_numpy(dtype=np.float64)[order]
                result[name] = kernels.agg_grouped(codes, list(groups), v, lo, hi, agg, s["limit"])
            elif agg.endswith("_POOLING"):
                arrs = fact_pdf[s["metric"]].to_numpy(dtype=object)[order]
                result[name] = kernels.agg_pooling(arrs, lo, hi, agg)
            elif agg == "LATEST":
                vals = fact_pdf[s["metric"]].to_numpy(dtype=object)[order]
                valid = np.array([x is not None and x == x for x in vals], dtype=bool)
                idx, ok = kernels.agg_latest(vals, valid, lo, hi)
                picked = vals[idx]
                picked[~ok] = None
                result[name] = picked
            elif agg == "TIMESINCE":
                result[name] = kernels.agg_timesince(fact_ts, obs_ts, lo, hi)
            elif agg in ("COUNT_DISTINCT", "APPROX_COUNT_DISTINCT"):
                vser = pd.Series(fact_pdf[s["metric"]].to_numpy(dtype=object)[order])
                codes, _ = pd.factorize(vser, use_na_sentinel=True)
                result[name] = kernels.agg_count_distinct(codes, lo, hi)
            else:
                v = fact_pdf[s["metric"]].to_numpy(dtype=np.float64)[order]
                fn = {"SUM": kernels.agg_sum, "COUNT": kernels.agg_count,
                      "AVG": kernels.agg_avg, "MIN": kernels.agg_min,
                      "MAX": kernels.agg_max}[agg]
                result[name] = fn(v, lo, hi)

        for name in feat_names:
            if name in int_feats:
                vals = pd.to_numeric(result[name], errors="coerce")
                result[name] = pd.array(
                    [None if pd.isna(x) else int(round(x)) for x in vals], dtype="Int64"
                )
        return result

    return kernel


def _hot_keys(fact: DataFrame, n_keys: int, threshold: int) -> DataFrame:
    """Keys whose fact row count exceeds the threshold (the reference's
    GroupAndCountFrequentItemEstimator.scala:21 strategy — exact and
    cheap as a map-side-combined count)."""
    kcols = _key_cols(n_keys)
    return fact.groupBy(*kcols).count().where(F.col("count") > threshold).select(*kcols)


def _salt(obs: DataFrame, fact: DataFrame, n_keys: int, threshold: int, buckets: int):
    """Replicate hot-key fact rows into every salt bucket; hash hot-key
    observations into one bucket (SaltedSparkJoin.scala:88-130 scheme:
    the window per observation stays complete, parallelism fans out)."""
    kcols = _key_cols(n_keys)
    hot = _hot_keys(fact, n_keys, threshold).withColumn("__hot", F.lit(True))
    fact_h = fact.join(F.broadcast(hot), on=kcols, how="left")
    # explode can't sit inside when(); build hot/cold branches and union
    hot_fact = fact_h.where(F.col("__hot").isNotNull()).drop("__hot") \
        .withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    cold_fact = fact_h.where(F.col("__hot").isNull()).drop("__hot") \
        .withColumn("__salt", F.lit(0))
    fact_salted = hot_fact.unionByName(cold_fact)

    obs_h = obs.join(F.broadcast(hot), on=kcols, how="left")
    obs_salted = obs_h.withColumn(
        "__salt",
        F.when(F.col("__hot").isNotNull(),
               F.pmod(F.xxhash64(*obs.columns), F.lit(buckets)).cast("int"))
        .otherwise(F.lit(0)),
    ).drop("__hot")
    return obs_salted, fact_salted


def _swa_cogroup(obs: DataFrame, fact_proj: DataFrame, features, metric_col, n_keys,
                 obs_schema, out_fields, hot_key_threshold, salt_buckets) -> DataFrame:
    kcols = _key_cols(n_keys)
    group_cols = list(kcols)
    if hot_key_threshold:
        obs, fact_proj = _salt(obs, fact_proj, n_keys, hot_key_threshold, salt_buckets)
        group_cols = kcols + ["__salt"]

    specs = [
        {
            "name": f.name,
            "agg": f.agg,
            "metric": metric_col[f.name],
            "group_col": f"__g_{f.name}" if f.group_by is not None else None,
            "width_us": f.window.width_us,
            "delay_us": f.window.delay_us,
            "limit": f.limit,
        }
        for f in features
    ]
    out_schema = T.StructType(list(obs_schema.fields) + out_fields)
    kernel = _make_kernel(obs_schema, out_schema, specs)
    return (
        obs.groupBy(*group_cols)
        .cogroup(fact_proj.groupBy(*group_cols))
        .applyInPandas(kernel, out_schema)
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def join_window_agg_features(
    obs: DataFrame,
    fact: DataFrame,
    obs_keys: Sequence[str],
    fact_keys: Sequence[str],
    obs_ts: str,
    fact_ts: str,
    features: Sequence[SWAFeature],
    obs_ts_format: str = "epoch",
    fact_ts_format: str = "epoch",
    strategy: str = "auto",
    prefilter_time_range: bool = True,
    semi_join_fact: bool = False,
    hot_key_threshold: Optional[int] = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Point-in-time sliding-window aggregation join.

    Returns ``obs`` with one new column per feature; observation rows
    with null keys / null timestamps or no in-window fact rows get null
    (or the feature's declared default).
    """
    if len(obs_keys) != len(fact_keys):
        raise ValueError("obs_keys and fact_keys must have the same arity")
    clash = {f.name for f in features} & set(obs.columns)
    if clash:
        raise ValueError(f"feature names collide with observation columns: {sorted(clash)}")
    n_keys = len(obs_keys)

    obs2 = _with_keys_ts(obs, obs_keys, obs_ts, obs_ts_format)
    fact2 = _with_keys_ts(fact, fact_keys, fact_ts, fact_ts_format)
    fact_null_cond = F.col("__ts").isNotNull()
    for c in _key_cols(n_keys):
        fact_null_cond = fact_null_cond & F.col(c).isNotNull()
    fact2 = fact2.where(fact_null_cond)

    obs_main, obs_nulls = _split_null_keys(obs2, n_keys)

    # fact projection: keys + ts + deduped metric columns (+ group cols)
    metric_col: dict[str, str] = {}
    proj_exprs: dict[str, object] = {}
    for i, f in enumerate(features):
        sig = (f.metric, f.filter, f.agg == "COUNT")
        existing = next((n for n, s in proj_exprs.items() if s[0] == sig), None)
        if existing is not None and f.group_by is None:
            metric_col[f.name] = existing
        else:
            cname = f"__m{i}"
            expr = _metric_expr(f)
            if f.agg in _NUMERIC_AGGS or f.agg == "COUNT" or f.group_by is not None:
                expr = expr.cast("double")
            proj_exprs[cname] = (sig, expr)
            metric_col[f.name] = cname
    sel = _key_cols(n_keys) + [F.col("__ts")]
    sel += [expr.alias(name) for name, (_, expr) in proj_exprs.items()]
    for f in features:
        if f.group_by is not None:
            sel.append(F.expr(f.group_by).cast("string").alias(f"__g_{f.name}"))
    fact_proj = fact2.select(*sel)

    if prefilter_time_range:
        fact_proj = _time_prefilter(obs_main, fact_proj, features)
    if semi_join_fact:
        fact_proj = fact_proj.join(
            obs_main.select(*_key_cols(n_keys)).dropDuplicates(), on=_key_cols(n_keys),
            how="left_semi",
        )

    # figure output field types (LATEST passes the metric type through)
    proj_dtypes = {f.name: f.dataType for f in fact_proj.schema.fields}
    out_fields = [_out_field(f, proj_dtypes.get(metric_col[f.name], T.DoubleType()))
                  for f in features]

    if strategy == "auto":
        frame_ok = all(f.agg in FRAME_AGGS and f.group_by is None for f in features) \
            and not hot_key_threshold
        strategy = "union" if frame_ok else "cogroup"

    if strategy == "union":
        joined = _swa_union(obs_main, fact_proj, features, metric_col, n_keys)
        helper = [c for c in joined.columns if c.startswith("__")]
        joined = joined.drop(*helper)
    elif strategy == "cogroup":
        joined = _swa_cogroup(
            obs_main, fact_proj, features, metric_col, n_keys,
            obs.schema, out_fields, hot_key_threshold, salt_buckets,
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    obs_nulls_out = _null_features(obs_nulls.drop(*_key_cols(n_keys), "__ts"), out_fields)
    result = joined.unionByName(obs_nulls_out)
    return _apply_defaults(result, features)
