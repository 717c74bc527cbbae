"""Feature-distribution drift monitoring: PSI / KL divergence between a
reference and a current window of the same feature table.

Reference analogue: the monitoring sink's per-feature stats
(feathr-impl ``offline/generation/FeatureMonitoringProcessor.scala``
computes per-feature summaries pushed to a monitoring store); this
module adds the two-window comparison a production feature pipeline
alarms on.

Scale shape: numeric drift is two aggregate-only passes — one global
min/max per feature (a handful of scalar rows to the driver, like the
CMS hot-key estimate), then ONE explode+groupBy over
``(feature, side, bin)`` whose exchange is bounded by
``features × 2 × bins`` rows per task regardless of input size.
Categorical drift is one groupBy bounded by the category vocabulary.
All divergence arithmetic happens on the bounded bin table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feathr_spark.session import track_cache


def _psi_kl(binned: DataFrame, smooth: float, n_cells_expr) -> DataFrame:
    """(feature, bin, n_ref, n_cur) -> one row per feature with
    Laplace-smoothed PSI and KL(cur || ref). The bin table is persisted
    (bounded: features x cells rows) so the totals pass and the join do
    NOT re-scan the input twice — one corpus scan total."""
    binned = track_cache(binned.persist())
    tot = binned.groupBy("feature").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"),
        n_cells_expr.alias("cells"))
    j = binned.join(F.broadcast(tot), "feature")
    p_ref = ((F.col("n_ref") + F.lit(smooth))
             / (F.col("t_ref") + F.lit(smooth) * F.col("cells")))
    p_cur = ((F.col("n_cur") + F.lit(smooth))
             / (F.col("t_cur") + F.lit(smooth) * F.col("cells")))
    term_psi = (p_cur - p_ref) * F.log(p_cur / p_ref)
    term_kl = p_cur * F.log(p_cur / p_ref)
    return (j.groupBy("feature").agg(
        F.sum(term_psi).alias("psi"),
        F.sum(term_kl).alias("kl"),
        F.max("t_ref").alias("n_ref"),
        F.max("t_cur").alias("n_cur")))


def feature_drift(
    df: DataFrame,
    feature_cols: Sequence[str],
    current: Column,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Population-stability index + KL divergence per numeric feature
    between the reference rows (``current`` false) and current rows
    (``current`` true), over ``bins`` equal-width bins spanning the
    GLOBAL min/max of each feature (deterministic — no sampled
    quantiles). Returns ``(feature, psi, kl, n_ref, n_cur)``.

    Null feature values are excluded; bin counts are Laplace-smoothed
    by ``smooth`` so empty bins stay finite. Common alarm thresholds:
    PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action.
    """
    ranges = df.agg(*[f(c).alias(f"__{tag}_{c}")
                      for c in feature_cols
                      for tag, f in (("mn", F.min), ("mx", F.max))]
                    ).collect()[0]
    structs = []
    for c in feature_cols:
        if ranges[f"__mn_{c}"] is None:
            continue  # all-null feature: no distribution to compare
        mn, mx = float(ranges[f"__mn_{c}"]), float(ranges[f"__mx_{c}"])
        width = (mx - mn) / bins if mx > mn else 1.0
        b = F.least(F.lit(bins - 1),
                    F.floor((F.col(c).cast("double") - F.lit(mn))
                            / F.lit(width)).cast("int"))
        structs.append(F.when(F.col(c).isNotNull(),
                              F.struct(F.lit(c).alias("feature"),
                                       b.alias("bin"))))
    binned = (df.select(F.explode(F.array(*structs)).alias("s"),
                        current.alias("__cur"))
                .where(F.col("s").isNotNull())
                .groupBy(F.col("s.feature").alias("feature"),
                         F.col("s.bin").alias("bin"))
                .agg(F.sum(F.when(~F.col("__cur"), 1).otherwise(0))
                       .alias("n_ref"),
                     F.sum(F.when(F.col("__cur"), 1).otherwise(0))
                       .alias("n_cur")))
    return _psi_kl(binned, smooth, F.lit(bins).cast("long"))


def category_drift(
    df: DataFrame,
    category_cols: Sequence[str],
    current: Column,
    smooth: float = 0.5,
) -> DataFrame:
    """PSI + KL per categorical feature between reference and current
    windows, one cell per category observed in EITHER window (the union
    support — smoothing keeps one-sided categories finite). Returns
    ``(feature, psi, kl, n_ref, n_cur)``; the groupBy exchange is
    bounded by the category vocabulary."""
    structs = [F.when(F.col(c).isNotNull(),
                      F.struct(F.lit(c).alias("feature"),
                               F.col(c).cast("string").alias("bin")))
               for c in category_cols]
    binned = (df.select(F.explode(F.array(*structs)).alias("s"),
                        current.alias("__cur"))
                .where(F.col("s").isNotNull())
                .groupBy(F.col("s.feature").alias("feature"),
                         F.col("s.bin").alias("bin"))
                .agg(F.sum(F.when(~F.col("__cur"), 1).otherwise(0))
                       .alias("n_ref"),
                     F.sum(F.when(F.col("__cur"), 1).otherwise(0))
                       .alias("n_cur")))
    return _psi_kl(binned, smooth, F.count(F.lit(1)).cast("long"))


# ---------------------------------------------------------------------------
# corpus datacard (dataset-release summary report)
# ---------------------------------------------------------------------------


def corpus_datacard(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """One-call dataset-release summary ("datacard"): corpus size, word
    volume, length distribution, per-source composition, and the exact
    duplicate rate, as a tidy ``(metric string, value double)`` frame —
    the numbers a dataset card or ingest dashboard reports.

    Metrics: ``n_docs``, ``total_words``, ``mean_words``,
    ``p50_words`` / ``p90_words`` / ``max_words`` (exact percentiles),
    ``exact_dup_rate`` (1 − distinct normalized texts / docs — the
    normalization shared with the dedup operators), and one
    ``share:<source>`` row per source (fraction of docs).

    Scale shape: ONE scan building a skinny per-doc projection (word
    count, normalization hash, source — the text itself is dropped
    before any exchange), then three bounded aggregations over it:
    a global aggregate (scalars + exact percentiles over the word-count
    column), a distinct count of 8-byte normalization hashes (map-side
    partial combine), and a source-vocabulary-bounded groupBy. Output
    is O(#sources) rows.
    """
    from feathr_spark.operators.text import (fingerprint, normalize_text,
                                             token_count)

    slim = track_cache(docs.select(
        token_count(normalize_text(F.col(text_col))).alias("__wc"),
        fingerprint(F.col(text_col)).alias("__norm"),
        F.col(source_col).alias("__src"),
    ).persist())
    spark = docs.sparkSession

    g = slim.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__wc").alias("total_words"),
        F.avg("__wc").alias("mean_words"),
        F.expr("percentile(__wc, 0.5)").alias("p50_words"),
        F.expr("percentile(__wc, 0.9)").alias("p90_words"),
        F.max("__wc").alias("max_words"),
        F.countDistinct("__norm").alias("n_distinct"),
    ).first()
    n = g["n_docs"] or 0
    rows = [
        ("n_docs", float(n)),
        ("total_words", float(g["total_words"] or 0)),
        ("mean_words", float(g["mean_words"] or 0.0)),
        ("p50_words", float(g["p50_words"] or 0.0)),
        ("p90_words", float(g["p90_words"] or 0.0)),
        ("max_words", float(g["max_words"] or 0)),
        ("exact_dup_rate",
         float(1.0 - g["n_distinct"] / n) if n else 0.0),
    ]
    if n:
        for r in slim.groupBy("__src").count().collect():
            rows.append((f"share:{r['__src']}", r["count"] / n))
    slim.unpersist()
    rows.sort()
    return spark.createDataFrame(rows, "metric string, value double")
