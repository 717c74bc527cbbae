"""Importance-based data selection for pretraining corpora (the DSIR
family, Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): score every raw document by the unigram
log-likelihood ratio between a small target-domain sample and the raw
corpus, then keep the top fraction.

Two scoring paths, both shuffle-light at 10^12-document scale:

- ``method="vocab"`` (default, oracle-checkable): distributions over a
  bounded word vocabulary (count DESC / word ASC, like
  :func:`feathr_spark.operators.text.build_vocabulary`) + one OOV
  bucket. Distribution building is two vocabulary-bounded
  explode+groupBy shuffles; scoring broadcasts the word->log-ratio dict
  and runs ONE vectorized Arrow pass per row — zero shuffle.
- ``method="hashed"`` (DSIR's hashed n-gram form): words hash into
  ``buckets`` cells JVM-side (xxhash64 — no Python in the count path),
  the bucket->ratio table broadcast-joins the exploded words, and a
  per-doc partial-agg sum re-assembles scores (one doc-bounded
  exchange). Use when the corpus vocabulary is unbounded (multilingual
  / code) and a word whitelist would bias selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feathr_spark.operators.text import _words, normalize_text
from feathr_spark.session import track_cache


def _unigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (df.select(F.explode(_words(normalize_text(F.col(text_col))))
                      .alias("w"))
              .groupBy("w").agg(F.count("*").alias("n")))


def importance_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 10000,
    min_count: int = 2,
    smooth: float = 0.5,
    method: str = "vocab",
    buckets: int = 8192,
) -> DataFrame:
    """Per-document importance score
    ``sum_w log(p_target(w) / p_raw(w))`` (w over the document's words):
    positive means the document looks more like the target domain than
    the raw corpus. Returns ``raw`` with an added ``importance`` column.

    Distributions are Laplace-smoothed with ``smooth`` over the vocab
    cells + one OOV cell (``method="vocab"``) or the ``buckets`` hash
    cells (``method="hashed"``), so one-sided words stay finite.
    """
    if method == "vocab":
        # the count tables feed two driver actions each (cells collect +
        # totals); persist so the corpus explode+groupBy runs ONCE per
        # side, not once per action (registered with track_cache —
        # released by feathr_spark.release_caches())
        raw_counts = track_cache(_unigram_counts(raw, text_col).persist())
        vocab = (raw_counts.where(F.col("n") >= min_count)
                 .orderBy(F.desc("n"), F.asc("w")).limit(vocab_size)
                 .select("w"))
        tgt_counts = track_cache(_unigram_counts(target, text_col).persist())
        cells = (vocab.join(raw_counts, "w", "left")
                      .withColumnRenamed("n", "n_raw")
                      .join(tgt_counts, "w", "left")
                      .withColumnRenamed("n", "n_tgt"))
        rows = cells.select(
            "w", F.coalesce("n_raw", F.lit(0)).alias("n_raw"),
            F.coalesce("n_tgt", F.lit(0)).alias("n_tgt")).collect()
        tot_raw = raw_counts.agg(F.sum("n")).collect()[0][0] or 0
        tot_tgt = tgt_counts.agg(F.sum("n")).collect()[0][0] or 0
        in_raw = sum(r["n_raw"] for r in rows)
        in_tgt = sum(r["n_tgt"] for r in rows)
        n_cells = len(rows) + 1  # + OOV
        import math

        def _ratio(nt, nr):
            pt = (nt + smooth) / (tot_tgt + smooth * n_cells)
            pr = (nr + smooth) / (tot_raw + smooth * n_cells)
            return math.log(pt / pr)

        ratios = {r["w"]: _ratio(r["n_tgt"], r["n_raw"]) for r in rows}
        oov_ratio = _ratio(tot_tgt - in_tgt, tot_raw - in_raw)
        bc = raw.sparkSession.sparkContext.broadcast((ratios, oov_ratio))
        base = raw.withColumn(
            "__words", _words(normalize_text(F.col(text_col))))
        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}"
             for f in base.schema.fields if f.name != "__words"]
            + ["`importance` double"])

        import numpy as np
        import pandas as pd

        def _score(batches):
            rmap, oov = bc.value
            for pdf in batches:
                words = pdf["__words"]
                lens = words.map(len).to_numpy(dtype="int64")
                if lens.sum():
                    flat = pd.Series(np.concatenate(words.to_numpy()))
                    vals = flat.map(rmap).fillna(oov).to_numpy(dtype="float64")
                    seg = np.repeat(np.arange(len(pdf)), lens)
                    scores = np.bincount(seg, weights=vals, minlength=len(pdf))
                else:
                    scores = np.zeros(len(pdf))
                res = pdf.drop(columns=["__words"])
                res["importance"] = scores
                yield res

        return base.mapInPandas(_score, schema=out_schema)

    if method == "hashed":
        h = lambda c: F.pmod(F.xxhash64(c), F.lit(buckets))  # noqa: E731
        # <= buckets rows each, but read by two actions (totals + the
        # ratio-table join): persist so each corpus is exploded once
        raw_cells = track_cache(
            (raw.select(F.explode(
                _words(normalize_text(F.col(text_col)))).alias("w"))
             .groupBy(h(F.col("w")).alias("b"))
             .agg(F.count("*").alias("n_raw"))).persist())
        tgt_cells = track_cache(
            (target.select(F.explode(
                _words(normalize_text(F.col(text_col)))).alias("w"))
             .groupBy(h(F.col("w")).alias("b"))
             .agg(F.count("*").alias("n_tgt"))).persist())
        tots = (raw_cells.agg(F.sum("n_raw")).collect()[0][0] or 0,
                tgt_cells.agg(F.sum("n_tgt")).collect()[0][0] or 0)
        ratio = (F.log(((F.coalesce("n_tgt", F.lit(0)) + F.lit(smooth))
                        / F.lit(tots[1] + smooth * buckets))
                       / ((F.coalesce("n_raw", F.lit(0)) + F.lit(smooth))
                          / F.lit(tots[0] + smooth * buckets))))
        table = (raw_cells.join(tgt_cells, "b", "full")
                 .select("b", ratio.alias("r")))
        exploded = raw.select(
            F.col(id_col),
            F.explode_outer(_words(normalize_text(F.col(text_col))))
             .alias("w"))
        scored = (exploded.withColumn(
            "b", F.when(F.col("w").isNotNull(), h(F.col("w"))))
                  .join(F.broadcast(table), "b", "left")
                  .groupBy(id_col)
                  .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("importance")))
        return raw.join(scored, id_col, "left")

    raise ValueError(f"unknown method {method!r}")


def importance_threshold(
    scored: DataFrame,
    keep_fraction: float,
    score_col: str = "importance",
) -> float:
    """Exact score threshold keeping the top ``keep_fraction`` of rows
    (one percentile aggregate — a single-pass exact percentile; at
    extreme scale swap in ``percentile_approx`` and accept the
    documented error bound)."""
    q = 1.0 - keep_fraction
    return float(scored.agg(
        F.expr(f"percentile({score_col}, {q})")).collect()[0][0])


def select_by_budget(
    df: DataFrame,
    budget: float,
    token_col: str = "n_tokens",
    score_col: str = "importance",
    group_cols: list[str] | None = None,
    key_col: str = "doc_id",
    method: str = "window",
    score_buckets: int = 4096,
) -> DataFrame:
    """Token-budget corpus selection: walk documents in quality order
    (``score_col`` DESC, ``key_col`` ASC — deterministic) and keep each
    doc whose cumulative token count *before* it is under ``budget``
    (greedy fill: the doc that crosses the line is kept, so the budget
    is always met when enough data exists). With ``group_cols`` the
    budget applies per group — the "N tokens per source" mixture step
    after :func:`feathr_spark.operators.corpus.mixture_weights` decides
    the per-source shares.

    Two exact strategies:

    - ``method="window"``: one Exchange on the group key + per-group
      sort, running sum over the preceding frame. Exact and simple, but
      each group sorts in a single task — fine while a group's (score,
      token) pairs fit a task sort-spill budget.
    - ``method="bucket"`` (scale path): quantize score into
      ``score_buckets`` cells on [min, max] (two bounded aggregates),
      aggregate per-(group, cell) token totals (bounded shuffle:
      |groups| x score_buckets cells), broadcast back per-group
      boundary cells. Docs in cells above the boundary are kept by a
      pure FILTER (no shuffle of the corpus); only the boundary cell's
      docs — a ~1/score_buckets sliver — run the exact window with the
      higher-cell total as offset. Identical output to ``window``
      because cell id is monotone in score and within-cell ordering
      matches the global (score DESC, key ASC) order.

    Reference analogue: row-filter transforms + generation-time
    cutoffs (feathr-impl offline/config/FeatureGenConfig.scala window
    cutoff); the budget walk itself is LLM-corpus practice (DoReMi /
    DSIR-style token-share selection).
    """
    groups = list(group_cols or [])
    gexprs = [F.col(g) for g in groups]
    order = [F.col(score_col).desc_nulls_last(), F.col(key_col).asc()]

    if budget <= 0:
        # cum_before < budget can never hold; short-circuit BOTH
        # strategies (the bucket path's "no boundary row" state would
        # otherwise read an exhausted budget as "group fits entirely")
        return df.where(F.lit(False))

    if method == "window":
        w = (Window.partitionBy(*gexprs).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, -1))
        cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0.0))
        return (df.withColumn("__cb", cum_before)
                .where(F.col("__cb") < F.lit(budget)).drop("__cb"))

    if method == "bucket":
        bounds = df.agg(F.min(score_col).alias("lo"),
                        F.max(score_col).alias("hi")).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is None or hi is None or lo == hi:
            # degenerate score distribution: everything is one cell
            return select_by_budget(df, budget, token_col, score_col,
                                    groups, key_col, method="window")
        span = float(hi) - float(lo)
        # cell id monotone in score; hi maps to score_buckets - 1;
        # null scores coalesce to lo (they sort last in the window
        # order, matching desc_nulls_last in the exact method)
        cell = F.least(
            F.floor((F.coalesce(F.col(score_col), F.lit(float(lo)))
                     - F.lit(float(lo)))
                    / F.lit(span) * F.lit(score_buckets)).cast("int"),
            F.lit(score_buckets - 1))
        cells = (df.groupBy(*gexprs, cell.alias("__cell"))
                 .agg(F.sum(token_col).alias("__t")))
        wcum = (Window.partitionBy(*[F.col(g) for g in groups])
                .orderBy(F.col("__cell").desc())
                .rowsBetween(Window.unboundedPreceding, -1))
        marked = cells.withColumn(
            "__above", F.coalesce(F.sum("__t").over(wcum), F.lit(0.0)))
        # boundary = highest cell whose preceding total is < budget but
        # including total >= budget; cells above it are kept outright
        bd = (marked.where((F.col("__above") < F.lit(budget))
                           & (F.col("__above") + F.col("__t") >= F.lit(budget)))
              .select(*groups, F.col("__cell").alias("__bcell"),
                      F.col("__above").alias("__offset")))
        tagged = df.withColumn("__cell", cell)
        if groups:
            j = tagged.join(F.broadcast(bd), groups, "left")
        else:
            # left join on a constant key: an EMPTY boundary table
            # (whole corpus fits the budget) must keep every row
            j = (tagged.withColumn("__one", F.lit(1))
                 .join(F.broadcast(bd.withColumn("__one", F.lit(1))),
                       "__one", "left").drop("__one"))
        # no boundary row => the whole group fits the budget: keep all
        keep_hi = j.where(F.col("__bcell").isNull()
                          | (F.col("__cell") > F.col("__bcell")))
        at_bd = j.where(F.col("__cell") == F.col("__bcell"))
        wb = (Window.partitionBy(*gexprs).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, -1))
        keep_bd = (at_bd.withColumn(
            "__cb", F.col("__offset")
            + F.coalesce(F.sum(token_col).over(wb), F.lit(0.0)))
            .where(F.col("__cb") < F.lit(budget)).drop("__cb"))
        drop_cols = ["__cell", "__bcell", "__offset"]
        return keep_hi.drop(*drop_cols).unionByName(keep_bd.drop(*drop_cols))

    raise ValueError(f"unknown method {method!r}")


# ---------------------------------------------------------------------------
# GPT-3 quality lottery (Pareto-sampled soft quality filtering)
# ---------------------------------------------------------------------------


def quality_lottery(
    df: DataFrame,
    score_col: str,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_col=None,
    keep_col: str = "lottery_keep",
) -> DataFrame:
    """GPT-3's soft quality filter (Brown et al. 2020, appendix A): keep
    a document iff ``Pareto(alpha) > 1 - score`` — high-scoring docs
    almost always survive, low-scoring docs still enter the corpus with
    tail probability, which preserves distributional diversity that a
    hard threshold destroys (the published motivation).

    The lottery draw is DETERMINISTIC: ``u`` comes from a hash of the
    document id (``xxhash64(id, seed)`` by default; pass ``hash_col``
    for an engine-portable hash when replaying in SQL), mapped to (0,1),
    and the Pareto sample is the inverse-CDF transform
    ``u^(-1/alpha) - 1``. Re-running, repartitioning, or resuming a
    kill reproduces the identical keep set — ``rand()`` would not.

    Pure codegen expressions, zero shuffle, appends ``keep_col``
    (boolean) plus ``pareto_draw`` (the sample, for auditing).
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if hash_col is None:
        h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 31))
    else:
        h = F.pmod(hash_col, F.lit(1 << 31))
    # (h + 0.5) / 2^31 lands strictly inside (0, 1): u=0 would blow up
    # the inverse CDF and u=1 would make the draw exactly 0
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 31))
    draw = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return (df.withColumn("pareto_draw", draw)
              .withColumn(keep_col,
                          F.col("pareto_draw") > (F.lit(1.0) - F.col(score_col))))


def apply_quality_lottery(
    df: DataFrame,
    score_col: str,
    alpha: float = 9.0,
    **kwargs,
) -> DataFrame:
    """Filter twin of :func:`quality_lottery` — surviving rows only,
    audit columns dropped."""
    keep_col = kwargs.pop("keep_col", "lottery_keep")
    out = quality_lottery(df, score_col, alpha, keep_col=keep_col, **kwargs)
    return out.where(F.col(keep_col)).drop(keep_col, "pareto_draw")
