"""Unit tests for DSIR-style importance scoring
(operators/selection.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from feathr_spark.operators.selection import (importance_scores,
                                              importance_threshold)


@pytest.fixture(scope="module")
def corpus(spark):
    # target-looking docs are full of 'spark'; raw background is 'cat'
    rows = ([(i, "spark spark join", "tgt") for i in range(10)]
            + [(100 + i, "cat cat sat", "bg") for i in range(30)]
            + [(999, "", "bg")])
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_vocab_scores_separate_domains(corpus):
    target = corpus.where(F.col("source") == "tgt")
    out = importance_scores(corpus, target, vocab_size=10, min_count=1)
    rows = {r["doc_id"]: r["importance"] for r in out.collect()}
    assert rows[999] == 0.0                      # empty doc
    assert rows[0] > 0 > rows[100]               # tgt-like up, bg down
    assert all(abs(rows[i] - rows[0]) < 1e-12 for i in range(10))


def test_vocab_known_value(spark):
    # raw: 'a' x3 + 'b' x1;  target: 'a' x2. vocab={a,b}, cells=3.
    raw = spark.createDataFrame(
        [(0, "a a a b"), (1, "a")], "doc_id int, text string")
    target = spark.createDataFrame([(1, "a a")], "doc_id int, text string")
    out = {r["doc_id"]: r["importance"]
           for r in importance_scores(
               raw, target, vocab_size=10, min_count=1).collect()}
    tot_raw, tot_tgt, cells = 5, 2, 3
    ra = math.log(((2 + .5) / (tot_tgt + .5 * cells))
                  / ((4 + .5) / (tot_raw + .5 * cells)))
    rb = math.log(((0 + .5) / (tot_tgt + .5 * cells))
                  / ((1 + .5) / (tot_raw + .5 * cells)))
    assert abs(out[0] - (3 * ra + rb)) < 1e-9
    assert abs(out[1] - ra) < 1e-9


def test_hashed_path_separates_domains(corpus):
    target = corpus.where(F.col("source") == "tgt")
    out = importance_scores(corpus, target, method="hashed", buckets=1024)
    rows = {r["doc_id"]: r["importance"] for r in out.collect()}
    assert rows[0] > rows[100]
    assert rows[999] == 0.0


def test_threshold_keeps_fraction(corpus):
    target = corpus.where(F.col("source") == "tgt")
    scored = importance_scores(corpus, target, vocab_size=10, min_count=1)
    thr = importance_threshold(scored, keep_fraction=0.25)
    kept = scored.where(F.col("importance") >= thr).count()
    # 10 of 41 docs are target-like; the 0.75 percentile interpolates
    # to exactly the empty doc's 0.0, so >= keeps it too (10 tgt + 1)
    assert kept == 11
    assert thr == 0.0


def test_select_by_budget_boundary_semantics(spark):
    from feathr_spark.operators.selection import select_by_budget

    # scores force order d3 > d2 > d1; tokens 10 each; budget 15 keeps
    # d3 (cum_before 0) and d2 (cum_before 10 < 15) but not d1 (20)
    df = spark.createDataFrame(
        [(1, 1.0, 10), (2, 2.0, 10), (3, 3.0, 10)],
        "doc_id long, score double, n_tokens long")
    kept = sorted(r["doc_id"] for r in
                  select_by_budget(df, 15, "n_tokens", "score",
                                   key_col="doc_id").collect())
    assert kept == [2, 3]
    # exact-budget edge: cum_before == budget is NOT kept
    kept = sorted(r["doc_id"] for r in
                  select_by_budget(df, 10, "n_tokens", "score",
                                   key_col="doc_id").collect())
    assert kept == [3]


def test_select_by_budget_bucket_matches_window(spark, corpus):
    from feathr_spark.operators.selection import select_by_budget

    scored = corpus.withColumn(
        "n_tokens", F.size(F.filter(F.split("text", r"\s+"),
                                    lambda w: w != ""))) \
        .withColumn("score", F.length("text").cast("double"))
    for budget in (5.0, 40.0, 10_000.0):
        a = select_by_budget(scored, budget, "n_tokens", "score",
                             ["source"], method="window")
        b = select_by_budget(scored, budget, "n_tokens", "score",
                             ["source"], method="bucket", score_buckets=16)
        ka = sorted(r["doc_id"] for r in a.collect())
        kb = sorted(r["doc_id"] for r in b.collect())
        assert ka == kb, f"budget={budget}"
    # degenerate constant score falls back to the window path
    const = scored.withColumn("score", F.lit(1.0))
    c = select_by_budget(const, 40.0, "n_tokens", "score",
                         ["source"], method="bucket")
    d = select_by_budget(const, 40.0, "n_tokens", "score",
                         ["source"], method="window")
    assert sorted(r["doc_id"] for r in c.collect()) == \
        sorted(r["doc_id"] for r in d.collect())


def test_select_by_budget_zero_budget_keeps_nothing(spark):
    from feathr_spark.operators.selection import select_by_budget

    df = spark.createDataFrame(
        [(1, 1.0, 10), (2, 2.0, 0)],
        "doc_id long, score double, n_tokens long")
    for m in ("window", "bucket"):
        assert select_by_budget(df, 0.0, "n_tokens", "score",
                                method=m).count() == 0
        assert select_by_budget(df, -5.0, "n_tokens", "score",
                                method=m).count() == 0


# ---------------------------------------------------------------------------
# GPT-3 Pareto quality lottery
# ---------------------------------------------------------------------------


def test_quality_lottery_deterministic_and_monotone(spark):
    from feathr_spark.operators.selection import (apply_quality_lottery,
                                                  quality_lottery)

    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100 / 99.0).alias("score"))
    out = quality_lottery(df, "score", alpha=9.0, seed=4)
    a = {r["doc_id"]: (r["pareto_draw"], r["lottery_keep"])
         for r in out.collect()}
    # deterministic across re-execution and repartitioning
    b = {r["doc_id"]: (r["pareto_draw"], r["lottery_keep"])
         for r in quality_lottery(df.repartition(7), "score",
                                  alpha=9.0, seed=4).collect()}
    assert a == b
    # draws are valid Pareto samples (positive) and the keep rule holds
    rows = out.collect()
    assert all(r["pareto_draw"] > 0 for r in rows)
    for r in rows:
        assert r["lottery_keep"] == (r["pareto_draw"] > 1.0 - r["score"])
    # keep RATE rises with score (soft filter), but low scores still
    # get in with tail probability and high scores aren't guaranteed-1.0
    kept = out.where("lottery_keep")
    lo = kept.where("score < 0.2").count() / out.where("score < 0.2").count()
    hi = kept.where("score > 0.8").count() / out.where("score > 0.8").count()
    assert 0 < lo < hi <= 1.0
    # score=1.0 always survives (draw > 0 == 1 - score)
    top = quality_lottery(
        spark.range(50).select(F.col("id").alias("doc_id"),
                               F.lit(1.0).alias("score")), "score")
    assert top.where("NOT lottery_keep").count() == 0

    filt = apply_quality_lottery(df, "score", alpha=9.0, seed=4)
    assert filt.count() == kept.count()
    assert set(filt.columns) == {"doc_id", "score"}


def test_quality_lottery_alpha_guard(spark):
    from feathr_spark.operators.selection import quality_lottery

    df = spark.range(1).select(F.col("id").alias("doc_id"),
                               F.lit(0.5).alias("score"))
    with pytest.raises(ValueError):
        quality_lottery(df, "score", alpha=0.0)
