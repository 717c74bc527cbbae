"""Quality-classifier (logistic regression over bag-of-token features)
unit tests: featurization kernel, gradient-round parity vs a numpy
reference, convergence on separable data, vocab vs hashed path."""

from __future__ import annotations

import numpy as np
import pytest

from feathr_spark.operators.classify import (
    featurize_tokens,
    hashed_text_features,
    score_logreg,
    train_logreg,
)


def _feat_rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, y double, tokens array<int>")


def test_featurize_counts_and_tf(spark):
    df = _feat_rows(spark, [
        (1, 1.0, [0, 2, 2, 5]),
        (2, 0.0, []),
        (3, 0.0, [5, 5, 5, 5]),
    ])
    out = {r["doc_id"]: r for r in
           featurize_tokens(df, 6, label_col="y").collect()}
    assert out[1]["idxs"] == [0, 2, 5]
    assert out[1]["vals"] == [0.25, 0.5, 0.25]
    assert out[2]["idxs"] == [] and out[2]["vals"] == []
    assert out[3]["idxs"] == [5] and out[3]["vals"] == [1.0]
    raw = {r["doc_id"]: r for r in
           featurize_tokens(df, 6, label_col="y", normalize=False).collect()}
    assert raw[3]["vals"] == [4.0]


def test_featurize_fold_and_range_check(spark):
    df = _feat_rows(spark, [(1, 1.0, [7, 13])])
    folded = featurize_tokens(df, 5, fold=True, normalize=False).collect()[0]
    assert folded["idxs"] == [2, 3]  # 7 % 5, 13 % 5
    with pytest.raises(Exception, match="out of range"):
        featurize_tokens(df, 5).collect()


def test_one_round_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    n, d = 64, 5
    toks = [rng.randint(0, d, size=rng.randint(1, 9)).tolist()
            for _ in range(n)]
    y = rng.randint(0, 2, size=n).astype(float)
    df = _feat_rows(spark, [(i, float(y[i]), toks[i]) for i in range(n)])
    feat = featurize_tokens(df, d, label_col="y")
    w = train_logreg(feat, d, rounds=1, lr=0.7)

    # numpy reference: full-batch GD from w=0 (p=0.5 everywhere)
    X = np.zeros((n, d))
    for i, t in enumerate(toks):
        for tok in t:
            X[i, tok] += 1.0 / len(t)
    grad = X.T @ (y - 0.5) / n
    np.testing.assert_allclose(w[:d], 0.7 * grad, rtol=0, atol=1e-12)
    np.testing.assert_allclose(w[d], 0.7 * (y - 0.5).sum() / n, atol=1e-12)


def test_converges_on_separable_tokens(spark):
    # token 0 => positive, token 1 => negative, tokens 2.. noise
    rng = np.random.RandomState(3)
    rows = []
    for i in range(200):
        y = i % 2
        toks = [0 if y else 1] * 3 + rng.randint(2, 8, size=4).tolist()
        rows.append((i, float(y), toks))
    df = _feat_rows(spark, rows)
    feat = featurize_tokens(df, 8, label_col="y").persist()
    w = train_logreg(feat, 8, rounds=30, lr=4.0)
    scored = score_logreg(feat, w, prob_col="p").collect()
    acc = np.mean([(r["p"] > 0.5) == (r["y"] > 0.5) for r in scored])
    assert acc == 1.0
    assert w[0] > 0 > w[1]
    feat.unpersist()


def test_quantized_training_is_grid_stable(spark):
    df = _feat_rows(spark, [
        (i, float(i % 2), [i % 2, 2 + (i % 3)]) for i in range(30)])
    feat = featurize_tokens(df, 5, label_col="y").persist()
    w1 = train_logreg(feat, 5, rounds=3, lr=1.0, quantize_decimals=6)
    w2 = train_logreg(feat, 5, rounds=3, lr=1.0, quantize_decimals=6)
    assert np.array_equal(w1, w2)
    # every weight sits exactly on the 1e-6 grid
    assert np.array_equal(w1, np.round(w1, 6))
    feat.unpersist()


def test_hashed_text_path_learns_content_label(spark, sf_dir):
    # testdata langs share one vocabulary, so use a content-derived
    # label: does the doc mention 'table' more often than 'query'?
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    def _n(word):
        return F.size(F.filter(
            F.split(F.lower("text"), r"\s+"), lambda w: w == F.lit(word)))

    labeled = docs.withColumn(
        "y", (_n("table") > _n("query")).cast("double"))
    feat = hashed_text_features(
        labeled, buckets=512, label_col="y", normalize=False).persist()
    w = train_logreg(feat, 512, rounds=40, lr=2.0)
    scored = score_logreg(feat, w, prob_col="p").collect()
    acc = np.mean([(r["p"] > 0.5) == (r["y"] > 0.5) for r in scored])
    assert acc > 0.9  # two hashed buckets carry the signal
    feat.unpersist()


def test_l2_shrinks_weights(spark):
    df = _feat_rows(spark, [
        (i, float(i % 2), [i % 2] * 4) for i in range(40)])
    feat = featurize_tokens(df, 3, label_col="y").persist()
    w_free = train_logreg(feat, 3, rounds=15, lr=2.0)
    w_reg = train_logreg(feat, 3, rounds=15, lr=2.0, l2=0.5)
    assert np.abs(w_reg).sum() < np.abs(w_free).sum()
    feat.unpersist()
