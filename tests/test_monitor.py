"""Unit tests for drift monitoring (operators/monitor.py) and
temperature-scaled mixtures (operators/corpus.py::temperature_mixture)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from feathr_spark.operators.corpus import temperature_mixture
from feathr_spark.operators.monitor import category_drift, feature_drift


@pytest.fixture(scope="module")
def two_windows(spark):
    # ref window: values uniform 0..99; cur window: same distribution
    # for 'stable', shifted +50 for 'shifted'; one null in each window
    rows = []
    for i in range(200):
        cur = i >= 100
        v = float(i % 100)
        rows.append((i, cur, v, v + (50.0 if cur else 0.0),
                     "a" if i % 2 else "b"))
    rows.append((998, False, None, None, None))
    rows.append((999, True, None, None, None))
    return spark.createDataFrame(
        rows, "id int, cur boolean, stable double, shifted double, cat string")


def test_identical_distributions_near_zero_psi(two_windows):
    out = {r["feature"]: r for r in
           feature_drift(two_windows, ["stable", "shifted"],
                         current=F.col("cur"), bins=10).collect()}
    assert out["stable"]["psi"] < 1e-6
    assert abs(out["stable"]["kl"]) < 1e-6
    assert out["shifted"]["psi"] > 0.5          # half the mass moved bins
    assert out["stable"]["n_ref"] == 100 and out["stable"]["n_cur"] == 100


def test_numeric_psi_known_value(spark):
    # 2 bins, ref = [0]*8+[1]*2, cur = [0]*5+[1]*5, smooth=0.5:
    # p_ref=(8.5/11, 2.5/11), p_cur=(5.5/11, 5.5/11) over global range 0..1
    rows = ([(False, 0.0)] * 8 + [(False, 1.0)] * 2
            + [(True, 0.0)] * 5 + [(True, 1.0)] * 5)
    df = spark.createDataFrame(rows, "cur boolean, x double")
    r = feature_drift(df, ["x"], current=F.col("cur"), bins=2).collect()[0]
    p_ref, p_cur = (8.5 / 11, 2.5 / 11), (5.5 / 11, 5.5 / 11)
    psi = sum((c - r_) * math.log(c / r_) for c, r_ in zip(p_cur, p_ref))
    kl = sum(c * math.log(c / r_) for c, r_ in zip(p_cur, p_ref))
    assert abs(r["psi"] - psi) < 1e-9
    assert abs(r["kl"] - kl) < 1e-9


def test_category_drift_union_support(spark):
    # category 'c' only in cur: union support keeps it, smoothing keeps
    # the ref side finite
    rows = ([(False, "a")] * 6 + [(False, "b")] * 4
            + [(True, "a")] * 5 + [(True, "c")] * 5)
    df = spark.createDataFrame(rows, "cur boolean, cat string")
    r = category_drift(df, ["cat"], current=F.col("cur")).collect()[0]
    assert r["psi"] > 0.5
    assert math.isfinite(r["psi"]) and math.isfinite(r["kl"])
    assert r["n_ref"] == 10 and r["n_cur"] == 10


def test_temperature_alpha_edges(spark):
    df = spark.createDataFrame(
        [("s0", "w w w w w w w w w"), ("s1", "w")],
        "source string, text string")
    # alpha=1: natural proportions -> weight 1 everywhere
    nat = temperature_mixture(df, alpha=1.0).collect()
    assert all(abs(r["weight"] - 1.0) < 1e-9 for r in nat)
    # alpha=0: uniform target -> p_target = 1/2 per domain
    uni = {r["source"]: r for r in temperature_mixture(df, alpha=0.0).collect()}
    assert abs(uni["s0"]["p_target"] - 0.5) < 1e-9
    assert abs(uni["s1"]["p_target"] - 0.5) < 1e-9
    # alpha=0.7 up-weights the small domain above natural share
    t = {r["source"]: r for r in temperature_mixture(df, alpha=0.7).collect()}
    assert t["s1"]["p_target"] > t["s1"]["share"]
    assert t["s1"]["weight"] > 1.0 > t["s0"]["weight"]


# ---------------------------------------------------------------------------
# corpus datacard
# ---------------------------------------------------------------------------


def test_corpus_datacard(spark):
    from feathr_spark.operators.monitor import corpus_datacard

    rows = [
        (0, "alpha beta gamma", "web"),
        (1, "Alpha, beta GAMMA!", "web"),      # exact dup of 0 post-norm
        (2, "one two three four five six", "web"),
        (3, "solo", "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    card = {r["metric"]: r["value"] for r in corpus_datacard(docs).collect()}
    assert card["n_docs"] == 4.0
    assert card["total_words"] == 3 + 3 + 6 + 1
    assert card["mean_words"] == pytest.approx(13 / 4)
    assert card["max_words"] == 6.0
    assert card["exact_dup_rate"] == pytest.approx(1 - 3 / 4)
    assert card["share:web"] == pytest.approx(3 / 4)
    assert card["share:books"] == pytest.approx(1 / 4)
    # exact interpolating percentile over [1, 3, 3, 6]
    assert card["p50_words"] == pytest.approx(3.0)
    assert card["p90_words"] == pytest.approx(3 + 0.7 * 3)


def test_corpus_datacard_empty(spark):
    from feathr_spark.operators.monitor import corpus_datacard

    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    card = {r["metric"]: r["value"] for r in corpus_datacard(docs).collect()}
    assert card["n_docs"] == 0.0 and card["exact_dup_rate"] == 0.0
    assert not any(m.startswith("share:") for m in card)
