"""TF-IDF top-terms: hand-computed golden values, idf reuse, top-k cut."""

from __future__ import annotations

import math

from feathr_spark.operators.text import doc_frequency, tfidf_top_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_doc_frequency_counts_distinct_docs(spark):
    df = _docs(spark, ["a a b", "b c", "c c c"])
    got = {r["term"]: r["df"] for r in doc_frequency(df).collect()}
    assert got == {"a": 1, "b": 2, "c": 2}
    capped = doc_frequency(df, max_terms=2).collect()
    assert [(r["term"], r["df"]) for r in capped] == [("b", 2), ("c", 2)]


def test_tfidf_golden_values(spark):
    df = _docs(spark, ["apple apple banana", "banana cherry", "cherry"])
    out = tfidf_top_terms(df, k=2)
    rows = {(r["doc_id"], r["term"]): (r["score"], r["rank"])
            for r in out.collect()}
    n = 3
    idf = lambda d: math.log((n + 1) / (d + 1)) + 1  # noqa: E731
    # doc 0: apple c=2 df=1, banana c=1 df=2
    assert abs(rows[(0, "apple")][0] - 2 * idf(1)) < 1e-12
    assert rows[(0, "apple")][1] == 1
    assert abs(rows[(0, "banana")][0] - 1 * idf(2)) < 1e-12
    assert rows[(0, "banana")][1] == 2
    # doc 2 has one term only
    assert rows[(2, "cherry")][1] == 1
    assert len([k for k in rows if k[0] == 2]) == 1


def test_tfidf_topk_and_tie_break(spark):
    # equal scores tie-break on term ASC
    df = _docs(spark, ["x y z w", "x y", "z w", "x z", "y w"])
    out = tfidf_top_terms(df, k=3).collect()
    d0 = sorted([r for r in out if r["doc_id"] == 0], key=lambda r: r["rank"])
    assert len(d0) == 3
    assert [r["term"] for r in d0] == ["w", "x", "y"]  # all df=3, ties by term


def test_tfidf_reuses_external_idf(spark):
    train = _docs(spark, ["a b", "a c", "a d"])
    idf = doc_frequency(train)
    score_set = _docs(spark, ["a b e"])  # 'e' not in idf -> dropped
    out = tfidf_top_terms(score_set, k=5, idf_df=idf, idf_n_docs=3).collect()
    terms = {r["term"] for r in out}
    assert terms == {"a", "b"}
    b = [r for r in out if r["term"] == "b"][0]
    assert b["rank"] == 1  # rarer in the TRAIN corpus than 'a'
