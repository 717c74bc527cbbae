"""Unit tests for the n-gram LM perplexity filter (operators/lm.py):
trainer semantics (hand-computed probabilities, context-before-pruning,
backoff), strategy equivalence (broadcast Arrow kernel vs join replay),
edge cases (empty docs, OOV-only docs, empty trailing batch docs), and
the CCNet head/middle/tail bucketing."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from feathr_spark.operators.lm import (NgramLM, perplexity_buckets,
                                       perplexity_scores, train_ngram_lm)


@pytest.fixture(scope="module")
def tiny(spark):
    # corpus: "a b" x3, "a c" x1  ->  unigrams a:4 b:3 c:1
    rows = [(0, "a b"), (1, "a b"), (2, "a b"), (3, "a c")]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_trainer_hand_computed(tiny):
    lm = train_ngram_lm(tiny, vocab_size=10, min_count=1,
                        smooth=0.5, alpha=0.4, max_bigrams=100)
    uni = {r["w"]: r["logp1"] for r in lm.unigrams.collect()}
    # N=8 tokens, V=3 vocab words + <unk> -> denom = 8 + 0.5*4 = 10
    assert uni["a"] == pytest.approx(math.log(4.5 / 10))
    assert uni["b"] == pytest.approx(math.log(3.5 / 10))
    assert uni["c"] == pytest.approx(math.log(1.5 / 10))
    assert uni["<unk>"] == pytest.approx(math.log(0.5 / 10))
    big = {(r["prev"], r["w"]): r["logp2"] for r in lm.bigrams.collect()}
    # ctx(a) = 4 (a precedes something in every doc)
    assert big[("a", "b")] == pytest.approx(math.log(3 / 4))
    assert big[("a", "c")] == pytest.approx(math.log(1 / 4))
    assert len(big) == 2


def test_ctx_counted_before_pruning(tiny):
    # max_bigrams=1 keeps only (a,b); its prob must still be 3/4 (the
    # pre-prune context mass), NOT 3/3
    lm = train_ngram_lm(tiny, vocab_size=10, min_count=1,
                        smooth=0.5, alpha=0.4, max_bigrams=1)
    big = {(r["prev"], r["w"]): r["logp2"] for r in lm.bigrams.collect()}
    assert set(big) == {("a", "b")}
    assert big[("a", "b")] == pytest.approx(math.log(3 / 4))


def test_scores_hand_computed(tiny, spark):
    lm = train_ngram_lm(tiny, vocab_size=10, min_count=1,
                        smooth=0.5, alpha=0.4, max_bigrams=100)
    docs = spark.createDataFrame(
        [(0, "a b"),        # log p1(a) + log p2(b|a)
         (1, "a z"),        # log p1(a) + log(0.4) + log p1(<unk>)
         (2, ""),           # empty -> nulls
         (3, "b")],         # single word: log p1(b)
        "doc_id int, text string")
    out = {r["doc_id"]: r for r in
           perplexity_scores(docs, lm, id_col="doc_id").collect()}
    lp0 = math.log(4.5 / 10) + math.log(3 / 4)
    lp1 = math.log(4.5 / 10) + math.log(0.4) + math.log(0.5 / 10)
    assert out[0]["lm_logprob"] == pytest.approx(lp0)
    assert out[0]["lm_n"] == 2
    assert out[0]["perplexity"] == pytest.approx(math.exp(-lp0 / 2))
    assert out[1]["lm_logprob"] == pytest.approx(lp1)
    assert out[2]["lm_logprob"] is None
    assert out[2]["lm_n"] == 0
    assert out[2]["perplexity"] is None
    assert out[3]["lm_logprob"] == pytest.approx(math.log(3.5 / 10))


def test_strategies_identical(spark):
    # richer corpus with OOV, pruning, and repeated contexts
    rows = [(i, f"the cat sat on the mat {i % 7} xyz{i % 3}")
            for i in range(40)] + [(100, ""), (101, "zzz qqq")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    lm = train_ngram_lm(docs, vocab_size=8, min_count=2,
                        smooth=0.5, alpha=0.4, max_bigrams=5)
    a = {r["doc_id"]: r for r in
         perplexity_scores(docs, lm, strategy="broadcast").collect()}
    b = {r["doc_id"]: r for r in
         perplexity_scores(docs, lm, strategy="join").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["lm_n"] == b[k]["lm_n"], k
        if a[k]["lm_logprob"] is None:
            assert b[k]["lm_logprob"] is None
        else:
            assert a[k]["lm_logprob"] == pytest.approx(
                b[k]["lm_logprob"], abs=1e-9)
            assert a[k]["perplexity"] == pytest.approx(
                b[k]["perplexity"], rel=1e-9)


def test_empty_doc_at_batch_end(spark):
    # regression: trailing zero-length docs put a cumsum cut at
    # len(flat) — must not IndexError, and must score null
    docs = spark.createDataFrame(
        [(0, "a b"), (1, ""), (2, "")],
        "doc_id int, text string").coalesce(1)
    lm = train_ngram_lm(docs, vocab_size=4, min_count=1)
    out = {r["doc_id"]: r for r in
           perplexity_scores(docs, lm).collect()}
    assert out[0]["lm_n"] == 2
    assert out[1]["perplexity"] is None
    assert out[2]["perplexity"] is None


def test_target_like_docs_score_lower_ppl(spark):
    # LM trained on English-looking target; English docs must get lower
    # perplexity than scrambled ones — the CCNet filter property
    tgt = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran") for i in range(20)],
        "doc_id int, text string")
    lm = train_ngram_lm(tgt, vocab_size=50, min_count=1)
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat", "en"),
         (1, "zq xv jj kk pp ww", "junk")],
        "doc_id int, text string, source string")
    out = {r["doc_id"]: r["perplexity"]
           for r in perplexity_scores(docs, lm).collect()}
    assert out[0] < out[1]


def test_perplexity_buckets(spark):
    docs = spark.createDataFrame(
        [(i, "s0", float(i + 1)) for i in range(9)]
        + [(100, "s0", None)],
        "doc_id int, source string, perplexity double")
    out = perplexity_buckets(docs, by="source", n_buckets=3)
    got = {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}
    assert 100 not in got                      # null ppl dropped
    assert [got[i] for i in range(9)] == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_model_tables_bounded(tiny):
    lm = train_ngram_lm(tiny, vocab_size=2, min_count=1, max_bigrams=100)
    # vocab_size=2 keeps {a, b}; unigrams = 2 + <unk>
    assert lm.unigrams.count() == 3
    ws = {r["w"] for r in lm.unigrams.collect()}
    assert ws == {"a", "b", "<unk>"}
    # 'c' becomes <unk> in the pair stream: bigram (a,<unk>) exists
    big = {(r["prev"], r["w"]) for r in lm.bigrams.collect()}
    assert ("a", "<unk>") in big
