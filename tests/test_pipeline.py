"""curate_corpus end-to-end pipeline (feathr_spark/pipeline.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feathr_spark.pipeline import curate_corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_funnel_counts_monotonic(spark, docs):
    out, report = curate_corpus(
        docs,
        gopher=True,
        gopher_thresholds={"min_words": 25, "min_stopword_hits": 1},
        exact=True,
        near_dup=True,
        near_dup_kwargs={"threshold": 0.8},
        max_per_source=30,
        track_counts=True,
    )
    stages = [r["stage"] for r in report]
    assert stages == ["input", "gopher", "exact_dedup", "near_dup",
                      "source_cap"]
    counts = [r["rows"] for r in report]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] == out.count()
    assert set(out.columns) == set(docs.columns)  # schema preserved
    # cap respected
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= 30 for r in per_src)


def test_lazy_mode_single_plan_no_actions(spark, docs):
    out, report = curate_corpus(
        docs, gopher=True, exact=False,
        gopher_thresholds={"min_words": 25, "min_stopword_hits": 1})
    assert all(r["rows"] is None for r in report)
    # row-local-only config: the whole funnel is one scan stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_exact_stage_matches_operator(spark, docs):
    from feathr_spark.operators.dedup import exact_dedup

    out, _ = curate_corpus(docs, exact=True)
    want = exact_dedup(docs)
    assert (sorted(r.doc_id for r in out.select("doc_id").collect())
            == sorted(r.doc_id for r in want.select("doc_id").collect()))


def test_near_dup_and_decontaminate_stages(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today", "a"),
        (1, "the quick brown fox jumps over the lazy dog today!", "a"),  # near-dup of 0
        (2, "completely different words about training data pipelines", "b"),
        (3, "benchmark question text that must be decontaminated away now", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [("benchmark question text that must be decontaminated away now",)],
        "text string")
    out, report = curate_corpus(
        docs, exact=False,
        near_dup=True, near_dup_kwargs={"threshold": 0.6},
        benchmark=bench, contamination_n=5,
        track_counts=True,
    )
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert 1 not in kept          # near-dup of doc 0 dropped (min-id rep kept)
    assert 0 in kept and 2 in kept
    assert 3 not in kept          # contaminated by the benchmark 5-gram
    assert [r["stage"] for r in report] == ["input", "near_dup",
                                            "decontaminate"]


def test_c4_and_language_stages(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog today and we "
            "keep going with more sentences here.\nshort line\n"
            "Another proper sentence with enough words to stay in.", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out, _ = curate_corpus(docs, exact=False, c4=True,
                           c4_thresholds={"min_sentences": 1},
                           languages=["en"])
    got = out.collect()
    assert len(got) == 1
    assert "short line" not in got[0].text  # C4 line filter rewrote text
    assert "lazy dog" in got[0].text


def test_html_entry_point(spark):
    """html_col turns curate_corpus into a raw-web pipeline: extraction
    runs first, the ratio gate drops boilerplate-heavy pages, and
    downstream stages see the EXTRACTED text."""
    pad = "<div></div>" * 40  # tag soup: huge html, tiny text
    rows = [
        (0, "<html><body><p>The quick brown fox jumps over the lazy dog "
            "and keeps on running today.</p></body></html>", "a"),
        (1, f"<html><body>{pad}<p>tiny.</p>{pad}</body></html>", "a"),
        (2, "<html><body><p>The quick brown fox jumps over the lazy dog "
            "and keeps on running today.</p></body></html>", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, html string, source string")
    out, report = curate_corpus(docs, html_col="html",
                                min_text_html_ratio=0.2,
                                exact=True, track_counts=True)
    got = {r["doc_id"]: r for r in out.collect()}
    # 1 dropped by the ratio gate; 2 is an exact dup of 0 post-extraction
    assert set(got) == {0}
    assert got[0]["text"].startswith("The quick brown fox")
    assert "<p>" not in got[0]["text"]
    stages = [r["stage"] for r in report]
    assert stages == ["input", "extract", "exact_dedup"]
    assert [r["rows"] for r in report] == [3, 2, 1]


def test_quality_lottery_stage(spark):
    """lottery_alpha wires the GPT-3 soft filter into the funnel with
    the built-in quality score; the stage is deterministic across
    reruns and keeps high-quality docs at a higher rate."""
    import random
    rng = random.Random(11)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima", "the",
             "and", "of", "to", "in", "is"]
    rows = []
    for i in range(300):
        if i % 2:  # decent prose-ish docs
            words = [rng.choice(vocab) for _ in range(60)]
        else:      # junk: tiny + repetitive + punctuation-heavy
            words = ["!!!", "x", "x", "!!!"]
        rows.append((i, " ".join(words), "web"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    out1, rep = curate_corpus(docs, exact=False, lottery_alpha=9.0,
                              track_counts=True)
    out2, _ = curate_corpus(docs, exact=False, lottery_alpha=9.0)
    ids1 = {r["doc_id"] for r in out1.collect()}
    ids2 = {r["doc_id"] for r in out2.collect()}
    assert ids1 == ids2                      # deterministic draw
    assert [r["stage"] for r in rep] == ["input", "quality_lottery"]
    kept_good = sum(1 for i in ids1 if i % 2)
    kept_junk = sum(1 for i in ids1 if not i % 2)
    assert kept_good / 150 > kept_junk / 150
    # the published filter is harsh by design: score~0.83 keeps with
    # P = (1+0.17)^-9 ~ 0.23, junk with P ~ 0.004
    assert kept_good > 15 and kept_junk < 10
    # audit columns do not leak into the output
    assert set(out1.columns) == {"doc_id", "text", "source"}


def test_html_stage_preserves_input_columns(spark):
    """A corpus already carrying title/n_links/text_html_ratio columns
    must survive the html stage untouched, and the raw html column must
    not ride through to the curated output."""
    rows = [
        (0, "<html><body><p>The quick brown fox jumps over the lazy dog "
            "and keeps on running today.</p></body></html>",
         "a", "my title", 7, 0.99)]
    docs = spark.createDataFrame(
        rows, "doc_id long, html string, source string, title string, "
              "n_links int, text_html_ratio double")
    out, _ = curate_corpus(docs, html_col="html", min_text_html_ratio=0.2)
    r = out.collect()[0]
    assert r["title"] == "my title"          # user column not clobbered
    assert r["n_links"] == 7
    assert r["text_html_ratio"] == 0.99
    assert "html" not in out.columns         # raw html dropped
    assert "quick brown fox" in r["text"]    # extraction still ran
