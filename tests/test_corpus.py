"""Corpus-construction operators: decontamination, sequence packing,
deterministic sampling, PII redaction, mixture weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feathr_spark.operators.corpus import (
    contamination,
    decontaminate,
    hash_sample,
    mixture_weights,
    pack_sequences,
    pii_features,
    pii_redact,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_decontaminate_removes_exactly_contaminated(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # shares 'alpha beta gamma'
            (2, "epsilon zeta eta theta"),        # clean
            (3, "one two three four five"),       # clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "prefix alpha beta gamma suffix")], "doc_id long, text string")
    hits = {r["doc_id"]: r["n_hits"] for r in contamination(df, bench, n=3).collect()}
    assert hits == {1: 1}
    kept = {r["doc_id"] for r in decontaminate(df, bench, n=3).collect()}
    assert kept == {2, 3}


def test_contamination_counts_distinct_ngrams(spark):
    # doc repeats the contaminated trigram twice -> still ONE distinct hit
    df = spark.createDataFrame(
        [(1, "a b c x a b c")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    assert contamination(df, bench, n=3).collect()[0]["n_hits"] == 1


def _pack_invariants(rows, budget):
    """Every sequence except per-group last is exactly full; offsets of
    consecutive docs within a sequence tile it with no gaps."""
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault((r["source"], r["seq_id"]) if "source" in r.__fields__
                          else r["seq_id"], []).append(r)
    for key, chunk in by_seq.items():
        chunk.sort(key=lambda r: r["seq_off"])
        pos = 0
        for r in chunk:
            assert r["seq_off"] == pos, (key, r)
            pos += r["n_tok_in_seq"]
        assert pos <= budget


def test_pack_sequences_partitioned(spark, docs):
    out = pack_sequences(docs, budget=100, partition_by=["source"]).collect()
    _pack_invariants(out, 100)
    # token conservation per source
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + r["n_tok_in_seq"]
    want = {r["source"]: r["t"] for r in docs.groupBy("source").agg(
        F.sum(F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                              lambda w: w != ""))).alias("t")).collect()}
    assert got == want


def test_pack_sequences_global_two_phase(spark, docs):
    """Global packing (two-phase cumsum, no single-partition window)
    equals a per-source-free reference computed with one window."""
    out = pack_sequences(docs, budget=128).collect()
    _pack_invariants(out, 128)
    from pyspark.sql import Window
    ref = (
        docs.withColumn("__n", F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                                               lambda w: w != "")).cast("long"))
        .where(F.col("__n") > 0)
        .withColumn("__e", F.sum("__n").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)))
        .select("doc_id", "__n", "__e")
    ).collect()
    ref_ends = {r["doc_id"]: r["__e"] for r in ref}
    # reconstruct each doc's global end position from pack output
    ends: dict = {}
    for r in out:
        end = r["seq_id"] * 128 + r["seq_off"] + r["n_tok_in_seq"]
        ends[r["doc_id"]] = max(ends.get(r["doc_id"], 0), end)
    assert ends == ref_ends


def test_pack_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "   "), (3, "three")], "doc_id long, text string")
    out = pack_sequences(df, budget=10, partition_by=None)
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_hash_sample_deterministic_and_sized(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).select("doc_id").collect()}
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n
    # a larger fraction at the same seed is a SUPERSET (bucket rule)
    big = {r["doc_id"] for r in hash_sample(docs, 0.6, seed=7).select("doc_id").collect()}
    assert a <= big


def test_stratified_sample_rates(docs):
    out = stratified_sample(docs, {"src0": 1.0, "src1": 0.0}, default_rate=0.5)
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    n0 = docs.where(F.col("source") == "src0").count()
    assert per["src0"] == n0          # rate 1.0 keeps everything
    assert "src1" not in per          # rate 0.0 drops everything
    others = sum(v for k, v in per.items() if k not in ("src0", "src1"))
    n_others = docs.where(~F.col("source").isin("src0", "src1")).count()
    assert 0.3 * n_others < others < 0.7 * n_others


def test_pii_redact_tags_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "email a.b-c@sub.ex-ample.org then +44 20 7946 0958 and "
             "server 192.168.0.254 done"),
         (2, "no pii here at all")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_features(df).collect()}
    r1 = out[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (1, 1, 1)
    assert r1["clean_text"] == "email <EMAIL> then <PHONE> and server <IP> done"
    r2 = out[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 0)
    assert r2["clean_text"] == "no pii here at all"


def test_pii_redact_email_digits_not_phone(spark):
    # digits inside an email local part must not be counted as a phone
    df = spark.createDataFrame(
        [(1, "reach +1234567890 or 12345678@qq.com ok")], "doc_id long, text string")
    r = pii_features(df).collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 1
    assert r["clean_text"] == "reach <PHONE> or <EMAIL> ok"


def test_mixture_weights_shares_sum_to_one(docs):
    out = mixture_weights(docs, {"src0": 0.6, "src1": 0.4}).collect()
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-9
    w = {r["source"]: r for r in out}
    # target/actual: src0 has ~1/20 of tokens, so weight ~ 12
    assert w["src0"]["weight"] == pytest.approx(
        0.6 / w["src0"]["share"], rel=1e-9)
    assert all(r["weight"] == 0.0 for r in out
               if r["source"] not in ("src0", "src1"))


def test_drop_common_lines_strategies_agree(spark):
    from feathr_spark.operators.corpus import drop_common_lines, line_doc_frequency

    rows = [
        (1, "unique one\nBOILER\nkeep me"),
        (2, "BOILER\nanother line"),
        (3, "BOILER"),                     # becomes empty
        (4, "solo text\nBOILER"),
        (5, "BOILER\nBOILER\nlast"),       # repeats within one doc count once
        (6, "nothing shared here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    freq = {r["line"]: r["doc_freq"]
            for r in line_doc_frequency(df, min_docs=2).collect()}
    assert freq == {"BOILER": 5}

    a = {r["doc_id"]: (r["text_clean"], r["n_lines_kept"])
         for r in drop_common_lines(df, min_docs=5, strategy="join").collect()}
    b = {r["doc_id"]: (r["text_clean"], r["n_lines_kept"])
         for r in drop_common_lines(df, min_docs=5, strategy="broadcast_set").collect()}
    assert a == b
    assert a[1] == ("unique one\nkeep me", 2)   # order preserved
    assert a[3] == ("", 0)                      # all-boilerplate doc
    assert a[5] == ("last", 1)
    assert a[6] == ("nothing shared here", 1)


def test_drop_common_lines_cap_raises(spark):
    from feathr_spark.operators.corpus import drop_common_lines

    df = spark.createDataFrame(
        [(i, "shared\nown%d" % i) for i in range(6)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_common_lines"):
        drop_common_lines(df, min_docs=2, strategy="broadcast_set",
                          max_common_lines=0)


# ---------------------------------------------------------------------------
# fixed-window substring dedup
# ---------------------------------------------------------------------------


def _norm_words(text):
    import re
    return [w for w in re.sub(r"\s+", " ",
                              re.sub(r"[^\w\s]", "", text.lower())).strip().split(" ")
            if w]


def _brute_dup_positions(rows, window, min_docs):
    """Python reference: {doc_id: sorted positions of windows whose text
    occurs in >= min_docs distinct docs}."""
    occ = {}
    for did, text in rows:
        ws = _norm_words(text)
        for i in range(max(len(ws) - window + 1, 0)):
            occ.setdefault(" ".join(ws[i:i + window]), []).append((did, i))
    dup = {}
    for win, hits in occ.items():
        if len({d for d, _ in hits}) >= min_docs:
            for d, p in hits:
                dup.setdefault(d, set()).add(p)
    return {d: sorted(ps) for d, ps in dup.items()}


def test_duplicate_window_stats_vs_bruteforce(spark, docs):
    from feathr_spark.operators.corpus import duplicate_window_stats

    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    W = 10
    expected = _brute_dup_positions(rows, W, 2)
    got = {r.doc_id: r for r in duplicate_window_stats(docs, window=W).collect()}
    assert len(got) == len(rows)
    for did, text in rows:
        ws = _norm_words(text)
        r = got[did]
        assert r.n_words == len(ws)
        assert r.n_windows == max(len(ws) - W + 1, 0)
        pos = expected.get(did, [])
        assert r.n_dup_windows == len(pos)
        covered = {j for p in pos for j in range(p, p + W)}
        assert r.clean_n_words == len(ws) - len(covered)
    assert any(r.n_dup_windows > 0 for r in got.values())  # non-trivial fixture


def test_remove_duplicate_spans_vs_bruteforce(spark, docs):
    from feathr_spark.operators.corpus import remove_duplicate_spans

    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    W = 10
    expected = _brute_dup_positions(rows, W, 2)
    got = {r.doc_id: r.clean_text
           for r in remove_duplicate_spans(docs, window=W).collect()}
    for did, text in rows:
        ws = _norm_words(text)
        covered = {j for p in expected.get(did, []) for j in range(p, p + W)}
        want = " ".join(w for i, w in enumerate(ws) if i not in covered)
        assert got[did] == want, did


def test_remove_duplicate_spans_keep_first(spark):
    from feathr_spark.operators.corpus import remove_duplicate_spans

    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 words
    df = spark.createDataFrame(
        [(1, boiler + " unique tail one"),
         (2, boiler + " different suffix two"),
         (3, "totally unrelated words only here")],
        ["doc_id", "text"])
    out = {r.doc_id: r.clean_text
           for r in remove_duplicate_spans(df, window=10, keep_first=True).collect()}
    # doc 1 holds the global first occurrence -> its span survives
    assert out[1].startswith("the quick brown fox")
    assert "unique tail one" in out[1]
    # doc 2's copy is removed, its own words survive
    assert out[2] == "different suffix two"
    assert out[3] == "totally unrelated words only here"
    # default policy removes both copies
    from feathr_spark.operators.corpus import duplicate_window_stats
    both = {r.doc_id: r.clean_text
            for r in remove_duplicate_spans(df, window=10).collect()}
    assert both[1] == "unique tail one"
    assert both[2] == "different suffix two"


def test_duplicate_windows_short_and_empty_docs(spark):
    from feathr_spark.operators.corpus import (duplicate_window_stats,
                                               remove_duplicate_spans)

    df = spark.createDataFrame(
        [(1, "short doc"), (2, ""), (3, "short doc")], ["doc_id", "text"])
    stats = {r.doc_id: r for r in duplicate_window_stats(df, window=10).collect()}
    assert stats[1].n_windows == 0 and stats[1].n_dup_windows == 0
    assert stats[2].n_words == 0 and stats[2].clean_n_words == 0
    clean = {r.doc_id: r.clean_text for r in remove_duplicate_spans(df, window=10).collect()}
    assert clean[1] == "short doc" and clean[2] == ""


def test_gopher_rules_branches(spark):
    from feathr_spark.operators.text import with_gopher_rules

    good = "the quick brown fox jumps over the lazy dog and runs with " \
           "great speed across wide open fields that stretch toward far " \
           "away hills under bright blue skies full of drifting clouds"
    rows = [
        (1, good),                                     # passes everything
        (2, "too short to pass"),                      # word count
        (3, "- a\n- b\n- c\n- d"),                     # bullet lines
        (4, "first line...\nsecond line…\nthird"),     # ellipsis lines
        (5, "## ## ## " + good),                       # symbol ratio
        (6, " ".join(["12345"] * 40)),                 # alpha + stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           with_gopher_rules(df, min_words=20, min_stopword_hits=2).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["r_word_count"] is False
    assert out[3]["r_bullet_lines"] is False
    assert out[4]["r_ellipsis_lines"] is False          # 2/3 lines > 0.3
    assert out[5]["r_symbol_ratio"] is False
    assert out[6]["r_alpha_words"] is False
    assert out[6]["r_stopwords"] is False
    assert all(not out[i]["gopher_pass"] for i in (2, 3, 4, 5, 6))


def test_shard_shuffle_deterministic_dense(spark):
    from feathr_spark.operators.corpus import shard_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = shard_shuffle(df, n_shards=4, seed=7)
    got = [(r["doc_id"], r["shard"], r["pos"]) for r in a.collect()]
    # deterministic across a fresh plan and a different partitioning
    b = shard_shuffle(df.repartition(13), n_shards=4, seed=7)
    assert sorted(got) == sorted((r["doc_id"], r["shard"], r["pos"])
                                 for r in b.collect())
    # dense positions per shard, all rows kept exactly once
    from collections import defaultdict
    by_shard = defaultdict(list)
    for _, sh, pos in got:
        by_shard[sh].append(pos)
    assert sum(len(v) for v in by_shard.values()) == 200
    for v in by_shard.values():
        assert sorted(v) == list(range(len(v)))
    # a different seed really permutes
    c = shard_shuffle(df, n_shards=4, seed=8)
    assert sorted(got) != sorted((r["doc_id"], r["shard"], r["pos"])
                                 for r in c.collect())


def test_gopher_repetition_hand_values(spark):
    from feathr_spark.operators.corpus import gopher_repetition

    rows = [
        (1, "ab ab ab cd"),            # top2: "ab ab" x2, 4 chars / 8
        (2, "a\nb\na"),                # dup line 1/3, chars 1/3
        (3, "x y\n\nx y"),             # dup para 1/2, chars 1/2
        (4, "a b c d e a b c d e f"),  # dup 5-gram covers 10/11 words
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           gopher_repetition(df, top_ngram_ns=(2,), dup_ngram_ns=(5,)).collect()}
    assert abs(out[1]["top_2gram_char_frac"] - 1.0) < 1e-12
    assert abs(out[2]["dup_line_frac"] - 1 / 3) < 1e-12
    assert abs(out[2]["dup_line_char_frac"] - 1 / 3) < 1e-12
    assert abs(out[3]["dup_para_frac"] - 0.5) < 1e-12
    assert abs(out[3]["dup_para_char_frac"] - 0.5) < 1e-12
    assert abs(out[4]["dup_5gram_char_frac"] - 10 / 11) < 1e-12
    # overlap counted once: "a b a b a b" has dup bigram "a b" (and
    # "b a") covering all 6 words, not 6+4 double counts
    df2 = spark.createDataFrame([(9, "a b a b a b")], "doc_id long, text string")
    r = gopher_repetition(df2, top_ngram_ns=(2,), dup_ngram_ns=(2,)).collect()[0]
    assert abs(r["dup_2gram_char_frac"] - 1.0) < 1e-12
    assert all(v == 0.0 for k, v in out[5].asDict().items()
               if k.endswith("_frac"))


# ---------------------------------------------------------------------------
# Luhn card detection
# ---------------------------------------------------------------------------


def test_luhn_card_detection(spark):
    from feathr_spark.operators.corpus import (card_spans, luhn_valid,
                                               with_card_features)

    df = spark.createDataFrame([
        (0, "visa 4539 5787 6362 1486 and near-miss 4539-5787-6362-1487"),
        (1, "amex 378282246310005 short 123456789012 long noise"),
        (2, "w1234 embedded5678digits90123 no standalone card"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_card_features(df).collect()}
    assert out[0]["n_cards_shaped"] == 2 and out[0]["n_cards_valid"] == 1
    assert out[0]["text"].count("<CARD>") == 2      # conservative redaction
    assert out[1]["n_cards_shaped"] == 1            # 12 digits: not shaped
    assert out[1]["n_cards_valid"] == 1
    assert out[2]["n_cards_shaped"] == 0 and "<CARD>" not in out[2]["text"]

    spans = df.select(card_spans("text").alias("s")).collect()
    assert spans[0]["s"] == ["4539578763621486"]
    assert spans[1]["s"] == ["378282246310005"]

    v = spark.createDataFrame(
        [("4539578763621486",), ("4539578763621487",), ("1234",), ("",)],
        "d string").select(luhn_valid(F.col("d")).alias("ok")).collect()
    assert [r["ok"] for r in v] == [True, False, False, False]


def test_corpus_diff_statuses(spark):
    from feathr_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    # custom content column: diff on tokens, not text
    from pyspark.sql import functions as F
    o2 = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    n2 = spark.createDataFrame([(1, [1, 3])], "doc_id long, tokens array<int>")
    got2 = corpus_diff(o2, n2, content_col=F.col("tokens")).collect()
    assert got2[0]["status"] == "changed"


def test_corpus_diff_summary_rollup(spark):
    from feathr_spark.operators.corpus import corpus_diff_summary

    old = spark.createDataFrame(
        [(1, "one two", "a"), (2, "three", "a"), (3, "x y z", "b")],
        "doc_id long, text string, source string")
    new = spark.createDataFrame(
        [(1, "one two", "a"), (2, "three four", "a"), (4, "w", "b")],
        "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in
           corpus_diff_summary(old, new).collect()}
    assert got["a"]["n_unchanged"] == 1 and got["a"]["n_changed"] == 1
    assert got["b"]["n_removed"] == 1 and got["b"]["n_added"] == 1
    assert got["a"]["tok_old"] == 3 and got["a"]["tok_new"] == 4
    assert got["b"]["tok_delta"] == 1 - 3


def test_cluster_sample_weights(spark):
    from feathr_spark.operators.corpus import cluster_sample_weights

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)],
        "doc_id long, cluster_rep long")
    got = {r["doc_id"]: r for r in cluster_sample_weights(labels).collect()}
    assert got[1]["cluster_size"] == 3 and abs(got[2]["weight"] - 1 / 3) < 1e-9
    assert got[4]["weight"] == 1.0 and got[5]["weight"] == 1.0
    # total probability mass = number of families
    assert abs(sum(r["weight"] for r in got.values()) - 3.0) < 1e-9


def test_temporal_split_embargo(spark):
    from feathr_spark.operators.corpus import temporal_split

    df = spark.createDataFrame(
        [(1, 100.0), (2, 170.0), (3, 199.9), (4, 200.0), (5, 250.0),
         (6, None)],
        "id long, ts double")
    got = {r["id"]: r["split"] for r in
           temporal_split(df, "ts", 200.0, embargo=30.0).collect()}
    assert got == {1: "train", 2: "embargo", 3: "embargo",
                   4: "val", 5: "val", 6: "embargo"}
    # zero embargo: boundary row goes to val, just-before goes to train
    got0 = {r["id"]: r["split"] for r in
            temporal_split(df, "ts", 200.0).collect()}
    assert got0[3] == "train" and got0[4] == "val"
    # the leakage property: with embargo >= window width w, no train
    # row can fall inside any val row's window (t_val - w, t_val]
    w = 30.0
    rows = temporal_split(df, "ts", 200.0, embargo=w).collect()
    train_ts = [r["ts"] for r in rows if r["split"] == "train"]
    val_ts = [r["ts"] for r in rows if r["split"] == "val"]
    for tv in val_ts:
        for tt in train_ts:
            assert not (tv - w < tt <= tv)
    # timestamp-typed column path
    ev = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-19 12:00:00"),
         (3, "2024-01-21 00:00:00")],
        "id long, ts string").select(
        "id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    gt = {r["id"]: r["split"] for r in
          temporal_split(ev, "ts", "2024-01-20", embargo=86400.0).collect()}
    assert gt == {1: "train", 2: "embargo", 3: "val"}
    import pytest as _pt
    with _pt.raises(ValueError, match="embargo"):
        temporal_split(df, "ts", 200.0, embargo=-1)
    # StringType ts column (ADVICE r4): must normalize through a
    # timestamp cast, not fall into string-minus-double arithmetic that
    # silently empties the train split
    sv = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-19 12:00:00"),
         (3, "2024-01-21 00:00:00"), (4, "not a timestamp")],
        "id long, ts string")
    gs = {r["id"]: r["split"] for r in
          temporal_split(sv, "ts", "2024-01-20", embargo=86400.0).collect()}
    assert gs == {1: "train", 2: "embargo", 3: "val", 4: "embargo"}
    # numeric ts + string val_start cannot be evaluated -> loud error
    with _pt.raises(ValueError, match="numeric"):
        temporal_split(df, "ts", "2024-01-20", embargo=1.0)


def test_schema_diff(spark):
    from feathr_spark.operators.corpus import schema_diff

    old = spark.createDataFrame(
        [], "doc_id long, text string, tokens array<int>, n int")
    new = spark.createDataFrame(
        [], "doc_id long, text string, tokens array<bigint>, src string")
    d = schema_diff(old, new)
    assert d["added"] == {"src": "string"}
    assert d["removed"] == {"n": "int"}
    assert d["retyped"] == {"tokens": ("array<int>", "array<bigint>")}
    assert d["unchanged"] == ["doc_id", "text"]
