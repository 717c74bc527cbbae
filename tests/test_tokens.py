"""Unit tests for operators over the pre-tokenized corpus shape
(operators/tokens.py): histogram, corpus stats, decode round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from feathr_spark.operators.text import build_vocabulary, encode_tokens
from feathr_spark.operators.tokens import (corpus_token_stats, decode_tokens,
                                           token_histogram)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", "web"),
        (1, "the dog sat", "web"),
        (2, "a rare xylophone", "books"),   # 'a'/'rare'/'xylophone' 1x -> OOV
        (3, "", "web"),                      # empty doc
        (4, "the the the", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


@pytest.fixture(scope="module")
def enc_vocab(docs):
    vocab = build_vocabulary(docs, max_size=100, min_count=2)
    return encode_tokens(docs, vocab, keep_cols=("source",)), vocab


def test_histogram_counts_and_shares(enc_vocab):
    enc, _ = enc_vocab
    hist = {r["token_id"]: (r["n"], r["share"])
            for r in token_histogram(enc).collect()}
    total = sum(n for n, _ in hist.values())
    # corpus has 15 words total (doc3 empty)
    assert total == 15
    # 'the' occurs 6x and is token_id 1 (highest count)
    assert hist[1][0] == 6
    # OOV bucket: 'on','a','rare','xylophone' each 1x -> 4 (min_count=2
    # drops them; 'cat','dog','mat' also 1x -> OOV too) = 7
    assert hist[0][0] == 7
    assert abs(sum(s for _, s in hist.values()) - 1.0) < 1e-9


def test_corpus_stats(enc_vocab):
    enc, _ = enc_vocab
    s = corpus_token_stats(enc, top_k=2).collect()[0]
    assert s["total_docs"] == 5
    assert s["total_tokens"] == 15
    assert s["oov_tokens"] == 7
    assert s["max_len"] == 6
    assert abs(s["oov_share"] - 7 / 15) < 1e-9
    # top-2 buckets by count: OOV(7) + the(6) = 13
    assert abs(s["topk_coverage"] - 13 / 15) < 1e-9


def test_decode_roundtrip_exact_for_in_vocab(docs, enc_vocab):
    enc, vocab = enc_vocab
    dec = decode_tokens(enc, vocab, keep_cols=("source",))
    # re-encoding the decoded text reproduces the ids exactly:
    # in-vocab words map back to themselves; '<unk>' is itself OOV
    enc2 = encode_tokens(dec, vocab, keep_cols=())
    mism = (enc.select("doc_id", F.to_json("tokens").alias("j"))
               .join(enc2.select("doc_id", F.to_json("tokens").alias("j2")),
                     "doc_id")
               .where(F.col("j") != F.col("j2")).count())
    assert mism == 0
    texts = {r["doc_id"]: r["text"] for r in dec.collect()}
    assert texts[3] == ""
    assert texts[4] == "the the the"
    assert texts[0].startswith("the")
    assert "<unk>" in texts[2]


def test_decode_preserves_keep_cols(enc_vocab):
    enc, vocab = enc_vocab
    dec = decode_tokens(enc, vocab, keep_cols=("source",))
    assert set(dec.columns) == {"doc_id", "source", "text"}


def test_chunk_sequences_stride_and_tails(spark):
    from feathr_spark.operators.tokens import chunk_sequences
    df = spark.createDataFrame(
        [(1, list(range(10)), 10), (2, [], 0), (3, [1, 2], 2)],
        "doc_id int, tokens array<int>, n_tok int")
    out = {(r["doc_id"], r["chunk_idx"]): r["tokens"]
           for r in chunk_sequences(df, chunk_size=4, stride=2,
                                    min_chunk=3).collect()}
    # doc 1: offsets 0,2,4,6,8 -> sizes 4,4,4,4,2; min_chunk=3 drops the tail
    assert out[(1, 0)] == [0, 1, 2, 3]
    assert out[(1, 1)] == [2, 3, 4, 5]
    assert out[(1, 3)] == [6, 7, 8, 9]
    assert (1, 4) not in out
    # doc 2 empty -> nothing; doc 3 len 2 < min_chunk -> nothing
    assert not any(k[0] in (2, 3) for k in out)


def test_chunk_sequences_disjoint_default(spark):
    from feathr_spark.operators.tokens import chunk_sequences
    df = spark.createDataFrame([(1, list(range(9)), 9)],
                               "doc_id int, tokens array<int>, n_tok int")
    rows = chunk_sequences(df, chunk_size=4).orderBy("chunk_idx").collect()
    assert [r["tokens"] for r in rows] == [[0, 1, 2, 3], [4, 5, 6, 7], [8]]
    assert [r["n_tok"] for r in rows] == [4, 4, 1]


def test_leakage_safe_split_groups_stay_together(spark):
    from feathr_spark.operators.corpus import leakage_safe_split
    rows = [(i, f"unique text {i}", "a") for i in range(50)]
    rows += [(100 + i, "Exact DUP text!", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    out = leakage_safe_split(df, 0.8)
    dup_sides = {r["split"] for r in
                 out.where(F.col("doc_id") >= 100).collect()}
    assert len(dup_sides) == 1          # all duplicates on one side
    sides = {r["split"] for r in out.collect()}
    assert sides == {"train", "val"}    # both sides populated
    # deterministic: re-running yields identical assignment
    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(df, 0.8).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out.collect())


def test_leakage_safe_split_wide_ids_unbiased(spark):
    """Representative ids past 2^31 must not overflow the LCG: an
    unbounded rep * 1103515245 wraps negative and Spark's signed %
    sends every such group to 'train' (silent bias at exactly the id
    ranges a big corpus produces). The pmod-bounded form must populate
    BOTH sides on wide ids and keep small-id assignments identical to
    the raw LCG."""
    from feathr_spark.operators.corpus import leakage_safe_split

    base = 10_000_000_000  # > 2^31: raw LCG overflows int64
    rows = [(base + i * 7, f"text number {i}", "s") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = leakage_safe_split(df, 0.5)
    frac = out.where(F.col("split") == "train").count() / 400
    assert 0.3 < frac < 0.7, f"biased split on wide ids: train frac {frac}"
    # small ids: assignment equals the raw (unbounded) LCG formula
    small = spark.createDataFrame(
        [(i * 13, f"small {i}", "s") for i in range(200)],
        "doc_id long, text string, source string")
    got = {r["doc_id"]: r["split"]
           for r in leakage_safe_split(small, 0.8).collect()}
    for i in range(200):
        rep = i * 13
        cell = ((rep * 1103515245 + 12345) % 2147483648) % 1000000
        want = "train" if cell < 800000 else "val"
        assert got[rep] == want


def test_token_contamination_and_decontaminate(spark):
    from feathr_spark.operators.tokens import (token_contamination,
                                               decontaminate_tokens)

    docs = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5]),       # contains bench 3-grams (1,2,3),(2,3,4)
         (2, [9, 9, 9, 9]),          # no overlap
         (3, [2, 3, 4, 2, 3, 4]),    # (2,3,4) twice but DISTINCT hit = 1
         (4, [7, 8])],               # shorter than n
        "doc_id long, tokens array<int>")
    bench = spark.createDataFrame(
        [(100, [1, 2, 3, 4]),        # 3-grams (1,2,3),(2,3,4)
         (101, [50, 51, 52])],
        "doc_id long, tokens array<int>")
    hits = {r["doc_id"]: r["n_hits"] for r in
            token_contamination(docs, bench, n=3).collect()}
    assert hits == {1: 2, 3: 1}
    left = sorted(r["doc_id"] for r in
                  decontaminate_tokens(docs, bench, n=3).collect())
    assert left == [2, 4]
