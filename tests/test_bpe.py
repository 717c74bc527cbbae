"""Unit tests for the BPE tokenizer (operators/bpe.py): merge learning
vs a brute-force reference, rank-order application equivalence (the
deterministic-twin oracle's premise), distributed train/encode."""

from __future__ import annotations

import random
from collections import Counter

import pyspark.sql.functions as F
import pytest

from feathr_spark.operators.bpe import (_apply_one, bpe_vocab, encode_bpe,
                                        learn_merges, segment_word, train_bpe)


def _naive_learn(word_counts, num_merges):
    """Recount-everything reference trainer."""
    words = [(tuple(w), c) for w, c in word_counts if w]
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, cnt in words:
            for p in zip(syms, syms[1:]):
                pairs[p] += cnt
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        words = [(_apply_one(s, best, best[0] + best[1]), c)
                 for s, c in words]
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_matches_naive_reference():
    assert learn_merges(SENNRICH, 8) == _naive_learn(SENNRICH, 8)
    # first merge: 'es' ties 'st' at 9, lexicographic tie-break
    assert learn_merges(SENNRICH, 1) == [("e", "s")]


def test_learn_matches_naive_on_random_corpora():
    rng = random.Random(7)
    for _ in range(10):
        wc = [("".join(rng.choice("abcd") for _ in range(rng.randint(1, 8))),
               rng.randint(1, 9)) for _ in range(30)]
        assert learn_merges(wc, 12) == _naive_learn(wc, 12)


def test_rank_order_equals_sequential_global_application():
    # premise of the SQL replace-chain oracle: applying merges one by
    # one in rank order (each globally) == the min-rank re-scan loop
    rng = random.Random(11)
    wc = [("".join(rng.choice("abc") for _ in range(rng.randint(2, 10))), 1)
          for _ in range(40)]
    merges = learn_merges(wc, 15)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wc:
        seq = tuple(w)
        for p in merges:
            seq = _apply_one(seq, p, p[0] + p[1])
        assert list(seq) == segment_word(w, ranks), w


def test_distributed_train_and_encode_roundtrip(spark):
    rows = [(0, "low low low low low lower lower", "a"),
            (1, "newest newest newest newest newest newest", "a"),
            (2, "widest widest widest", "b"),
            (3, "", "b")]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    merges = train_bpe(df, num_merges=6, min_count=1)
    # word counts seen by the distributed counter == SENNRICH
    assert merges == learn_merges(SENNRICH, 6)

    enc = encode_bpe(df, merges, emit="pieces")
    got = {r["doc_id"]: r["pieces"] for r in enc.collect()}
    assert got[3] == []
    # every word reassembles exactly from its pieces
    for did, text in [(0, "low low low low low lower lower"),
                      (2, "widest widest widest")]:
        words = text.split()
        flat = "".join(got[did])
        assert flat == "".join(words)

    vocab = bpe_vocab(merges, SENNRICH)
    ids = encode_bpe(df, merges, vocab=vocab, emit="ids")
    r0 = {r["doc_id"]: r for r in ids.collect()}
    assert r0[0]["n_tok"] == len(got[0])
    assert all(isinstance(t, int) for t in r0[0]["tokens"])
    # deterministic vocab: base chars sorted then merges in order
    base = sorted({c for w, _ in SENNRICH for c in w})
    assert vocab[base[0]] == 1
    assert vocab[merges[0][0] + merges[0][1]] == len(base) + 1


def test_unknown_piece_maps_to_unk(spark):
    df = spark.createDataFrame([(0, "zzz low")], "doc_id int, text string")
    merges = learn_merges(SENNRICH, 4)
    vocab = bpe_vocab(merges, SENNRICH)   # no 'z' in vocab
    out = encode_bpe(df, merges, vocab=vocab).collect()[0]
    assert out["tokens"][:3] == [0, 0, 0]
