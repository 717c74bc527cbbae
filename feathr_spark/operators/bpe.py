"""Byte-pair-encoding tokenizer: distributed training reduction +
zero-shuffle Arrow encoder.

Training follows the standard two-phase shape every production
tokenizer trainer uses (Sennrich et al. 2016; HF tokenizers /
sentencepiece): the corpus-sized work is ONE distributed word-frequency
count (explode + groupBy with map-side partial combine — the exchange
carries distinct words, not corpus tokens), reduced to a bounded
``(word, count)`` table via distributed top-K; the merge loop then runs
on that bounded table driver-side with incremental pair-count updates
(only words containing the merged pair are touched per round). At
100 TB the distinct-word table after ``min_count`` filtering is
O(10-100M) rows — gigabytes, not the corpus — and ``max_word_table``
caps it observably.

Encoding mirrors :func:`feathr_spark.operators.text.encode_tokens`:
merges + vocab broadcast once, applied per row in a vectorized Arrow
``mapInPandas`` pass with a per-batch unique-word cache — zero shuffle.

Mergod semantics note: applying merges one-by-one in rank order, each
globally left-to-right, is equivalent to the re-scan loop (a merge
learned at rank r cannot re-enable a rank < r pair: both symbols of the
earlier pair already existed when it was learned, and a later merge
only creates symbols that did not exist then). The deterministic-twin
oracle in ``__spark_entry__`` exploits this with a SQL replace() chain.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feathr_spark.operators.text import _words, normalize_text


# ---------------------------------------------------------------------------
# driver-side merge loop over the bounded (word, count) table
# ---------------------------------------------------------------------------

def learn_merges(
    word_counts: Sequence[tuple[str, int]],
    num_merges: int,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a ``(word, count)`` table:
    per round, the adjacent symbol pair with the highest occurrence
    count (weighted by word frequency, every adjacent position counted)
    is merged everywhere; ties break on the lexicographically smallest
    ``(left, right)``. Incremental update: each round touches only the
    words that contain the merged pair."""
    from collections import Counter, defaultdict

    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), int(c)) for w, c in word_counts if w]
    pairs: Counter = Counter()
    index: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, cnt) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pairs[p] += cnt
            index[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        best_cnt = max(pairs.values())
        if best_cnt <= 0:
            break
        best = min(p for p, c in pairs.items() if c == best_cnt)
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(index.get(best, ())):
            syms, cnt = words[wi]
            for p in zip(syms, syms[1:]):
                pairs[p] -= cnt
                if pairs[p] <= 0:
                    del pairs[p]
                index[p].discard(wi)
            syms = _apply_one(syms, best, merged)
            words[wi] = (syms, cnt)
            for p in zip(syms, syms[1:]):
                pairs[p] += cnt
                index[p].add(wi)
    return merges


def _apply_one(syms: tuple[str, ...], pair: tuple[str, str],
               merged: str) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (rank-order global application —
    see module docstring for why this equals the re-scan loop)."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) >= 2:
        # the GPT-2 bpe() loop: lowest-rank pair PRESENT IN THE WORD —
        # O(word pairs) per round, independent of total merge count
        pairs = set(zip(syms, syms[1:]))
        best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if best not in ranks:
            break
        syms = _apply_one(syms, best, best[0] + best[1])
    return list(syms)


# ---------------------------------------------------------------------------
# distributed surface
# ---------------------------------------------------------------------------

def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    min_count: int = 2,
    max_word_table: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a corpus: one distributed word-frequency
    count (the only corpus-sized job), top ``max_word_table`` words by
    (count DESC, word ASC) collected through Arrow, then the driver-side
    incremental merge loop. Deterministic for a fixed input."""
    counts = (df.select(F.explode(_words(normalize_text(F.col(text_col))))
                        .alias("w"))
                .groupBy("w").agg(F.count("*").alias("n"))
                .where(F.col("n") >= min_count)
                .orderBy(F.desc("n"), F.asc("w")).limit(max_word_table))
    pdf = counts.toPandas()
    return learn_merges(list(zip(pdf["w"], pdf["n"])), num_merges)


def bpe_vocab(merges: Sequence[tuple[str, str]],
              word_counts_or_df,
              text_col: str = "text") -> dict[str, int]:
    """Deterministic token->id table: id 0 reserved for unknown, base
    characters (sorted) first, then merged symbols in merge order."""
    if isinstance(word_counts_or_df, DataFrame):
        chars = (word_counts_or_df
                 .select(F.explode(F.split(F.concat_ws(
                     "", _words(normalize_text(F.col(text_col)))), ""))
                     .alias("c"))
                 .where(F.col("c") != "").distinct().orderBy("c"))
        base = [r["c"] for r in chars.collect()]
    else:
        seen = sorted({c for w, _ in word_counts_or_df for c in w})
        base = seen
    vocab = {c: i + 1 for i, c in enumerate(base)}
    nxt = len(base) + 1
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = nxt
            nxt += 1
    return vocab


def encode_bpe(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    vocab: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
    emit: str = "ids",
    unk_id: int = 0,
) -> DataFrame:
    """Encode documents with learned merges in one zero-shuffle Arrow
    pass. ``emit="ids"`` adds ``(tokens array<int>, n_tok int)`` using
    ``vocab`` (unknown pieces -> ``unk_id``); ``emit="pieces"`` adds the
    token strings ``(pieces array<string>, n_tok int)``. A per-batch
    unique-word cache amortizes segmentation (corpus word frequency is
    zipfian — most occurrences hit the cache)."""
    if emit == "ids" and vocab is None:
        raise ValueError("emit='ids' requires a vocab")
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast((ranks, vocab))
    keeps = [c for c in keep_cols if c in df.columns]
    base = df.select(F.col(id_col), *[F.col(c) for c in keeps],
                     _words(normalize_text(F.col(text_col)))
                     .alias("__words"))
    payload = ("`tokens` array<int>" if emit == "ids"
               else "`pieces` array<string>")
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in base.schema.fields if f.name != "__words"]
        + [payload, "`n_tok` int"])

    def _encode(batches):
        ranks_, vocab_ = bc.value
        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = segment_word(word, ranks_)
            return got

        for pdf in batches:
            toks, lens = [], []
            for words in pdf["__words"]:
                pieces: list[str] = []
                for w in words:
                    pieces.extend(seg(w))
                if emit == "ids":
                    pieces = [vocab_.get(p, unk_id) for p in pieces]
                toks.append(pieces)
                lens.append(len(pieces))
            res = pdf.drop(columns=["__words"])
            res["tokens" if emit == "ids" else "pieces"] = toks
            res["n_tok"] = lens
            yield res

    return base.mapInPandas(_encode, schema=out_schema)
