"""Operators over the pre-tokenized training corpus
``(doc_id, tokens array<int>, n_tok, source)`` — the engine's
north-star input shape (BASELINE input_hint; reference analogue:
feature sources keyed by entity id, feathr-impl
``offline/source/accessor/DataSourceAccessor.scala``).

Token-frequency aggregation is the canonical vocabulary-bounded
shuffle: ``explode`` + ``groupBy(token_id)`` partially aggregates
map-side, so the exchange carries at most ``|vocab|`` rows per task
regardless of corpus size — at 10^12 sequences the shuffle volume is
``tasks × |vocab|``, not ``total_tokens``. Per-row decode mirrors
:func:`feathr_spark.operators.text.encode_tokens`: one broadcast dict
and one vectorized Arrow pass, zero shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feathr_spark.session import track_cache


def token_histogram(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Token-frequency table ``(token_id, n, share)`` over a
    pre-tokenized corpus.

    Plan: explode → hash-aggregate on ``token_id`` (map-side partial
    combine bounds the exchange at |vocab| rows/task), then the grand
    total joins back as a broadcast of one row — never a global-window
    single-partition pass.
    """
    counts = (df.select(F.explode(F.col(tokens_col)).alias("token_id"))
                .groupBy("token_id").agg(F.count("*").alias("n")))
    total = counts.agg(F.sum("n").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("token_id", "n",
                    (F.col("n") / F.col("__total")).alias("share")))


def corpus_token_stats(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    oov_id: int = 0,
    top_k: int = 100,
) -> DataFrame:
    """One-row corpus summary: total/distinct/OOV token counts, the
    occurrence share covered by the ``top_k`` most frequent tokens
    (count DESC, token_id ASC — the vocabulary's own ordering), and
    sequence-length stats (mean / p50 / p90 / max of ``n_tok_col``).

    The token-frequency table is computed once and persisted (it is
    vocabulary-bounded — a few MB even for a 100k vocab) so the global
    aggregate and the distributed top-K (``TakeOrderedAndProject``)
    reuse it instead of re-exploding the corpus; sequence-length stats
    are one partial-agg scan of the unexploded table.
    """
    counts = track_cache(
        df.select(F.explode(F.col(tokens_col)).alias("t"))
          .groupBy("t").agg(F.count("*").alias("n"))
          .persist())
    g = counts.agg(
        F.sum("n").alias("total_tokens"),
        F.count("*").alias("distinct_tokens"),
        F.sum(F.when(F.col("t") == oov_id, F.col("n")).otherwise(F.lit(0)))
         .alias("oov_tokens"))
    topk = (counts.orderBy(F.desc("n"), F.asc("t")).limit(top_k)
                  .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("__topk_n")))
    lens = df.agg(
        F.count("*").alias("total_docs"),
        F.avg(F.col(n_tok_col)).alias("mean_len"),
        F.expr(f"percentile({n_tok_col}, 0.5)").alias("p50_len"),
        F.expr(f"percentile({n_tok_col}, 0.9)").alias("p90_len"),
        F.max(F.col(n_tok_col)).alias("max_len"))
    return (g.crossJoin(topk).crossJoin(lens).select(
        "total_docs", "total_tokens", "distinct_tokens", "oov_tokens",
        (F.col("oov_tokens") / F.col("total_tokens")).alias("oov_share"),
        (F.col("__topk_n") / F.col("total_tokens")).alias("topk_coverage"),
        "mean_len", "p50_len", "p90_len", "max_len"))


def chunk_sequences(
    df: DataFrame,
    chunk_size: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    min_chunk: int = 1,
) -> DataFrame:
    """Split token sequences into fixed-size training chunks
    ``(id, chunk_idx, tokens, n_tok)`` starting at offsets
    ``0, stride, 2*stride, ...`` (``stride < chunk_size`` overlaps
    chunks, the usual LM-pretraining windowing; default stride =
    chunk_size = disjoint). Tail chunks shorter than ``min_chunk`` are
    dropped.

    Row-local JVM expressions only (``sequence`` + ``posexplode`` +
    ``slice``): the explode multiplies rows in place — zero shuffle, no
    Python. Compare :func:`feathr_spark.operators.corpus.pack_sequences`
    for the inverse (many short docs -> fixed-size rows).
    """
    stride = chunk_size if stride is None else stride
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    offs = F.sequence(
        F.lit(0),
        F.greatest(F.col(n_tok_col).cast("int") - 1, F.lit(0)),
        F.lit(stride))
    keep = [c for c in df.columns if c not in (tokens_col, n_tok_col)]
    out = (df.where(F.col(n_tok_col) > 0)
             .select(*keep, F.col(tokens_col).alias("__t"),
                     F.posexplode(offs).alias("chunk_idx", "__off"))
             .select(*keep, "chunk_idx",
                     F.slice(F.col("__t"), F.col("__off") + 1,
                             chunk_size).alias(tokens_col)))
    return (out.withColumn(n_tok_col, F.size(F.col(tokens_col)))
               .where(F.col(n_tok_col) >= min_chunk))


def decode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
    text_col: str = "text",
    oov_token: str = "<unk>",
) -> DataFrame:
    """Inverse of :func:`feathr_spark.operators.text.encode_tokens`:
    token-id arrays back to space-joined text via the broadcast
    ``token_id -> token`` dict in one vectorized Arrow ``mapInPandas``
    pass — flatten ids, one ``Series.map``, re-split by per-row
    lengths, join. Row-local: ZERO shuffle (the explode + join +
    collect_list alternative shuffles every token of the corpus and
    needs a position sort to reassemble).
    """
    import numpy as np
    import pandas as pd

    mapping = {r["token_id"]: r["token"] for r in vocab.collect()}
    bc = df.sparkSession.sparkContext.broadcast(mapping)
    keeps = [c for c in keep_cols if c in df.columns]
    base = df.select(F.col(id_col), *[F.col(c) for c in keeps],
                     F.col(tokens_col).alias("__ids"))
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in base.schema.fields if f.name != "__ids"]
        + [f"`{text_col}` string"])

    def _decode(batches):
        v = bc.value
        for pdf in batches:
            ids = pdf["__ids"]
            lens = ids.map(len).to_numpy(dtype="int64")
            if lens.sum():
                flat = pd.Series(np.concatenate(ids.to_numpy()))
                words = flat.map(v).fillna(oov_token).to_numpy()
            else:
                words = np.empty(0, dtype=object)
            cuts = np.cumsum(lens)[:-1]
            res = pdf.drop(columns=["__ids"])
            res[text_col] = [" ".join(a) for a in np.split(words, cuts)]
            yield res

    return base.mapInPandas(_decode, schema=out_schema)


def token_ngram_hashes(tokens_col: Column | str, n: int) -> Column:
    """Distinct rolling n-gram hashes over a token-id sequence: each id
    is xxhash64-spread, windows combine with the position-sensitive
    rotate-XOR fold shared with
    :func:`feathr_spark.operators.corpus.duplicate_windows` — equal
    token subsequences hash equal, 8-byte longs throughout, pure
    codegen."""
    from feathr_spark.operators.corpus import _rolling_window_hashes

    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    th = F.transform(c, lambda t: F.xxhash64(t))
    return F.array_distinct(_rolling_window_hashes(th, n))


def token_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    bench_tokens_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-overlap check ENTIRELY in token space — the
    decontamination step for a pre-tokenized corpus, no text
    round-trip (token twin of
    :func:`feathr_spark.operators.corpus.contamination`; with an
    injective vocabulary a token n-gram corresponds 1:1 to a word
    n-gram, which is what the contract oracle exploits).

    Returns ``(id_col, n_hits)`` — count of DISTINCT benchmark token
    ``n``-grams each contaminated doc contains (docs with zero hits are
    absent). Both sides reduce to 64-bit rolling n-gram hashes
    (:func:`token_ngram_hashes`), so the join carries ``(id, long)``
    rows; the benchmark set (eval suites are small) broadcasts by
    default.
    """
    bench_tokens_col = bench_tokens_col or tokens_col
    bench = (benchmark.select(
        F.explode(token_ngram_hashes(bench_tokens_col, n)).alias("__gh"))
        .distinct())
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(token_ngram_hashes(tokens_col, n)).alias("__gh"))
    return (doc_grams.join(bench, on="__gh")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


def decontaminate_tokens(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    bench_tokens_col: str | None = None,
) -> DataFrame:
    """``docs`` minus every sequence sharing any token ``n``-gram with
    ``benchmark`` (left-anti against :func:`token_contamination`)."""
    hits = token_contamination(docs, benchmark, n, tokens_col, id_col,
                               bench_tokens_col)
    return docs.join(hits.select(id_col), on=id_col, how="left_anti")
