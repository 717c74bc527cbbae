"""Deterministic synthesis of the canonical input tables (FIXTURES.md F1/F2).

BASELINE.json input_hint: the engine's primary input is a table of
pre-tokenized training sequences
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``
plus an event timestamp, with hot-key (zipf-ish) skew over doc_id.

Generation is **fully distributed** (``spark.range`` + JVM column
expressions — no driver-side arrays, no Python UDFs), so the same code
synthesizes 10^3 rows for tests and 10^12 rows on a cluster. All
randomness derives from ``xxhash64(id, seed)`` — seed-fixed, partition-
count-independent, retry-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50_000
SOURCES = ("web", "books", "code", "wiki")
DAY = 86_400
T0 = 1_700_000_000  # 2023-11-14T22:13:20Z, arbitrary fixed epoch base


def _u(col, salt: int, seed: int):
    """Deterministic uniform [0,1) from a long column."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / F.lit(1_000_000_007.0)


def sequences(
    spark: SparkSession,
    n_rows: int,
    n_docs: int | None = None,
    seed: int = 42,
    skew: float = 3.0,
    span_days: int = 30,
    max_tokens: int = 512,
    num_partitions: int | None = None,
) -> DataFrame:
    """The fact table: tokenized training sequences with event times.

    - ``doc_id`` is zipf-skewed: ``floor(n_docs * u^skew)`` concentrates
      mass on low ids (hot keys are part of the spec).
    - ``tokens`` = ``transform(sequence(...), i -> hash(row, i) % VOCAB)``
      — per-row arrays built inside codegen.
    - ``n_tok == size(tokens)`` invariant holds by construction.
    """
    n_docs = n_docs or max(n_rows // 50, 1)
    df = spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    doc_idx = F.floor(F.lit(n_docs) * F.pow(_u(F.col("id"), 1, seed), F.lit(skew))).cast("long")
    n_tok = (F.pmod(F.xxhash64("id", F.lit(2), F.lit(seed)), F.lit(max_tokens - 8 + 1)) + 8).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed + 3)), F.lit(VOCAB)).cast("int"),
    )
    src = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (F.pmod(F.xxhash64("id", F.lit(4), F.lit(seed)), F.lit(len(SOURCES))) + 1).cast("int"),
    )
    event_ts = (F.lit(T0) + (_u(F.col("id"), 5, seed) * F.lit(span_days * DAY)).cast("long"))
    return df.select(
        F.concat(F.lit("doc_"), doc_idx.cast("string")).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        src.alias("source"),
        event_ts.alias("event_ts"),
    )


def observations(
    spark: SparkSession,
    n_rows: int,
    n_docs: int,
    seed: int = 42,
    skew: float = 3.0,
    span_days: int = 30,
    null_key_frac: float = 0.01,
    miss_key_frac: float = 0.02,
    num_partitions: int | None = None,
) -> DataFrame:
    """The observation (label) table: (obs_id, doc_id, ts, label, pass_val).

    Includes doc_ids with zero fact rows (ids >= n_docs, left-outer null
    case) and null keys (null-key segregation case), per FIXTURES.md F2.
    """
    df = spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    u_kind = _u(F.col("id"), 10, seed)
    doc_idx = F.floor(F.lit(n_docs) * F.pow(_u(F.col("id"), 11, seed), F.lit(skew))).cast("long")
    doc_id = (
        F.when(u_kind < null_key_frac, F.lit(None).cast("string"))
        .when(u_kind < null_key_frac + miss_key_frac,
              F.concat(F.lit("doc_"), (doc_idx + n_docs).cast("string")))
        .otherwise(F.concat(F.lit("doc_"), doc_idx.cast("string")))
    )
    # spread obs over [T0, T0 + span + 1d] so boundary windows occur
    ts = (F.lit(T0) + (_u(F.col("id"), 12, seed) * F.lit((span_days + 1) * DAY)).cast("long"))
    label = _u(F.col("id"), 13, seed)
    pass_val = (_u(F.col("id"), 14, seed) * 100.0)
    return df.select(
        F.col("id").alias("obs_id"),
        doc_id.alias("doc_id"),
        ts.alias("ts"),
        label.cast("float").alias("label"),
        pass_val.cast("float").alias("pass_val"),
    )


def documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    dup_frac: float = 0.2,
    n_words_min: int = 40,
    n_words_max: int = 120,
    vocab: int = 30_000,
    mutate_every: int = 17,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic text corpus with PLANTED near-duplicate clusters, for
    dedup benchmarks: ``dup_frac`` of the docs copy a parent drawn from
    the first 10% of ids, mutating ~1/``mutate_every`` of the words —
    word-level edit rate ~6% keeps 3-shingle Jaccard well above the 0.7
    near-dup threshold, so every dup joins its parent's cluster.

    Fully distributed (``spark.range`` + codegen expressions, no driver
    arrays, no Python UDFs); seed-fixed and partition-count-independent
    like the rest of this module, so every parallelism level of a
    scaling run reads literally the same rows.
    """
    parts = num_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_docs, 1, parts)
    is_dup = _u(F.col("id"), 20, seed) < dup_frac
    n_parents = max(n_docs // 10, 1)
    parent = F.when(is_dup, F.pmod(F.xxhash64("id", F.lit(21), F.lit(seed)),
                                   F.lit(n_parents))).otherwise(F.col("id"))
    n_words = (F.pmod(F.xxhash64(parent, F.lit(22), F.lit(seed)),
                      F.lit(n_words_max - n_words_min + 1)) + n_words_min).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.when(
            is_dup & (F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed + 23)),
                             F.lit(mutate_every)) == 0),
            F.concat(F.lit("w"), F.pmod(
                F.xxhash64(F.col("id"), i, F.lit(seed + 24)), F.lit(vocab)).cast("string")),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(
                F.xxhash64(parent, i, F.lit(seed + 25)), F.lit(vocab)).cast("string")),
        ),
    )
    src = F.element_at(
        F.array(*[F.lit(s) for s in SOURCES]),
        (F.pmod(F.xxhash64("id", F.lit(26), F.lit(seed)), F.lit(len(SOURCES))) + 1).cast("int"),
    )
    return df.select(
        F.concat(F.lit("doc_"), F.col("id").cast("string")).alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        src.alias("source"),
    )


def corpus(spark: SparkSession, sf: float = 0.01, seed: int = 42):
    """(sequences, observations) pair at a TESTDATA-like scale factor:
    sf=0.01 → 60k fact rows / 15k obs rows."""
    n_fact = max(int(6_000_000 * sf / 100) * 100, 1000)
    n_obs = max(n_fact // 4, 500)
    n_docs = max(n_fact // 50, 20)
    return (
        sequences(spark, n_fact, n_docs, seed),
        observations(spark, n_obs, n_docs, seed),
    )
