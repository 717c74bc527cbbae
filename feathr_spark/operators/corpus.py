"""Corpus-construction operators for LLM training-data pipelines.

The ops a pretraining data pipeline runs between "raw filtered docs"
and "token stream on disk", built on the text primitives in
``operators/text.py``:

- benchmark decontamination: drop/flag training docs that share word
  n-grams with an evaluation set (the standard 13-gram overlap rule,
  GPT-3 appendix C / PaLM sec. 8; n is a parameter)
- sequence packing: concat-and-chunk documents into fixed token-budget
  training sequences (GPT-style packing) with an exact global cumsum
  that never uses a single-partition window
- deterministic sampling: hash-based keep/drop so a sample is
  reproducible across runs and machines, with per-stratum rates
- PII redaction: email / IPv4 / phone-shaped spans replaced by typed
  placeholder tags, counts surfaced per doc
- mixture weights: per-domain token shares vs a target mixture ->
  resampling weights

Everything is JVM-side ``pyspark.sql.functions`` expressions (regex,
higher-order array functions, window frames) — no Python in any hot
path, every operator whole-stage-codegens and scales with executors.

Scale notes (100 TB): decontamination joins the corpus n-gram stream
against the *benchmark* n-gram set, which is small (eval suites are
MBs, not TBs) — broadcast by default, hash semi-join otherwise; the
corpus side streams through exploded and is never collected.  Packing
computes the global running token offset with the classic two-phase
cumsum (per-partition subtotals -> driver prefix over #partitions
rows -> broadcast offsets), so no stage ever funnels data through one
task.  Sampling and redaction are stateless row maps.
"""

from __future__ import annotations

from typing import Mapping, Sequence

# module scope on purpose: with `from __future__ import annotations` the
# pandas-UDF type hints are strings, and PySpark resolves them in this
# module's globals
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from feathr_spark.operators.text import normalize_text, shingles, token_count
from feathr_spark.session import track_cache

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-doc count of DISTINCT benchmark word ``n``-grams it contains.

    Returns ``(id_col, n_hits)`` for contaminated docs only (``n_hits
    >= 1``).  Both sides shingle over normalized text (see
    :func:`~feathr_spark.operators.text.shingles`) and join on the
    64-bit shingle hash, so the shuffle carries ``(id, long)`` rows —
    never document text.  The benchmark n-gram set (eval suites are
    small) is broadcast by default; pass ``broadcast_benchmark=False``
    to let the optimizer pick a shuffle hash join instead.
    """
    bench_text_col = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(F.array_distinct(shingles(bench_text_col, n))).alias("__g"))
        .select(F.xxhash64("__g").alias("__gh"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("__g"),
    ).select(id_col, F.xxhash64("__g").alias("__gh"))
    return (
        doc_grams.join(bench_grams, on="__gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """``docs`` minus every row sharing any word ``n``-gram with
    ``benchmark`` (left-anti against :func:`contamination`)."""
    hits = contamination(docs, benchmark, n, text_col, id_col,
                         bench_text_col, broadcast_benchmark)
    return docs.join(hits.select(id_col), on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_tok_col: str | Column | None = None,
    order_col: str = "doc_id",
    partition_by: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out
    end-to-end in ``order_col`` order and cut every ``budget`` tokens
    (GPT-style packing — documents may straddle a cut).

    Emits one row per (document, sequence) overlap::

        partition_by..., seq_id, id_col, seq_off, n_tok_in_seq

    where ``seq_off`` is the document's first token position inside
    sequence ``seq_id`` and ``n_tok_in_seq`` how many of its tokens
    land there.  Zero-token documents are dropped (they occupy no
    positions).

    ``n_tok_col`` defaults to whitespace :func:`token_count` over
    ``text_col``.  With ``partition_by`` the packing is independent per
    group (per-domain shards) and uses one window per group.  Without
    it the GLOBAL running offset is computed with the two-phase cumsum:
    range-partition by ``order_col``, per-partition token subtotals
    (#partitions rows) prefix-summed on the driver, broadcast back —
    the exact global cumsum with no single-partition window anywhere.
    """
    ntok = (F.col(n_tok_col) if isinstance(n_tok_col, str)
            else n_tok_col if n_tok_col is not None
            else token_count(text_col))
    base = df.withColumn("__ntok", ntok.cast("long")).where(F.col("__ntok") > 0)

    if partition_by:
        w = (Window.partitionBy(*partition_by)
             .orderBy(order_col, id_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = base.withColumn("__end", F.sum("__ntok").over(w))
        keep = list(partition_by)
    else:
        nparts = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 8)
        ranged = base.repartitionByRange(nparts, F.col(order_col), F.col(id_col))
        # PERSIST IS CORRECTNESS-CRITICAL, not an optimization: range
        # boundaries come from sampling seeded by the physical RDD id, so
        # an unpersisted plan re-executed by the downstream job could cut
        # partitions differently, making the collected __pid->offset map
        # stale (wrong global offsets / null offsets for unseen pids).
        # Persisting pins one physical partitioning; the subtotal collect
        # below materializes it, and every later action (and any evicted-
        # partition recompute) reuses the same RDD lineage and seed.
        # Registered with track_cache: call feathr_spark.release_caches()
        # once the packed output has been materialized; the per-group
        # variant (partition_by=...) needs no cache and is the 100 TB path.
        with_pid = track_cache(ranged.withColumn("__pid", F.spark_partition_id())
                               .persist(StorageLevel.MEMORY_AND_DISK))
        subtotals = {r["__pid"]: r["__t"] for r in
                     with_pid.groupBy("__pid").agg(F.sum("__ntok").alias("__t")).collect()}
        offs, acc = {}, 0
        for pid in sorted(subtotals):
            offs[pid] = acc
            acc += subtotals[pid]
        off_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in sorted(offs.items()) for x in kv]),
            F.col("__pid"),
        ) if offs else F.lit(0)
        wloc = (Window.partitionBy("__pid")
                .orderBy(order_col, id_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = with_pid.withColumn("__end", F.sum("__ntok").over(wloc) + off_expr)
        keep = []

    start = F.col("__end") - F.col("__ntok")
    first_seq = F.floor(start / budget)
    last_seq = F.floor((F.col("__end") - 1) / budget)
    out = (
        cum.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
        .select(
            *keep,
            F.col("seq_id").cast("long"),
            F.col(id_col),
            F.greatest(start - F.col("seq_id") * budget, F.lit(0)).alias("seq_off"),
            (F.least(F.col("__end"), (F.col("seq_id") + 1) * budget)
             - F.greatest(start, F.col("seq_id") * budget)).alias("n_tok_in_seq"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

_SAMPLE_M = 1_000_000


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_col: Column | None = None,
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose key hashes
    into the first ``fraction`` of 1e6 buckets.  Repeatable across
    runs, machines, and engines (unlike ``df.sample``, whose output
    depends on partitioning).  Default hash is ``xxhash64(key, seed)``;
    pass ``hash_col`` to substitute e.g. an engine-portable hash."""
    h = hash_col if hash_col is not None else F.xxhash64(F.col(key_col), F.lit(seed))
    return df.where(F.pmod(h, F.lit(_SAMPLE_M)) < int(fraction * _SAMPLE_M))


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 1.0,
    hash_col: Column | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps
    ``rates[s]`` of its rows (strata absent from ``rates`` keep
    ``default_rate``).  Same hash-bucket rule as :func:`hash_sample`,
    so a row's fate is a pure function of (key, seed) — rerunning after
    upstream changes keeps every previously kept row whose stratum rate
    did not drop."""
    h = hash_col if hash_col is not None else F.xxhash64(F.col(key_col), F.lit(seed))
    thresh = F.lit(int(default_rate * _SAMPLE_M))
    if rates:
        rate_map = F.create_map(
            *[F.lit(x) for k, r in sorted(rates.items())
              for x in (k, int(r * _SAMPLE_M))])
        thresh = F.coalesce(
            F.element_at(rate_map, F.col(strata_col)).cast("long"), thresh)
    return df.where(F.pmod(h, F.lit(_SAMPLE_M)) < thresh)


def shard_shuffle(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_col: Column | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shard`` in [0, n_shards) and a dense ``pos`` within its shard,
    both pure functions of (key, seed) — the reproducible "shuffle the
    corpus, write N shards" step ahead of training. Rerunning after a
    retry or an upstream change reproduces the identical order
    (``df.orderBy(rand())`` depends on partitioning and is not
    retry-stable).

    Plan: ONE hash-partition exchange on ``shard`` + a per-shard sort
    (Window row_number). Each shard sorts independently in parallel —
    the global permutation never funnels through a single task, and at
    10^12 rows shard count is chosen so a shard's (hash, key) pairs fit
    a task's sort spill budget. Default hash ``xxhash64(key, seed)``;
    pass ``hash_col`` to substitute an engine-portable hash (the
    contract oracle uses the LCG from :func:`hash_sample`'s family).
    """
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = hash_col if hash_col is not None else F.xxhash64(F.col(key_col), F.lit(seed))
    out = df.withColumn("__sh_h", h) \
            .withColumn("shard", F.pmod(F.col("__sh_h"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("__sh_h"), F.col(key_col))
    return (out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .drop("__sh_h"))


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# dialect-portable regexes (identical semantics in Java regex and RE2:
# character classes, bounded repeats, \b ASCII word boundaries only)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9 -]{6,}[0-9]"


def pii_redact(text: Column | str) -> Column:
    """Replace email / IPv4 / international-phone-shaped spans with
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` tags (applied in that order so
    digits inside an address are never re-matched as a phone)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, IPV4_RE, "<IP>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


def pii_features(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """``(id, n_emails, n_ips, n_phones, clean_text)`` per document —
    counts are over the raw text (email/IP first so phone never counts
    digit runs already inside an address), redaction via
    :func:`pii_redact`."""
    c = F.col(text_col)
    no_addr = F.regexp_replace(F.regexp_replace(c, EMAIL_RE, " "), IPV4_RE, " ")
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(f"({EMAIL_RE})"))).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(f"({IPV4_RE})"))).alias("n_ips"),
        F.size(F.regexp_extract_all(no_addr, F.lit(f"({PHONE_RE})"))).alias("n_phones"),
        pii_redact(c).alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# mixture weights
# ---------------------------------------------------------------------------


def mixture_weights(
    df: DataFrame,
    target: Mapping[str, float],
    strata_col: str = "source",
    n_tok_col: str | Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-domain token accounting vs a target mixture: returns
    ``(strata, n_docs, n_tokens, share, weight)`` where ``share`` is
    the domain's fraction of corpus tokens and ``weight = target_share
    / share`` is the resampling factor that hits the target (domains
    absent from ``target`` get weight 0.0 — drop).  One aggregation;
    the share normalization windows over #domains rows, not data."""
    ntok = (F.col(n_tok_col) if isinstance(n_tok_col, str)
            else n_tok_col if n_tok_col is not None
            else token_count(text_col))
    agg = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok.cast("long")).alias("n_tokens"),
    )
    total = Window.partitionBy()
    share = (F.col("n_tokens") / F.sum("n_tokens").over(total))
    tmap = (F.create_map(*[F.lit(x) for k, v in sorted(target.items())
                           for x in (k, float(v))])
            if target else F.create_map())
    tshare = F.coalesce(F.element_at(tmap, F.col(strata_col)), F.lit(0.0))
    return agg.select(
        strata_col, "n_docs", "n_tokens",
        share.alias("share"),
        (tshare / share).alias("weight"),
    )


def leakage_safe_split(
    df: DataFrame,
    train_fraction: float,
    group: Column | str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic train/val split that can NEVER leak duplicates
    across sides: rows are grouped by ``group`` (default: normalized
    text, so exact duplicates share a group; pass a dedup-cluster id
    for near-dup safety), the group's representative is its minimum
    ``id_col``, and the whole group lands on the side chosen by the
    same integer LCG used by :func:`stratified_sample` — retry-safe,
    seedable only by the data itself. Adds ``split`` ('train'/'val').

    One content-keyed exchange (the window over ``group``) — the
    unavoidable cost of group-atomic assignment; everything else is
    row-local. The representative id is bounded with ``pmod(rep, 2^31)``
    before the LCG multiply so the product stays in int64 for ANY long
    id (an unbounded ``rep * 1103515245`` silently wraps past ~8.4e9 and
    Spark's signed ``%`` then sends every overflowed group to 'train' —
    a biased split exactly at the id ranges a 100 TB corpus produces);
    for ids already in [0, 2^31) the assignment is unchanged.
    """
    g = (F.col(group) if isinstance(group, str)
         else group if group is not None
         else F.xxhash64(normalize_text(F.col(text_col))))
    w = Window.partitionBy(g)
    rep = F.pmod(F.min(F.col(id_col)).over(w).cast("long"),
                 F.lit(2147483648))
    cell = ((rep * F.lit(1103515245) + F.lit(12345))
            % F.lit(2147483648)) % F.lit(1000000)
    side = F.when(cell < F.lit(int(train_fraction * 1000000)),
                  F.lit("train")).otherwise(F.lit("val"))
    return df.withColumn("split", side)


def temporal_split(
    df: DataFrame,
    ts_col: str,
    val_start,
    embargo: float = 0.0,
) -> DataFrame:
    """Time-based train/val split with an EMBARGO gap — the temporal
    complement of :func:`leakage_safe_split` (which is content-atomic):
    rows strictly before ``val_start - embargo`` are 'train', rows at or
    after ``val_start`` are 'val', and rows inside the embargo window
    are 'embargo' (excluded from both sides). The embargo absorbs
    look-ahead leakage through windowed features: a training row at
    t < val_start - embargo cannot share any sliding window of width
    <= embargo with a validation row — set ``embargo`` to the widest
    feature window (+ max delay) of the pipeline (the same
    ``(t - w - d, t - d]`` arithmetic the SWA fact prefilter uses).
    Adds ``split``; pure projection, zero shuffle, null ts -> 'embargo'
    (never silently lands in train or val).
    """
    if embargo < 0:
        raise ValueError("embargo must be >= 0")
    from pyspark.sql import types as T
    dt = {f.name: f.dataType for f in df.schema.fields}.get(ts_col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType,
                       T.StringType)):
        # normalize to epoch seconds so the embargo (seconds) subtracts
        # cleanly; val_start may be a string/datetime literal. StringType
        # ts columns go through the same conversion (try_cast: ANSI-safe,
        # unparseable -> null -> 'embargo', same policy as null
        # timestamps): raw string-minus-double arithmetic would
        # implicitly cast to a null double and silently empty the train
        # split. val_start keeps the strict cast — a bad literal there
        # is a caller bug and must fail loudly.
        tcol = (F.col(ts_col).try_cast("timestamp")
                if isinstance(dt, T.StringType)
                else F.col(ts_col).cast("timestamp"))
        t = F.unix_micros(tcol) / F.lit(1e6)
        v = F.unix_micros(F.lit(val_start).cast("timestamp")) / F.lit(1e6)
    else:
        if isinstance(val_start, str):
            raise ValueError(
                f"temporal_split: ts column {ts_col!r} is numeric "
                f"({dt.simpleString() if dt is not None else 'missing'}) but "
                "val_start is a string; the comparison cannot be evaluated — "
                "pass a numeric val_start in the same units")
        t = F.col(ts_col)
        v = F.lit(val_start)
    side = (F.when(t.isNull(), F.lit("embargo"))
             .when(t < v - F.lit(embargo), F.lit("train"))
             .when(t >= v, F.lit("val"))
             .otherwise(F.lit("embargo")))
    return df.withColumn("split", side)


def temperature_mixture(
    df: DataFrame,
    strata_col: str = "source",
    n_tok_col: str | Column | None = None,
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling mixture (the multilingual-pretraining
    exponential-smoothing rule, p_i ∝ share_i^alpha): instead of a
    hand-written target like :func:`mixture_weights`, the target is
    derived from the corpus itself — alpha < 1 up-weights small domains,
    alpha = 1 keeps natural proportions, alpha = 0 is uniform. Returns
    ``(strata, n_docs, n_tokens, share, p_target, weight)`` with
    ``weight = p_target / share``. One aggregation; the normalizations
    window over #domains rows, not data."""
    ntok = (F.col(n_tok_col) if isinstance(n_tok_col, str)
            else n_tok_col if n_tok_col is not None
            else token_count(text_col))
    agg = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok.cast("long")).alias("n_tokens"),
    )
    total = Window.partitionBy()
    with_share = agg.withColumn(
        "share", F.col("n_tokens") / F.sum("n_tokens").over(total))
    powed = F.pow(F.col("share"), F.lit(float(alpha)))
    with_p = with_share.withColumn("p_target",
                                   powed / F.sum(powed).over(total))
    return with_p.select(
        strata_col, "n_docs", "n_tokens", "share", "p_target",
        (F.col("p_target") / F.col("share")).alias("weight"))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    content_col: str | Column | None = None,
) -> DataFrame:
    """Per-document diff between two corpus versions: ``(id, status)``
    with status ∈ {added, removed, changed, unchanged} — the
    dataset-version audit an incremental refresh publishes next to its
    datacard (which docs entered/left/mutated between snapshot v1 and
    v2), and the input to "retrain only on what changed" pipelines.

    Content equality compares ``xxhash64`` of ``content_col`` (default:
    the raw ``text_col``; pass a Column for multi-field content, e.g.
    ``F.struct("text", "source")``, or the pre-tokenized ``tokens``
    array — the north-rule corpus shape diffs on token-array equality
    for free). Scale: ONE full-outer hash join on id; the shuffle
    carries (id, 8-byte hash) only — document payloads never move.
    """
    cexpr = (F.col(content_col) if isinstance(content_col, str)
             else content_col if content_col is not None
             else F.col(text_col))
    o = old.select(F.col(id_col), F.xxhash64(cexpr).alias("__h_old"))
    n = new.select(F.col(id_col), F.xxhash64(cexpr).alias("__h_new"))
    j = o.join(n, on=id_col, how="full_outer")
    status = (F.when(F.col("__h_old").isNull(), F.lit("added"))
               .when(F.col("__h_new").isNull(), F.lit("removed"))
               .when(F.col("__h_old") == F.col("__h_new"),
                     F.lit("unchanged"))
               .otherwise(F.lit("changed")))
    return j.select(F.col(id_col), status.alias("status"))


def corpus_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    n_tok_col: str | Column | None = None,
    content_col: str | Column | None = None,
) -> DataFrame:
    """Per-stratum roll-up of :func:`corpus_diff` plus the token-budget
    delta: ``(strata, n_added, n_removed, n_changed, n_unchanged,
    tok_old, tok_new, tok_delta)``. Strata/token metadata come from the
    NEW version for surviving docs and the OLD version for removed ones
    (a removed doc still belongs to its old stratum). Output is
    #strata rows; everything upstream is the diff join + two
    map-side-combined aggregations."""
    # one unbound token-count expression, applied to both frames (a
    # frame-bound Column like old['n_tok'] would fail analysis on the
    # other side — pass the column NAME for per-frame resolution)
    ntok = (F.col(n_tok_col) if isinstance(n_tok_col, str)
            else n_tok_col if n_tok_col is not None
            else token_count(text_col))
    d = corpus_diff(old, new, id_col, text_col, content_col)
    meta_new = new.select(F.col(id_col), F.col(strata_col).alias("__s"),
                          ntok.cast("long").alias("__t"))
    meta_old = old.select(F.col(id_col), F.col(strata_col).alias("__s"),
                          ntok.cast("long").alias("__t"))
    surv = (d.where(F.col("status") != "removed")
            .join(meta_new, on=id_col))
    gone = (d.where(F.col("status") == "removed")
            .join(meta_old, on=id_col))
    per_doc = surv.unionByName(gone)
    counts = per_doc.groupBy(F.col("__s").alias(strata_col)).agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
         .alias("n_added"),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
         .alias("n_removed"),
        F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
         .alias("n_changed"),
        F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
         .alias("n_unchanged"),
    )
    tok_old = (meta_old.groupBy(F.col("__s").alias(strata_col))
               .agg(F.sum("__t").alias("tok_old")))
    tok_new = (meta_new.groupBy(F.col("__s").alias(strata_col))
               .agg(F.sum("__t").alias("tok_new")))
    return (counts
            .join(tok_old, on=strata_col, how="full_outer")
            .join(tok_new, on=strata_col, how="full_outer")
            .select(strata_col,
                    *[F.coalesce(c, F.lit(0)).alias(c)
                      for c in ["n_added", "n_removed", "n_changed",
                                "n_unchanged", "tok_old", "tok_new"]])
            .withColumn("tok_delta", F.col("tok_new") - F.col("tok_old")))


def schema_diff(old: DataFrame, new: DataFrame) -> dict:
    """Schema delta between two dataset versions — the metadata half of
    the version audit next to :func:`corpus_diff`'s row-level half:
    ``{added: {col: type}, removed: {col: type}, retyped: {col: (old,
    new)}, unchanged: [cols]}``. Pure driver-side metadata (no job);
    types compared as Catalyst simpleStrings, so nested
    struct/array/map changes surface too."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    return {
        "added": {c: n[c] for c in n if c not in o},
        "removed": {c: o[c] for c in o if c not in n},
        "retyped": {c: (o[c], n[c]) for c in o if c in n and o[c] != n[c]},
        "unchanged": sorted(c for c in o if c in n and o[c] == n[c]),
    }


def cluster_sample_weights(
    labels: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_rep",
) -> DataFrame:
    """Repetition-aware sampling weights from any clustering labels
    frame ``(id, cluster)`` (exact dup groups, MinHash/SemDeDup
    clusters): ``weight = 1 / cluster_size``, so a document family that
    survived dedup-by-annotation (rather than removal) contributes one
    document's worth of probability mass to the sampling distribution —
    the soft alternative to dropping duplicates (and what
    repetition-penalized samplers consume). One map-side-combined
    groupBy on the cluster key + one hash join back; shuffles carry
    (cluster, count) and (id, cluster) rows only."""
    sizes = labels.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, on=cluster_col)
            .select(F.col(id_col), F.col(cluster_col), "cluster_size",
                    (F.lit(1.0) / F.col("cluster_size")).alias("weight")))


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 1000,
    order_by: Sequence[str] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain/source cap: keep at most ``k`` rows per group, ranked
    by the ``order_by`` SQL expressions (descending — put the best
    first, e.g. a quality score) with ``id_col`` ascending as the
    deterministic tiebreak. The standard corpus-curation guard against
    a handful of domains dominating the mixture.

    One shuffle on ``group_col``; rank + filter run inside the window
    stage. A pathologically hot group (one domain = 10% of the corpus)
    makes one straggler partition — for that regime pre-filter with a
    cheap threshold (e.g. ``quality_score >= q``) to shrink the group
    before ranking, or cap in two stages (cap per (group, shard) with
    shard = hash(id) % s, then cap the union): both keep every
    partition bounded."""
    from pyspark.sql import Window

    order_cols = [F.expr(e).desc() for e in order_by] + [F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (df.withColumn("__rank", F.row_number().over(w))
            .where(F.col("__rank") <= k).drop("__rank"))


# ---------------------------------------------------------------------------
# line-level dedup (boilerplate removal)
# ---------------------------------------------------------------------------


def line_doc_frequency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Distinct-document frequency per line: ``(line, doc_freq)`` for
    every line occurring in at least ``min_docs`` distinct documents.

    The CCNet/RefinedWeb boilerplate signal: a line (nav bar, cookie
    banner, license header) repeated across many documents is template
    noise, not content. Repeats *within* one document don't count —
    frequency is ``countDistinct(doc_id)``.

    Scale: explode → two-phase distinct-aggregate (map-side partial
    dedup of ``(line, doc_id)``, then count per line). The output is
    bounded by the number of lines crossing ``min_docs`` — for real
    corpora a tiny fraction of the line vocabulary — and is the table
    you materialize once and reuse across curation runs.
    """
    ex = df.select(
        F.col(id_col),
        F.explode(_split_literal(text_col, delimiter)).alias("line"),
    )
    return (
        ex.groupBy("line")
        .agg(F.countDistinct(id_col).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_docs)
    )


def _split_literal(text_col: str, delimiter: str):
    """``F.split`` treats its pattern as a Java regex; the delimiter here
    is a LITERAL string (re-assembly uses it literally too), so escape it
    — ``re.escape`` output is valid Java regex for any literal."""
    import re

    return F.split(F.col(text_col), F.lit(re.escape(delimiter)), -1)


def drop_common_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    min_docs: int = 5,
    strategy: str = "join",
    common_df: DataFrame | None = None,
    max_common_lines: int = 10_000_000,
) -> DataFrame:
    """Remove every line occurring in >= ``min_docs`` distinct documents
    (RefinedWeb/CCNet line-level dedup — strips boilerplate templates
    the document-level near-dup pass can't see).

    Output = input columns plus ``{text_col}_clean`` (kept lines joined
    by ``delimiter``, original order preserved, ``""`` when every line
    was boilerplate) and ``n_lines_kept``.

    Pass ``common_df`` (a precomputed :func:`line_doc_frequency` table)
    to reuse one frequency scan across many curation runs.

    Strategies, both leakage-free of cross joins:

    - ``join`` (default; exact any-scale): posexplode → broadcast
      left-anti join against the common-line table → re-assemble via
      ``groupBy(id)`` + ``array_sort(collect_list(struct(pos, line)))``.
      The re-assembly shuffles the kept text once, keyed by document id
      — fine when cleaning is part of a pipeline that shuffles anyway.
    - ``broadcast_set``: collects the common-line table to a driver set
      (loud error above ``max_common_lines``) and filters each row's
      line array in one Arrow-batched pandas pass — ZERO shuffle of the
      payload, the right shape at 100 TB where the text column is the
      dominant byte stream and boilerplate lines are few. Python-side
      set probes are O(1)/line on hashed strings; no JVM expression
      form exists for "membership in a multi-million-entry set".
    """
    common = common_df if common_df is not None else line_doc_frequency(
        df, text_col, id_col, delimiter, min_docs)

    if strategy == "join":
        ex = df.select(
            F.col(id_col),
            F.posexplode(_split_literal(text_col, delimiter))
            .alias("__pos", "__line"),
        )
        # no broadcast hint: boilerplate-line tables are usually tiny and
        # AQE converts the anti-join to broadcast at runtime when so, but
        # a low min_docs on a web corpus can cross the threshold and a
        # forced broadcast would OOM — let the planner size it
        kept = ex.join(
            common.select(F.col("line").alias("__line")),
            "__line", "left_anti")
        re = kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"]),
                delimiter).alias(f"{text_col}_clean"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
        return (
            df.join(re, id_col, "left")
            .withColumn(f"{text_col}_clean",
                        F.coalesce(F.col(f"{text_col}_clean"), F.lit("")))
            .withColumn("n_lines_kept",
                        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long"))
        )

    if strategy == "broadcast_set":
        rows = (common.select("line")
                .limit(max_common_lines + 1).collect())
        if len(rows) > max_common_lines:
            raise ValueError(
                f"common-line table exceeds max_common_lines="
                f"{max_common_lines}; raise the cap or use strategy='join'")
        from pyspark.sql.functions import pandas_udf

        bc = df.sparkSession.sparkContext.broadcast(
            frozenset(r["line"] for r in rows))

        @pandas_udf("struct<clean:string,kept:long>")
        def _clean(s: pd.Series) -> pd.DataFrame:
            drop = bc.value
            cleaned, kept = [], []
            for t in s:
                if t is None:  # match the join strategy: null text -> ("", 0)
                    cleaned.append("")
                    kept.append(0)
                    continue
                ls = [l for l in t.split(delimiter) if l not in drop]
                cleaned.append(delimiter.join(ls))
                kept.append(len(ls))
            return pd.DataFrame({"clean": cleaned, "kept": kept})

        out = df.withColumn("__c", _clean(F.col(text_col)))
        return (out
                .withColumn(f"{text_col}_clean", F.col("__c.clean"))
                .withColumn("n_lines_kept", F.col("__c.kept"))
                .drop("__c"))

    raise ValueError(f"unknown strategy {strategy!r}")


# ---------------------------------------------------------------------------
# exact substring (fixed-window) dedup — Lee et al. 2022, arXiv 2107.06499
# ---------------------------------------------------------------------------


def duplicate_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Occurrences ``(id_col, pos, win_hash)`` of ``window``-word windows
    whose content appears in >= ``min_docs`` distinct documents — exact
    substring duplication at fixed granularity, the distributable
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; their
    ExactSubstr uses a single-machine suffix array, which has no clean
    1000-executor decomposition — a rolling fixed-width window inventory
    does: it finds every duplicated substring of length >= window, at
    window-start resolution). Beyond the reference's surface (its dedup
    stops at row level); complements ``minhash_lsh_dedup`` (whole-doc
    near-dup) and ``drop_common_lines`` (line granularity).

    ``pos`` is the 0-based word offset of the window start after
    :func:`~feathr_spark.operators.text.normalize_text`.

    Scale shape: the exploded stream carries ``(win_hash:long, id, pos)``
    — ids and 8-byte hashes, never window text, so the shuffle is
    O(corpus tokens) narrow rows. The >= min_docs screen is a two-phase
    hash aggregation (map-side partial distinct via the (hash, id)
    dedup), and qualifying hashes come back as a left-semi join that AQE
    broadcasts when the duplicated-window inventory is small (the common
    case: dup density << 1). No stage materializes window strings: each
    word is xxhash64'd ONCE (its own projection, so CollapseProject
    can't re-inline the normalize+split pipeline per reference — it
    only collapses cheap or singly-referenced aliases), and window
    hashes are a position-sensitive rotate-XOR fold over the long
    array — O(words * window) 8-byte ops instead of O(words * window^2)
    chars of shingle-string concat (measured 2.6 s -> ~0.3 s for the
    sf0.1 inventory)."""
    base = df.select(
        F.col(id_col),
        F.transform(_text_words(text_col),
                    lambda w: F.xxhash64(w)).alias("__wh"),
    )
    wins = base.select(
        F.col(id_col),
        F.posexplode(_rolling_window_hashes(F.col("__wh"), window))
        .alias("pos", "win_hash"),
    )
    # the inventory feeds BOTH the >= min_docs screen and the output
    # stream; materialize it once (the repo-wide persisted-table
    # discipline — see PLANS.md) so the text scan + normalize + hash
    # pipeline runs a single time, not once per consuming subtree.
    # Registered with track_cache: feathr_spark.release_caches() frees it.
    wins = track_cache(wins.persist(StorageLevel.MEMORY_AND_DISK))
    wins.count()
    dup_hashes = (
        wins.select("win_hash", id_col).distinct()
        .groupBy("win_hash").count()
        .where(F.col("count") >= min_docs)
        .select("win_hash")
    )
    return wins.join(dup_hashes, "win_hash", "left_semi") \
        .select(id_col, "pos", "win_hash")


def _covered_indices(pos_set: Column, window: int) -> Column:
    """Distinct 0-based word indices covered by the union of
    [pos, pos+window) spans (overlaps merged by construction)."""
    return F.array_distinct(F.flatten(F.transform(
        pos_set, lambda p: F.sequence(p, p + F.lit(window - 1)))))


def duplicate_window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplication profile: total word/window counts, how
    many windows are cross-document duplicates, and how many words would
    survive :func:`remove_duplicate_spans` — the audit table a curation
    pipeline inspects before committing to span removal."""
    words = _text_words(text_col)
    base = df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.greatest(F.size(words) - F.lit(window - 1), F.lit(0))
        .cast("long").alias("n_windows"),
    )
    per_doc = (
        duplicate_windows(df, text_col, id_col, window, min_docs)
        .groupBy(id_col)
        .agg(F.count("*").alias("__ndup"), F.collect_set("pos").alias("__pp"))
        .select(
            id_col, "__ndup",
            F.size(_covered_indices(F.col("__pp"), window)).alias("__ncov"),
        )
    )
    return base.join(per_doc, id_col, "left").select(
        id_col, "n_words", "n_windows",
        F.coalesce("__ndup", F.lit(0)).cast("long").alias("n_dup_windows"),
        (F.col("n_words") - F.coalesce("__ncov", F.lit(0)))
        .cast("long").alias("clean_n_words"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_docs: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Rewrite each document with every cross-document-duplicated
    ``window``-word span removed (overlapping spans merge; the rebuilt
    text is the surviving words joined by single spaces, in original
    order, on the normalized form). With ``keep_first=True`` the
    globally first occurrence of each duplicated window — min
    ``(id_col, pos)`` — is exempt, so exactly one copy of each
    duplicated passage survives in the corpus (the Lee et al. policy);
    the default drops all occurrences (the conservative policy when
    boilerplate should vanish entirely).

    Adds ``clean_text``; all input columns pass through. Pure JVM:
    span merging is array algebra (sequence/flatten/array_except) inside
    whole-stage codegen, no Python worker touches the corpus."""
    dup = duplicate_windows(df, text_col, id_col, window, min_docs)
    if keep_first:
        # global-first = lexicographic min (id, pos) per window hash.
        # A combinable groupBy-min (map-side partial agg) + join, NOT a
        # row_number() window: a viral boilerplate passage puts millions
        # of occurrences under one win_hash, and a window sort would
        # funnel them through a single straggler partition; the min
        # aggregate combines map-side and the (duplicated-window-bounded)
        # first table broadcasts.
        first = dup.groupBy("win_hash").agg(
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"))
        dup = (dup.join(first, "win_hash")
               .where(~((F.col(id_col) == F.col(f"__first.{id_col}"))
                        & (F.col("pos") == F.col("__first.pos"))))
               .drop("__first"))
    spans = dup.groupBy(id_col).agg(F.collect_set("pos").alias("__pp"))
    words = _text_words(text_col)
    covered = _covered_indices(F.coalesce(F.col("__pp"),
                                          F.array().cast("array<int>")), window)
    keep_idx = F.when(
        F.size(words) > 0,
        F.array_except(F.sequence(F.lit(0), F.size(words) - 1), covered),
    ).otherwise(F.array().cast("array<int>"))
    rebuilt = F.concat_ws(
        " ", F.transform(keep_idx, lambda i: F.element_at(words, i + 1)))
    return df.join(spans, id_col, "left") \
        .withColumn("clean_text", rebuilt).drop("__pp")


def _text_words(text_col: str) -> Column:
    from feathr_spark.operators.text import _words, normalize_text
    return _words(normalize_text(F.col(text_col)))


def _rolling_window_hashes(wh: Column, window: int) -> Column:
    """64-bit hash per ``window``-word window from per-word hashes:
    ``h[i] = XOR_k rotl(wh[i+k], 7k)`` — position-sensitive (distinct
    rotations up to window 64; equal word sequences hash equal, the
    equality-class property the dedup screen needs), pure long algebra
    inside whole-stage codegen. Output has exactly
    ``max(size - window + 1, 0)`` entries; ``pos`` from posexplode is
    the window-start word offset."""
    if not 1 <= window <= 64:
        raise ValueError("window must be in [1, 64]")
    def _win(i: Column) -> Column:
        # flat XOR chain of O(1) element_at probes — one shallow
        # expression per window, no intermediate arrays and no nested
        # lambdas (a zip_with fold measured ~5 s of codegen compile for
        # window=10; this form compiles in noise)
        h = F.element_at(wh, i + 1)
        for k in range(1, window):
            r = (k * 7) % 64
            y = F.element_at(wh, i + k + 1)
            h = h.bitwiseXOR(F.shiftleft(y, r).bitwiseOR(
                F.shiftrightunsigned(y, 64 - r))) if r else h.bitwiseXOR(y)
        return h

    return F.when(
        F.size(wh) >= window,
        F.transform(F.sequence(F.lit(0), F.size(wh) - window), _win),
    ).otherwise(F.array().cast("array<long>"))


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram_ns: tuple[int, ...] = (2, 3, 4),
    dup_ngram_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The COMPLETE Gopher repetition-filter set (Rae et al. 2021,
    appendix A1.1) — the published thresholds reject documents on any
    of these; :func:`feathr_spark.operators.text.repetition_features`
    carries the two cheapest signals, this computes the full table:

    - ``dup_line_frac`` / ``dup_para_frac``: fraction of non-blank
      lines / paragraphs (split on one / two newlines) that repeat an
      earlier one — ``1 - distinct/total``;
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: characters in
      the repeated occurrences / total segment characters;
    - ``top_{n}gram_char_frac`` (n in ``top_ngram_ns``): characters of
      the most frequent word n-gram x its count / total word
      characters (ties broken by larger n-gram length — both engines
      agree because the frac depends only on (count, length));
    - ``dup_{n}gram_char_frac`` (n in ``dup_ngram_ns``): fraction of
      word characters covered by n-grams occurring more than once in
      the document, overlapping coverage counted ONCE (span-union via
      :func:`_covered_indices`).

    Words are :func:`_text_words` (normalized); line/para splits run on
    the RAW text, as in the paper.

    Scale shape: segment fractions are doc-local JVM array expressions
    (zero shuffle; O(distinct x total) comparisons per doc — lines and
    paragraphs are short). Each n-gram statistic explodes
    ``(id, pos, win_hash[, charlen])`` — 8-byte rolling hashes
    (:func:`_rolling_window_hashes`), never n-gram text — into a
    map-side-combined groupBy bounded by distinct (doc, ngram) pairs;
    per-doc results are skinny (one row per doc) and join back in ONE
    doc-keyed join after an all-skinny merge. The hashed word array is
    built once and persisted across all ``len(top)+len(dup)`` jobs.
    Cite: duplicate_windows (cross-doc form) shares the hash kernel.
    """
    def _seg_stats(delim: str) -> tuple[Column, Column]:
        segs = F.filter(
            F.transform(F.split(F.col(text_col), delim), F.trim),
            lambda s: s != "")
        nseg = F.size(segs)
        dup_frac = F.when(
            nseg > 0,
            1.0 - F.size(F.array_distinct(segs)) / nseg.cast("double"),
        ).otherwise(F.lit(0.0))
        tot = F.aggregate(segs, F.lit(0).cast("long"),
                          lambda a, s: a + F.length(s))
        dup_chars = F.aggregate(
            F.array_distinct(segs), F.lit(0).cast("long"),
            lambda a, d: a + (F.size(F.filter(segs, lambda x: x == d)) - 1)
            * F.length(d))
        char_frac = F.when(tot > 0, dup_chars / tot.cast("double")) \
            .otherwise(F.lit(0.0))
        return dup_frac, char_frac

    line_frac, line_char = _seg_stats(r"\n")
    para_frac, para_char = _seg_stats(r"\n{2}")
    base = (df.withColumn("dup_line_frac", line_frac)
            .withColumn("dup_line_char_frac", line_char)
            .withColumn("dup_para_frac", para_frac)
            .withColumn("dup_para_char_frac", para_char))

    slim = df.select(F.col(id_col), F.col(text_col))
    # the word-hash transforms and the downstream explodes inherit the
    # input partitioning; when the source arrives in fewer splits than
    # the session can use (one small file, a coalesced upstream), ONE
    # id-keyed exchange of (id, text) before the heavy transforms is
    # amortized over all len(top)+len(dup) consuming jobs. At real
    # scale the file splits already saturate and the exchange is
    # skipped.
    sc = df.sparkSession.sparkContext
    if slim.rdd.getNumPartitions() < max(sc.defaultParallelism // 2, 2):
        slim = slim.repartition(F.col(id_col))
    words = _text_words(text_col)
    arr = slim.select(
        F.col(id_col),
        F.transform(words, lambda w: F.xxhash64(w)).alias("__wh"),
        F.transform(words, lambda w: F.length(w)).alias("__wl"),
    ).withColumn(
        "__tc", F.aggregate("__wl", F.lit(0).cast("long"),
                            lambda a, x: a + x))
    arr = track_cache(arr.persist(StorageLevel.MEMORY_AND_DISK))

    skinny: DataFrame | None = arr.select(id_col, "__tc")
    for n in top_ngram_ns:
        wl = F.col("__wl")
        rcl = F.when(
            F.size(wl) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(wl) - n),
                lambda i: F.aggregate(F.slice(wl, i + 1, n),
                                      F.lit(0).cast("long"),
                                      lambda a, x: a + x)))
        wins = arr.select(
            F.col(id_col),
            F.explode(F.arrays_zip(
                _rolling_window_hashes(F.col("__wh"), n).alias("h"),
                rcl.alias("cl"))).alias("z"))
        top = (wins.groupBy(id_col, "z.h", "z.cl")
               .agg(F.count(F.lit(1)).alias("c"))
               .groupBy(id_col)
               .agg(F.max(F.struct("c", "cl")).alias("s"))
               .select(id_col,
                       (F.col("s.c") * F.col("s.cl")).cast("long")
                       .alias(f"__top{n}")))
        skinny = skinny.join(top, id_col, "left")
    for n in dup_ngram_ns:
        wins = arr.select(
            F.col(id_col),
            F.posexplode(_rolling_window_hashes(F.col("__wh"), n))
            .alias("pos", "h"))
        pos_per_doc = (wins.groupBy(id_col, "h")
                       .agg(F.collect_list("pos").alias("ps"))
                       .where(F.size("ps") >= 2)
                       .groupBy(id_col)
                       .agg(F.flatten(F.collect_list("ps")).alias("ap")))
        cov = (arr.join(pos_per_doc, id_col)
               .select(
                   F.col(id_col),
                   F.aggregate(
                       _covered_indices(F.col("ap"), n),
                       F.lit(0).cast("long"),
                       lambda a, i: a + F.element_at("__wl", i + 1))
                   .alias(f"__cov{n}")))
        skinny = skinny.join(cov, id_col, "left")

    out = base.join(skinny, id_col, "left")
    tc = F.col("__tc").cast("double")
    for n in top_ngram_ns:
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.when((F.col("__tc") > 0) & F.col(f"__top{n}").isNotNull(),
                   F.col(f"__top{n}") / tc).otherwise(F.lit(0.0)))
    for n in dup_ngram_ns:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            F.when((F.col("__tc") > 0) & F.col(f"__cov{n}").isNotNull(),
                   F.col(f"__cov{n}") / tc).otherwise(F.lit(0.0)))
    drops = (["__tc"] + [f"__top{n}" for n in top_ngram_ns]
             + [f"__cov{n}" for n in dup_ngram_ns])
    return out.drop(*drops)


# payment-card-shaped span: 13-19 digits allowing single space/dash
# separators; the checksum decides validity (see luhn_valid)
CARD_RE = r"\b[0-9](?:[ -]?[0-9]){11,17}[0-9]\b"


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum over a pure-digit string column (boolean; false
    for lengths outside 13–19). Pure JVM ``aggregate`` fold — the
    validation step that separates a real card number from 16 arbitrary
    digits, which a regex alone cannot do."""
    n = F.length(digits)

    def d(i):
        # Column.substr accepts Column positions (F.substring does not
        # in every pyspark version)
        return digits.substr(i, F.lit(1)).cast("int")

    # digit at 0-based position (n - i) from the RIGHT: odd -> doubled
    # (9-wrapped), even -> as-is; valid iff the sum is a multiple of 10
    total = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.lit(0),
        lambda acc, i: acc + F.when(
            (n - i) % 2 == 1,
            F.when(d(i) * 2 > 9, d(i) * 2 - 9).otherwise(d(i) * 2),
        ).otherwise(d(i)),
    )
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def card_spans(text: Column | str, valid_only: bool = True) -> Column:
    """Array of card digit strings found in ``text`` (separators
    stripped); with ``valid_only`` only Luhn-passing spans survive."""
    c = F.col(text) if isinstance(text, str) else text
    spans = F.transform(
        F.regexp_extract_all(c, F.lit(f"({CARD_RE})")),
        lambda s: F.regexp_replace(s, r"[ -]", ""))
    if valid_only:
        spans = F.filter(spans, luhn_valid)
    return spans


def with_card_features(
    df: DataFrame,
    text_col: str = "text",
    redact: bool = True,
) -> DataFrame:
    """Adds ``n_cards_shaped`` (card-shaped spans), ``n_cards_valid``
    (Luhn-passing — the real-PII count), and with ``redact`` rewrites
    ``text_col`` replacing every card-SHAPED span with ``<CARD>``
    (conservative: regex replacement cannot validate per match, and a
    16-digit near-miss is still worth scrubbing). Row-local codegen,
    zero shuffle; composes before :func:`pii_redact` (cards first so
    the phone pattern never eats a separated card's digit run)."""
    c = F.col(text_col)
    out = (df.withColumn("n_cards_shaped",
                         F.size(card_spans(c, valid_only=False)))
             .withColumn("n_cards_valid", F.size(card_spans(c))))
    if redact:
        out = out.withColumn(text_col,
                             F.regexp_replace(c, CARD_RE, "<CARD>"))
    return out
