"""N-gram language-model perplexity scoring for corpus filtering (the
CCNet recipe, Wenzek et al. 2020: score every document's perplexity
under an LM trained on a trusted target corpus, then keep/bucket by
perplexity — the classic "does this web page read like Wikipedia"
filter used by CCNet/LLaMA/RedPajama pipelines).

The production recipe uses a KenLM 5-gram model; this engine trains a
word-bigram stupid-backoff LM (Brants et al. 2007, "Large Language
Models in Machine Translation") entirely in Spark — the same
count-tables-plus-backoff family KenLM implements, at an order that
keeps the model a bounded DataFrame:

- ``train_ngram_lm``: two vocabulary-bounded count shuffles (unigram +
  bigram over the vocab-mapped words, map-side partial combine). The
  bigram table is pruned to ``max_bigrams`` by (count DESC, bigram ASC)
  — pruned pairs fall back to the unigram path, the standard pruned-LM
  semantics, so the model size is capped regardless of corpus size.
- ``perplexity_scores``: two strategies that produce IDENTICAL numbers
  (property-tested):

  * ``strategy="broadcast"`` (default): the bounded model broadcasts as
    numpy arrays; scoring is ONE zero-shuffle Arrow ``mapInPandas``
    pass (vocab ids via one ``Series.map``; bigram lookup via
    ``np.searchsorted`` over the sorted ``prev*(V+1)+w`` key array —
    fully vectorized, no per-row Python). This is the 100 TB hot path:
    corpus-sized work crosses zero exchanges.
  * ``strategy="join"``: explode to (doc, prev, w) pairs, broadcast-join
    the model tables, one doc-bounded partial-agg exchange. Use when the
    model must exceed broadcast size (higher orders / unpruned tables);
    also the shape the DuckDB oracle replays.

Model semantics (deterministic, oracle-replayable):

- words = whitespace split of ``normalize_text`` (shared with the
  vocabulary/tokenizer/dedup operators); OOV maps to one ``<unk>`` cell.
- unigram: add-``smooth`` over V vocab words + ``<unk>``:
  ``p1(w) = (c1(w) + s) / (N + s*(V+1))``.
- bigram stupid backoff: ``p(w|prev) = c2(prev,w) / ctx(prev)`` when the
  (kept) bigram exists, else ``alpha * p1(w)``; ``ctx(prev)`` is the
  total bigram count with ``prev`` as context (occurrences of ``prev``
  not at document end), computed BEFORE pruning so kept-pair
  probabilities still sum correctly against their true context mass.
- doc score: ``log p1(w1) + sum_i log p(w_i | w_{i-1})``;
  ``ppl = exp(-logprob / n_words)``; empty docs score null.

Reference analogue: the reference ships no LM filter — this extends the
corpus-construction operator family (SURVEY §2 "beyond the reference"
tier) alongside DSIR importance scoring (selection.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feathr_spark.operators.text import _words, normalize_text
from feathr_spark.session import track_cache

UNK = "<unk>"


@dataclass
class NgramLM:
    """Bounded bigram stupid-backoff model.

    ``unigrams``: (w, logp1) — V vocab rows + one ``<unk>`` row.
    ``bigrams``: (prev, w, logp2) — ≤ max_bigrams rows, vocab-mapped.
    ``alpha``: backoff multiplier (log-added at score time).
    """

    unigrams: DataFrame
    bigrams: DataFrame
    alpha: float


def train_ngram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 10000,
    min_count: int = 2,
    smooth: float = 0.5,
    alpha: float = 0.4,
    max_bigrams: int = 1_000_000,
) -> NgramLM:
    """Train the bigram stupid-backoff LM over ``corpus``.

    Scale shape: the corpus-sized jobs are two explode+groupBy counts
    (unigram, bigram) with map-side partial combine; everything
    downstream operates on vocabulary-bounded tables. The bigram count
    shuffle is bounded by distinct observed vocab-pairs per partition
    (zipf text: far below the V² ceiling); pruning to ``max_bigrams``
    uses a distributed top-K (TakeOrderedAndProject), never a global
    sort.
    """
    spark = corpus.sparkSession
    words = corpus.select(
        _words(normalize_text(F.col(text_col))).alias("ws"))

    # the unigram count table feeds two actions (vocab top-K + the total
    # count): persist so the corpus explode+groupBy runs once
    uni = track_cache(
        (words.select(F.explode("ws").alias("w"))
         .groupBy("w").agg(F.count("*").alias("n"))).persist())
    vocab = (uni.where(F.col("n") >= min_count)
             .orderBy(F.desc("n"), F.asc("w")).limit(vocab_size)
             .select("w", "n"))
    track_cache(vocab.persist())
    v_rows = vocab.collect()  # bounded: ≤ vocab_size
    v_words = {r["w"]: r["n"] for r in v_rows}
    n_total = uni.agg(F.sum("n")).collect()[0][0] or 0
    n_in = sum(v_words.values())
    n_cells = len(v_words) + 1  # + <unk>
    denom = n_total + smooth * n_cells

    import math

    uni_rows = [(w, math.log((c + smooth) / denom))
                for w, c in v_words.items()]
    uni_rows.append((UNK, math.log((n_total - n_in + smooth) / denom)))
    unigrams = spark.createDataFrame(uni_rows, "w string, logp1 double")

    # vocab-mapped consecutive pairs via posexplode over the first n-1
    # positions; OOV words map to <unk> through a broadcast vocab join
    pairs = (words
             .where(F.size("ws") >= 2)
             .select(F.posexplode(F.slice("ws", 1, F.size("ws") - 1))
                     .alias("i", "prev"),
                     F.col("ws"))
             .select(F.col("prev"),
                     F.col("ws")[F.col("i") + 1].alias("w")))
    vb = F.broadcast(vocab.select("w").withColumnRenamed("w", "vw"))
    pairs = (pairs
             .join(vb, pairs["prev"] == F.col("vw"), "left")
             .select(F.coalesce("vw", F.lit(UNK)).alias("prev"), "w")
             .join(vb, F.col("w") == F.col("vw"), "left")
             .select("prev", F.coalesce("vw", F.lit(UNK)).alias("w")))
    big = pairs.groupBy("prev", "w").agg(F.count("*").alias("n"))
    # consumed by both ctx (pre-prune totals) and kept (top-K); tracked
    # so feathr_spark.release_caches() frees it once the model tables
    # have been materialized by the caller
    track_cache(big.persist())
    # context totals BEFORE pruning: ctx(prev) = sum_w c2(prev, w)
    ctx = big.groupBy("prev").agg(F.sum("n").alias("ctx"))
    kept = (big.orderBy(F.desc("n"), F.asc("prev"), F.asc("w"))
            .limit(max_bigrams))
    bigrams = (kept.join(F.broadcast(ctx), "prev")
               .select("prev", "w",
                       F.log(F.col("n") / F.col("ctx")).alias("logp2")))
    return NgramLM(unigrams=unigrams, bigrams=bigrams, alpha=alpha)


def perplexity_scores(
    docs: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "broadcast",
) -> DataFrame:
    """``docs`` + ``lm_logprob`` (total log-probability) + ``lm_n``
    (scored word count) + ``perplexity`` columns. Empty docs get nulls.
    """
    import math

    if strategy == "broadcast":
        import numpy as np

        uni = lm.unigrams.collect()          # bounded: V+1
        big = lm.bigrams.collect()           # bounded: ≤ max_bigrams
        ids = {r["w"]: i for i, r in enumerate(uni)}
        unk_id = ids[UNK]
        logp1 = np.array([r["logp1"] for r in uni], dtype="float64")
        width = len(uni)
        keys = np.array(
            sorted(ids[r["prev"]] * width + ids[r["w"]] for r in big),
            dtype="int64")
        vals_by_key = {ids[r["prev"]] * width + ids[r["w"]]: r["logp2"]
                       for r in big}
        vals = np.array([vals_by_key[k] for k in keys], dtype="float64")
        log_alpha = math.log(lm.alpha)
        bc = docs.sparkSession.sparkContext.broadcast(
            (ids, unk_id, logp1, keys, vals, log_alpha))

        base = docs.withColumn(
            "__words", _words(normalize_text(F.col(text_col))))
        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}"
             for f in base.schema.fields if f.name != "__words"]
            + ["`lm_logprob` double", "`lm_n` bigint",
               "`perplexity` double"])

        import pandas as pd

        def _score(batches):
            idmap, unk, l1, ks, vs, la = bc.value
            for pdf in batches:
                wlists = pdf["__words"]
                lens = wlists.map(len).to_numpy(dtype="int64")
                logprob = np.full(len(pdf), np.nan)
                if lens.sum():
                    flat = pd.Series(np.concatenate(wlists.to_numpy()))
                    wid = (flat.map(idmap).fillna(unk)
                           .to_numpy(dtype="int64"))
                    seg = np.repeat(np.arange(len(pdf)), lens)
                    # per-token log-prob: first word of each doc scores
                    # unigram; later words score bigram-or-backoff
                    tok_lp = np.empty(len(wid), dtype="float64")
                    starts = np.zeros(len(wid), dtype=bool)
                    # doc boundaries; zero-length trailing docs put a
                    # cumsum cut AT len(wid) — clip those out
                    cuts = np.cumsum(lens)[:-1]
                    starts[cuts[cuts < len(wid)]] = True
                    starts[0] = True
                    tok_lp[starts] = l1[wid[starts]]
                    rest = ~starts
                    if rest.any():
                        prev = np.empty(len(wid), dtype="int64")
                        prev[1:] = wid[:-1]
                        prev[0] = 0
                        pk = prev[rest] * len(l1) + wid[rest]
                        pos = np.searchsorted(ks, pk)
                        pos_c = np.minimum(pos, len(ks) - 1) if len(ks) \
                            else np.zeros(len(pk), dtype="int64")
                        hit = (len(ks) > 0) & (ks[pos_c] == pk) \
                            if len(ks) else np.zeros(len(pk), dtype=bool)
                        lp = la + l1[wid[rest]]
                        if len(ks):
                            lp = np.where(hit, vs[pos_c], lp)
                        tok_lp[rest] = lp
                    sums = np.bincount(seg, weights=tok_lp,
                                       minlength=len(pdf))
                    logprob = np.where(lens > 0, sums, np.nan)
                res = pdf.drop(columns=["__words"])
                # empty docs carry NaN here; Float64 (nullable ext
                # dtype) maps NaN -> NA -> a true Spark NULL, matching
                # the join strategy and the SQL oracle (float64 NaN
                # would survive Arrow as NaN, which Spark treats as a
                # sortable non-null value)
                res["lm_logprob"] = pd.Series(logprob).astype("Float64")
                res["lm_n"] = lens
                with np.errstate(invalid="ignore"):
                    ppl = np.where(
                        lens > 0, np.exp(-logprob / np.maximum(lens, 1)),
                        np.nan)
                res["perplexity"] = pd.Series(ppl).astype("Float64")
                yield res

        return base.mapInPandas(_score, schema=out_schema)

    if strategy == "join":
        vb = F.broadcast(
            lm.unigrams.select(F.col("w").alias("vw"), "logp1"))
        # token stream with position; map OOV to <unk> via the unigram
        # table itself (it contains exactly vocab + <unk>)
        toks = (docs
                .select(F.col(id_col),
                        F.posexplode_outer(
                            _words(normalize_text(F.col(text_col))))
                        .alias("pos", "w")))
        toks = (toks.join(vb, toks["w"] == F.col("vw"), "left")
                .select(id_col, "pos",
                        F.when(F.col("w").isNull(), F.lit(None))
                         .when(F.col("vw").isNull(), F.lit(UNK))
                         .otherwise(F.col("vw")).alias("w"),
                        F.coalesce(
                            "logp1",
                            F.when(F.col("w").isNotNull(),
                                   _unk_logp1(lm))).alias("logp1")))
        from pyspark.sql import Window

        wspec = (Window.partitionBy(id_col).orderBy("pos"))
        seq = toks.withColumn("prev", F.lag("w").over(wspec))
        bb = F.broadcast(lm.bigrams)
        scored = (seq.join(bb, ["prev", "w"], "left")
                  .withColumn(
                      "tok_lp",
                      F.when(F.col("w").isNull(), F.lit(None))
                       .when(F.col("prev").isNull(), F.col("logp1"))
                       .otherwise(F.coalesce(
                           "logp2",
                           F.lit(float(__import__("math").log(lm.alpha)))
                           + F.col("logp1"))))
                  .groupBy(id_col)
                  .agg(F.sum("tok_lp").alias("lm_logprob"),
                       F.count("tok_lp").alias("lm_n")))
        scored = scored.select(
            id_col, "lm_logprob", "lm_n",
            F.when(F.col("lm_n") > 0,
                   F.exp(-F.col("lm_logprob") / F.col("lm_n")))
             .alias("perplexity"))
        return docs.join(scored, id_col, "left")

    raise ValueError(f"unknown strategy {strategy!r}")


def _unk_logp1(lm: NgramLM):
    """<unk> unigram log-prob as a literal (bounded one-row lookup)."""
    v = lm.unigrams.where(F.col("w") == UNK).collect()[0]["logp1"]
    return F.lit(float(v))


def perplexity_buckets(
    scored: DataFrame,
    by: str = "source",
    ppl_col: str = "perplexity",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by perplexity
    WITHIN each ``by`` group (language in CCNet; source here) and cut
    into ``n_buckets`` equal-count tiles — bucket 1 = lowest perplexity
    (most target-like). Deterministic tie-break by ``id_col``.

    Scale shape: one exchange on ``by`` + per-group sort; groups are
    languages/sources (bounded cardinality, may be huge per group) —
    at extreme scale swap ntile for a two-pass approx-percentile cut,
    same output contract.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(by)
         .orderBy(F.asc(ppl_col), F.asc(id_col)))
    return (scored.where(F.col(ppl_col).isNotNull())
            .withColumn("ppl_bucket",
                        F.ntile(n_buckets).over(w).cast("int")))
