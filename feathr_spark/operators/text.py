"""Text-analysis operators for training-data pipelines over a
``documents(doc_id, text, ...)`` table.

Everything here is built from JVM-side ``pyspark.sql.functions``
expressions (regex / array higher-order functions) — no Python in the
hot path, so each operator whole-stage-codegens and scales linearly
with executors.

Operators: token counting (whitespace + BPE-ish regex), language ID
(stopword n-gram heuristic), quality scoring (length / punctuation /
stopword / repetition ratios), document fingerprinting (normalization
hash + rolling shingle hashes).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer family's shape, expressible as one regex)
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "are"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "por", "con", "para"],
}


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def token_count(text: Column | str, mode: str = "whitespace") -> Column:
    """Token count column: 'whitespace' split or 'bpe' regex pieces."""
    c = F.col(text) if isinstance(text, str) else text
    if mode == "whitespace":
        return F.size(_words(c)).cast("long")
    if mode == "bpe":
        return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0))).cast("long")
    raise ValueError("mode must be whitespace|bpe")


def language_scores(text: Column | str) -> Column:
    """map<lang,double>: stopword-hit ratio per candidate language."""
    c = F.col(text) if isinstance(text, str) else text
    words = _words(c)
    n = F.greatest(F.size(words), F.lit(1))
    entries = [
        F.struct(
            F.lit(lang).alias("key"),
            (F.size(F.filter(words, lambda w: w.isin(sw))) / n).alias("value"),
        )
        for lang, sw in STOPWORDS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def detect_language(text: Column | str, min_score: float = 0.01) -> Column:
    """Best-scoring language code, or 'und' when nothing clears min_score."""
    scores = language_scores(text)
    arr = F.map_entries(scores)
    best = F.array_max(F.transform(arr, lambda e: F.struct(e["value"].alias("v"),
                                                           e["key"].alias("k"))))
    return F.when(best["v"] >= min_score, best["k"]).otherwise(F.lit("und"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-heuristic columns (C4/Gopher-style cheap filters):
    n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio,
    digit_ratio, uniq_word_ratio, max_word_repeat_ratio."""
    c = F.col(text) if isinstance(text, str) else text
    words = _words(c)
    n_chars = F.length(c)
    n_words = F.size(words)
    n_words1 = F.greatest(n_words, F.lit(1))
    n_chars1 = F.greatest(n_chars, F.lit(1))
    en_sw = STOPWORDS["en"]
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": (
            F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words1
        ).cast("double"),
        "punct_ratio": (
            F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
        ).cast("double") / n_chars1,
        "digit_ratio": (
            F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
        ).cast("double") / n_chars1,
        "stopword_ratio": (F.size(F.filter(words, lambda w: w.isin(en_sw)))
                           / n_words1).cast("double"),
        "uniq_word_ratio": (F.size(F.array_distinct(words)) / n_words1).cast("double"),
    }


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for name, col in quality_features(text_col).items():
        if name in df.columns:
            name = f"q_{name}"
        out = out.withColumn(name, col)
    return out


def quality_score(text: Column | str) -> Column:
    """Scalar [0,1] quality score combining the heuristics (monotone,
    deterministic; tune weights downstream)."""
    q = quality_features(text)
    len_ok = F.least(q["n_words"].cast("double") / 50.0, F.lit(1.0))
    return (
        0.3 * len_ok
        + 0.25 * F.least(q["stopword_ratio"] * 5, F.lit(1.0))
        + 0.25 * q["uniq_word_ratio"]
        + 0.2 * (1 - F.least(q["punct_ratio"] * 4, F.lit(1.0)))
    ).cast("double")


def normalize_text(text: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace,
    strip punctuation."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """64-bit content fingerprint of the normalized text."""
    return F.xxhash64(normalize_text(text))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (rolling window over words).

    Built by zip_with-ing the word array against its own shifted slices:
    higher-order-function *arguments* are evaluated once per row, while
    expressions referenced inside a lambda body are re-evaluated per
    element — an indexed ``transform(sequence(...), i -> slice(words, i, n))``
    form re-runs the normalize+split pipeline per shingle, O(words^2)/doc.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = _words(normalize_text(c))
    out = words
    for k in range(1, n):
        # slice beyond the end yields a shorter array; zip_with pads the
        # tail with nulls, which mark incomplete shingles for removal
        shifted = F.slice(words, k + 1, F.greatest(F.size(words) - k, F.lit(0)))
        out = F.zip_with(
            out, shifted,
            lambda x, y: F.when(x.isNotNull() & y.isNotNull(),
                                F.concat(x, F.lit(" "), y)),
        )
    return F.filter(out, lambda s: s.isNotNull())


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Rolling-hash fingerprint set: distinct xxhash64 of each shingle
    (winnowing-style document fingerprinting)."""
    return F.array_distinct(F.transform(shingles(text, n), lambda s: F.xxhash64(s)))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1 —
    the standard corpus-filtering heuristics beyond the reference's
    surface): per document,

    - ``dup_line_frac``: 1 - distinct/total over non-blank lines
      (boilerplate/template pages repeat lines) — pure JVM array ops;
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      / total bigrams (degenerate generated text repeats one phrase) —
      explode -> two map-side-combined groupBys on (doc, bigram), no
      per-row Python.

    Documents with no lines / fewer than 2 words get 0.0.
    """
    lines = F.filter(F.split(F.col(text_col), "\n"),
                     lambda ln: F.trim(ln) != "")
    dup_line = F.when(
        F.size(lines) > 0,
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines).cast("double"),
    ).otherwise(F.lit(0.0))
    base = df.withColumn("dup_line_frac", dup_line)

    w = _words(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = base.select(F.col(id_col).alias("__rid"),
                     F.explode_outer(bigrams).alias("__bg"))
    per = (
        bg.groupBy("__rid", "__bg").count()
        .groupBy("__rid")
        .agg((F.max(F.when(F.col("__bg").isNotNull(), F.col("count")))
              / F.sum(F.when(F.col("__bg").isNotNull(), F.col("count"))))
             .alias("top_bigram_frac"))
    )
    out = base.join(per, base[id_col] == per["__rid"], "left").drop("__rid")
    return out.withColumn("top_bigram_frac",
                          F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)))


def ngram_counts(df: DataFrame, text_col: str = "text", n: int = 2,
                 min_count: int = 1) -> DataFrame:
    """Corpus-wide word n-gram frequency table: (ngram, n) over the
    normalized text — the statistic behind n-gram LM filtering,
    contamination screens, and boilerplate mining.

    explode → groupBy(count): partial aggregation (map-side combine)
    means each executor ships one row per distinct local n-gram, not
    one per occurrence — at 100 TB the shuffle is bounded by vocabulary
    x executors, not corpus size. ``min_count`` prunes the heavy-tailed
    singleton mass AFTER aggregation (it cannot be pushed below the
    groupBy, but the combine already did the heavy lifting)."""
    grams = df.select(F.explode(shingles(text_col, n)).alias("ngram"))
    out = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
    return out.where(F.col("n") >= min_count) if min_count > 1 else out


def url_features(url: Column | str) -> dict[str, Column]:
    """Structural URL features for web-corpus curation: protocol, host,
    registered-domain approximation (last two host labels), path depth,
    query-parameter count. Pure ``F.parse_url``/regex JVM expressions —
    codegen, no shuffle; group by ``domain`` for per-site caps
    (:func:`~feathr_spark.operators.corpus.cap_per_group`) or dedup.
    """
    c = F.col(url) if isinstance(url, str) else url
    host = F.parse_url(c, F.lit("HOST"))
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit(""))
    query = F.parse_url(c, F.lit("QUERY"))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    domain = F.when(n >= 2, F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1))).otherwise(host)
    return {
        "protocol": F.parse_url(c, F.lit("PROTOCOL")),
        "host": host,
        "domain": domain,
        "path_depth": F.size(F.filter(F.split(path, "/"),
                                      lambda s: s != "")).cast("long"),
        "n_query_params": F.when(query.isNull(), F.lit(0)).otherwise(
            F.size(F.split(query, "&"))).cast("long"),
    }


def with_url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    cols = url_features(url_col)
    return df.select("*", *[v.alias(k) for k, v in cols.items()])


# ---------------------------------------------------------------------------
# vocabulary tokenizer: raw documents -> the pre-tokenized corpus shape
# ---------------------------------------------------------------------------

def build_vocabulary(
    df: DataFrame,
    text_col: str = "text",
    max_size: int = 32768,
    min_count: int = 1,
) -> DataFrame:
    """Word-level vocabulary ``(token string, token_id int)`` over the
    corpus: ``token_id`` 1..N dense by (count DESC, token ASC); 0 is
    reserved for OOV. This is the "train a tokenizer vocab" step of a
    training-data pipeline, word-granular (the engine's BPE_REGEX
    pre-tokenizer is the piece-granular alternative).

    Scale shape: one vocabulary-bounded count aggregate (map-side
    partial combine — the same shuffle as :func:`ngram_frequencies`),
    then a distributed top-K (``TakeOrderedAndProject``: each partition
    keeps its own max_size prefix, only prefixes reach the driver-side
    merge) and a row_number over the ≤max_size survivors — never a
    global sort of the full distinct-word set.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(_words(normalize_text(F.col(text_col))))
                  .alias("token"))
        .groupBy("token").count()
        .where(F.col("count") >= min_count)
    )
    order = [F.desc("count"), F.asc("token")]
    top = counts.orderBy(*order).limit(max_size)
    w = Window.orderBy(*order)  # ≤ max_size rows: single task, bounded
    return top.select(
        "token", F.row_number().over(w).cast("int").alias("token_id"))


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = ("source",),
    oov_id: int = 0,
) -> DataFrame:
    """Encode raw documents into the pre-tokenized corpus shape
    ``(id_col, *keep_cols, tokens array<int>, n_tok int)`` — the
    engine's north-star input table, built from raw text by the engine
    itself.

    Normalization + word split happen JVM-side (identical regex
    semantics to every other text operator); the word->id map is the
    vocabulary broadcast as a plain dict (bounded by
    ``build_vocabulary(max_size=...)``) applied in one vectorized Arrow
    ``mapInPandas`` pass — flatten words, one ``Series.map``, re-split
    by per-row lengths. Row-local: ZERO shuffle (the explode + join +
    re-assemble alternative shuffles every token of the corpus; this
    touches each row once where it sits).
    """
    import numpy as np
    import pandas as pd

    mapping = {r["token"]: r["token_id"] for r in vocab.collect()}
    bc = df.sparkSession.sparkContext.broadcast(mapping)
    keeps = [c for c in keep_cols if c in df.columns]
    base = df.select(
        F.col(id_col), *[F.col(c) for c in keeps],
        _words(normalize_text(F.col(text_col))).alias("__words"))

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in base.schema.fields if f.name != "__words"]
        + ["tokens array<int>", "n_tok int"])

    def _encode(batches):
        v = bc.value
        for pdf in batches:
            words = pdf["__words"]
            lens = words.map(len).to_numpy(dtype="int64")
            if lens.sum():
                flat = pd.Series(np.concatenate(words.to_numpy()))
                ids = flat.map(v).fillna(oov_id).astype("int32").to_numpy()
            else:
                ids = np.empty(0, dtype="int32")
            cuts = np.cumsum(lens)[:-1]
            res = pdf.drop(columns=["__words"])
            res["tokens"] = [a.tolist() for a in np.split(ids, cuts)]
            res["n_tok"] = lens.astype("int32")
            yield res

    return base.mapInPandas(_encode, schema=out_schema)


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 filter
# thresholds). The canonical pretraining document filter bundle —
# complements quality_features (ratios) with the published PASS/FAIL
# rules. Reference analogue: row-level filter transforms ahead of
# anchors (feathr-impl offline/anchored/anchorExtractor/*.scala).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    words: Column | None = None,
    lines: Column | None = None,
) -> dict[str, Column]:
    """Boolean Gopher-rule columns plus the conjunction ``gopher_pass``.

    Every rule is a pure JVM expression (split / filter / size /
    regexp counts — whole-stage codegen, zero shuffle, zero Python):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` and ellipsis), bullet-start / ellipsis-end line fractions,
    alphabetic-word fraction, and distinct-stopword hits. Raw-case
    whitespace words (the paper filters raw documents; only the
    stopword probe lowercases).

    Pass pre-staged ``words``/``lines`` array columns to avoid
    re-splitting the text per rule — Catalyst won't inline a
    multiply-referenced non-cheap projection, and higher-order
    functions sit outside codegen subexpression elimination, so
    :func:`with_gopher_rules` stages them once (measured ~1.4x on the
    battery corpus).
    """
    c = F.col(text) if isinstance(text, str) else text
    if words is None:
        words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    if lines is None:
        lines = F.split(c, r"\n")
    n_words = F.size(words)
    n_words1 = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = (F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
               / n_words1)
    # occurrences of '#' plus ellipsis ('...' or '…'); count by length
    # delta so overlapping regex semantics can't diverge across engines
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ell = ((F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", "xx")))
             + (F.length(c) - F.length(F.regexp_replace(c, "…", ""))))
    n_lines1 = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (F.size(F.filter(
        lines, lambda l: l.rlike(r"^\s*[-*•]"))) / n_lines1)
    ellipsis_frac = (F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines1)
    alpha_frac = (F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
                  / n_words1)
    lwords = F.transform(words, F.lower)
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.array_contains(lwords, s)))
    flags = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wl >= min_mean_word_len)
                           & (mean_wl <= max_mean_word_len),
        "r_symbol_ratio": ((n_hash + n_ell) / n_words1) <= max_symbol_word_ratio,
        "r_bullet_lines": bullet_frac <= max_bullet_line_frac,
        "r_ellipsis_lines": ellipsis_frac <= max_ellipsis_line_frac,
        "r_alpha_words": alpha_frac >= min_alpha_word_frac,
        "r_stopwords": stop_hits >= min_stopword_hits,
    }
    gate = F.lit(True)
    for col in flags.values():
        gate = gate & col
    flags["gopher_pass"] = gate
    return flags


def with_gopher_rules(df: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    # stage the split arrays in their own projection: they feed many
    # rules, so CollapseProject keeps them computed ONCE per row
    staged = df.withColumn(
        "__gr_ws", F.filter(F.split(F.col(text_col), r"\s+"),
                            lambda w: w != "")) \
        .withColumn("__gr_ls", F.split(F.col(text_col), r"\n"))
    out = staged
    for name, col in gopher_rules(text_col, words=F.col("__gr_ws"),
                                  lines=F.col("__gr_ls"),
                                  **thresholds).items():
        out = out.withColumn(name, col)
    return out.drop("__gr_ws", "__gr_ls")


def c4_rules(
    text: Column | str,
    min_line_words: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = (),
    clean: Column | None = None,
) -> dict[str, Column]:
    """C4 cleaning bundle (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning...", section 2.2) as pure JVM expressions — the
    other canonical pretraining filter set next to
    :func:`gopher_rules`.

    Line step (produces ``c4_clean_text``): keep only lines that end in
    terminal punctuation (``. ! ? "``), contain at least
    ``min_line_words`` words, and do not mention "javascript"
    (case-insensitive) — the boilerplate cookie/JS-warning killer.

    Document flags over the CLEANED text: ``r_min_sentences`` (at least
    ``min_sentences`` terminal-punctuation marks survive),
    ``r_no_lorem`` (no "lorem ipsum"), ``r_no_brace`` (no ``{`` — code,
    not prose), ``r_blocklist`` (none of the caller-supplied lowercase
    blocklist words appear; empty default — supply your own list), and
    the conjunction ``c4_pass``.

    Zero shuffle, whole-stage codegen; ~one Project node
    (split / filter / array_join / rlike). Deterministic sentence
    proxy: count of ``. ! ?`` characters in the cleaned text (C4's
    reference implementation splits on heuristic sentence boundaries;
    the terminal-punct count is the engine-portable form and is
    documented as such).

    Pass a pre-staged ``clean`` column to avoid recomputing the line
    filter per flag (see :func:`with_c4_rules`, which stages it once —
    same rationale as :func:`gopher_rules`).
    """
    if clean is None:
        c = F.col(text) if isinstance(text, str) else text
        lines = F.split(c, r"\n")
        kept = F.filter(
            lines,
            lambda l: l.rlike(r'[.!?"]\s*$')
            & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
               >= min_line_words)
            & ~F.lower(l).contains("javascript"),
        )
        clean = F.array_join(kept, "\n")
    n_sent = F.length(clean) - F.length(F.regexp_replace(clean, r"[.!?]", ""))
    lclean = F.lower(clean)
    flags: dict[str, Column] = {
        "c4_clean_text": clean,
        "r_min_sentences": n_sent >= min_sentences,
        "r_no_lorem": ~lclean.contains("lorem ipsum"),
        "r_no_brace": ~clean.contains("{"),
    }
    block_ok = F.lit(True)
    for wd in blocklist:
        block_ok = block_ok & ~lclean.rlike(
            r"(^|\s)" + re.escape(wd.lower()) + r"($|\s)")
    flags["r_blocklist"] = block_ok
    gate = F.lit(True)
    for name, colx in flags.items():
        if name != "c4_clean_text":
            gate = gate & colx
    flags["c4_pass"] = gate
    return flags


def with_c4_rules(df: DataFrame, text_col: str = "text",
                  min_line_words: int = 5, **kw) -> DataFrame:
    # stage the cleaned text in its own projection so the line filter
    # runs once per row, not once per flag (CollapseProject keeps a
    # multiply-referenced non-cheap expression in its own Project)
    kept = F.filter(
        F.split(F.col(text_col), r"\n"),
        lambda l: l.rlike(r'[.!?"]\s*$')
        & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
           >= min_line_words)
        & ~F.lower(l).contains("javascript"),
    )
    staged = df.withColumn("__c4_clean", F.array_join(kept, "\n"))
    out = staged
    for name, colx in c4_rules(text_col, min_line_words=min_line_words,
                               clean=F.col("__c4_clean"), **kw).items():
        out = out.withColumn(name, colx)
    return out.drop("__c4_clean")


def doc_frequency(
    df: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
    max_terms: int = 1 << 20,
) -> DataFrame:
    """Per-term document frequency ``(term, df)`` over normalized
    words. One vocabulary-bounded shuffle (distinct words per doc are
    exploded, then a map-side-combined count); ``max_terms`` caps the
    table via a distributed top-K by (df DESC, term ASC) — never a
    global sort of the distinct-term set."""
    counts = (
        df.select(F.explode(F.array_distinct(
            _words(normalize_text(F.col(text_col))))).alias("term"))
        .groupBy("term").agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
    )
    return counts.orderBy(F.desc("df"), F.asc("term")).limit(max_terms)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
    max_terms: int = 1 << 20,
    idf_df: Optional[DataFrame] = None,
    idf_n_docs: Optional[int] = None,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document, exploded as
    ``(id, term, score, rank)``. ``score = count(term in doc) *
    (ln((N+1)/(df+1)) + 1)`` (the sklearn smooth-idf form); rank is
    dense by (score DESC, term ASC).

    Scale shape: the idf table is vocabulary-bounded (ONE shuffle,
    :func:`doc_frequency`) and broadcast as a dict; per-doc term
    counts, scoring, and the top-k cut all happen INSIDE one vectorized
    Arrow pass over the corpus — zero corpus-side shuffle (a
    groupBy(doc, term) + Window alternative shuffles every token
    twice). Pass a precomputed ``idf_df`` ``(term, df)`` to reuse
    corpus statistics across datasets (train idf once, score many)."""
    import math

    import numpy as np
    import pandas as pd

    n_docs = df.count()
    freq = idf_df if idf_df is not None else doc_frequency(
        df, text_col, min_df=min_df, max_terms=max_terms)
    idf = {r["term"]: math.log((n_docs + 1.0) / (r["df"] + 1.0)) + 1.0
           for r in freq.collect()}
    bc = df.sparkSession.sparkContext.broadcast(idf)

    base = df.select(
        F.col(id_col).alias("__id"),
        _words(normalize_text(F.col(text_col))).alias("__words"))
    id_type = base.schema["__id"].dataType.simpleString()
    out_schema = (f"`{id_col}` {id_type}, term string, "
                  "score double, rank int")

    def _topk(batches):
        v = bc.value
        for pdf in batches:
            words = pdf["__words"]
            lens = words.map(len).to_numpy(dtype="int64")
            if lens.sum() == 0:
                continue
            flat = pd.DataFrame({
                "r": np.repeat(np.arange(len(pdf), dtype="int64"), lens),
                "term": np.concatenate(words.to_numpy()),
            })
            cnt = (flat.groupby(["r", "term"], sort=False)
                   .size().reset_index(name="c"))
            cnt["idf"] = cnt["term"].map(v)
            cnt = cnt.dropna(subset=["idf"])
            if len(cnt) == 0:
                continue
            cnt["score"] = cnt["c"] * cnt["idf"]
            cnt = cnt.sort_values(
                ["r", "score", "term"], ascending=[True, False, True],
                kind="mergesort")
            cnt["rank"] = cnt.groupby("r").cumcount() + 1
            top = cnt[cnt["rank"] <= k]
            yield pd.DataFrame({
                id_col: pdf["__id"].to_numpy()[top["r"].to_numpy()],
                "term": top["term"].to_numpy(),
                "score": top["score"].to_numpy(),
                "rank": top["rank"].to_numpy().astype("int32"),
            })

    return base.mapInPandas(_topk, schema=out_schema)
