"""Distributed text-quality classification: logistic regression over
bag-of-token features — the published pretraining quality-filter recipe
(Brown et al. 2020, "Language Models are Few-Shot Learners", Appendix A:
a logistic-regression classifier separating curated reference text from
raw web text scores every candidate document; Wenzek et al. 2020 CCNet
and Joulin et al. 2016 fastText use the same linear-over-bag-of-features
shape). The reference engine has no classifier — this is part of the
training-data-pipeline surface (SURVEY "beyond the reference" ops).

Scale shape (the 100 TB plan):

- **Featurize**: documents become sparse ``(idxs, vals)`` bag-of-token
  vectors in ONE vectorized Arrow pass — flatten all token arrays in
  the batch, one ``np.unique`` over ``row * F + idx`` composite keys,
  re-split by row. Zero shuffle; the corpus is touched where it sits.
  Features are token ids from the engine's own vocabulary
  (:func:`feathr_spark.operators.text.build_vocabulary` /
  ``encode_tokens`` — the pre-tokenized north-star shape is consumed
  directly), or hashed words (``hashed_text_features``, xxhash64
  JVM-side) when the vocabulary is unbounded.
- **Train** (full-batch gradient descent): per round, each Arrow batch
  emits only the NONZERO partial-gradient cells ``(j, g)``; partials
  reduce with a map-side-combined ``groupBy(j).sum`` — one exchange of
  at most ``F x partitions`` skinny rows per round (metadata-sized at
  any corpus scale) — and only ≤``F + 1`` reduced rows reach the
  driver, which applies the update and re-broadcasts. The featurized
  frame is persisted once and scanned once per round.
- **Score**: broadcast weights, one zero-shuffle Arrow pass emitting
  the margin (and optionally the sigmoid probability).

Determinism (the oracle contract): ``quantize_decimals`` rounds the
updated weight vector after every round onto a decimal grid, so the
~1e-14 summation-order slack between numpy partial sums and a SQL
engine's aggregate cannot drift the trajectory — the same device as
``clustering.fit_kmeans``. Margins are computed with ascending-index
accumulation (``np.unique`` emits sorted keys; ``np.bincount`` adds in
flat order), so a SQL replay that sums ``val * w[idx]`` in ascending
``idx`` order reproduces the exact IEEE double.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feathr_spark.operators.text import _words, normalize_text


def _batch_sparse_counts(
    tokens: pd.Series, n_features: int, fold: bool, normalize: bool,
) -> tuple[list[list[int]], list[list[float]]]:
    """Vectorized per-row bag-of-token counts: one np.unique over
    ``row * n_features + idx`` composite keys for the whole batch."""
    lens = tokens.map(len).to_numpy(dtype="int64")
    n = len(lens)
    if lens.sum() == 0:
        return [[] for _ in range(n)], [[] for _ in range(n)]
    flat = np.concatenate([np.asarray(t, dtype="int64") for t in tokens])
    if fold:
        flat = np.mod(flat, n_features)
    elif flat.size and (flat.min() < 0 or flat.max() >= n_features):
        raise ValueError(
            f"token id out of range [0, {n_features}); pass fold=True "
            "or raise n_features")
    rows = np.repeat(np.arange(n, dtype="int64"), lens)
    keys, cnt = np.unique(rows * n_features + flat, return_counts=True)
    urow = (keys // n_features).astype("int64")
    uidx = (keys % n_features).astype("int32")
    vals = cnt.astype("float64")
    if normalize:
        vals = vals / lens[urow]
    cuts = np.searchsorted(urow, np.arange(1, n))
    return ([a.tolist() for a in np.split(uidx, cuts)],
            [a.tolist() for a in np.split(vals, cuts)])


def featurize_tokens(
    df: DataFrame,
    n_features: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    label_col: Optional[str] = None,
    keep_cols: Sequence[str] = (),
    normalize: bool = True,
    fold: bool = False,
) -> DataFrame:
    """Pre-tokenized corpus rows ``(id, tokens array<int>, ...)`` →
    sparse feature rows ``(id, *keep_cols[, y], idxs array<int>,
    vals array<double>)``. ``vals`` are raw counts, or term frequencies
    (count / row token total) when ``normalize``. ``fold=True`` maps
    ids into ``[0, n_features)`` by modulo (hashing-trick fold) instead
    of requiring them in range. Zero shuffle."""
    keeps = [c for c in keep_cols if c in df.columns]
    cols = [F.col(id_col), *[F.col(c) for c in keeps]]
    if label_col is not None:
        cols.append(F.col(label_col).cast("double").alias("y"))
    base = df.select(*cols, F.col(tokens_col).alias("__toks"))
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in base.schema.fields if f.name != "__toks"]
        + ["idxs array<int>", "vals array<double>"])

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idxs, vals = _batch_sparse_counts(
                pdf["__toks"], n_features, fold, normalize)
            res = pdf.drop(columns=["__toks"])
            res["idxs"] = idxs
            res["vals"] = vals
            yield res

    return base.mapInPandas(_featurize, schema=out_schema)


def hashed_text_features(
    df: DataFrame,
    buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: Optional[str] = None,
    keep_cols: Sequence[str] = (),
    normalize: bool = True,
) -> DataFrame:
    """Raw-text variant of :func:`featurize_tokens`: words hash into
    ``buckets`` cells JVM-side (xxhash64 — the hashing trick for
    unbounded vocabularies), then the same Arrow count kernel. Use when
    no bounded vocabulary exists; not SQL-replayable (xxhash64 cells),
    so correctness evidence is the vocab path + property tests."""
    hashed = df.withColumn(
        "__htoks",
        F.transform(_words(normalize_text(F.col(text_col))),
                    lambda w: F.pmod(F.xxhash64(w), F.lit(buckets))
                    .cast("int")))
    return featurize_tokens(
        hashed, buckets, tokens_col="__htoks", id_col=id_col,
        label_col=label_col, keep_cols=keep_cols, normalize=normalize)


def train_logreg(
    features: DataFrame,
    n_features: int,
    rounds: int = 8,
    lr: float = 1.0,
    l2: float = 0.0,
    idxs_col: str = "idxs",
    vals_col: str = "vals",
    label_col: str = "y",
    quantize_decimals: Optional[int] = None,
) -> np.ndarray:
    """Full-batch gradient-descent logistic regression over sparse
    feature rows. Returns the ``(n_features + 1,)`` float64 weight
    vector, bias last. Per round: ONE scan of the (persisted) feature
    frame emitting nonzero partial-gradient cells, ONE bounded
    ``groupBy(j).sum`` exchange, ≤ ``n_features + 1`` rows collected.

    Update: ``w += lr * (grad / N - l2 * w)`` with
    ``grad_j = Σ_docs x_j (y - sigmoid(w·x + b))``; the updated vector
    is rounded to ``quantize_decimals`` when set (see module docstring).
    """
    spark = features.sparkSession
    data = features.select(
        F.col(idxs_col).alias("idxs"), F.col(vals_col).alias("vals"),
        F.col(label_col).cast("double").alias("y"))
    n_rows = data.count()
    if n_rows == 0:
        raise ValueError("empty training frame")
    w = np.zeros(n_features + 1, dtype=np.float64)

    for _ in range(rounds):
        bc = spark.sparkContext.broadcast(w)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv = bc.value
            bias = wv[n_features]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                lens = pdf["idxs"].map(len).to_numpy(dtype="int64")
                rows = np.repeat(np.arange(len(pdf), dtype="int64"), lens)
                idx = (np.concatenate(
                    [np.asarray(a, dtype="int64") for a in pdf["idxs"]])
                    if lens.sum() else np.empty(0, dtype="int64"))
                val = (np.concatenate(
                    [np.asarray(a, dtype="float64") for a in pdf["vals"]])
                    if lens.sum() else np.empty(0, dtype="float64"))
                y = pdf["y"].to_numpy(dtype="float64")
                z = bias + np.bincount(rows, weights=val * wv[idx],
                                       minlength=len(pdf))
                resid = y - 1.0 / (1.0 + np.exp(-z))
                g = np.zeros(n_features + 1, dtype=np.float64)
                np.add.at(g, idx, val * resid[rows])
                g[n_features] = resid.sum()
                nz = np.nonzero(g)[0]
                yield pd.DataFrame({"j": nz.astype("int32"), "g": g[nz]})

        agg = (data.mapInPandas(partials, schema="j int, g double")
               .groupBy("j").agg(F.sum("g").alias("g")).collect())
        grad = np.zeros(n_features + 1, dtype=np.float64)
        for r in agg:
            grad[r["j"]] = r["g"]
        w = w + lr * (grad / n_rows - l2 * w)
        if quantize_decimals is not None:
            w = np.round(w, quantize_decimals)
        bc.destroy()
    return w


def score_logreg(
    df: DataFrame,
    weights: np.ndarray,
    idxs_col: str = "idxs",
    vals_col: str = "vals",
    margin_col: str = "margin",
    prob_col: Optional[str] = None,
) -> DataFrame:
    """Append the linear margin ``b + Σ val·w[idx]`` (and optionally
    the sigmoid probability) — broadcast weights, one zero-shuffle
    Arrow pass. Margin accumulation is ascending-index (matches the
    SQL oracle's ordered list_sum)."""
    spark = df.sparkSession
    wv = np.asarray(weights, dtype=np.float64)
    n_features = len(wv) - 1
    bc = spark.sparkContext.broadcast(wv)

    @F.pandas_udf("double")
    def _margin(idxs: pd.Series, vals: pd.Series) -> pd.Series:
        w = bc.value
        bias = w[n_features]
        lens = idxs.map(len).to_numpy(dtype="int64")
        if lens.sum() == 0:
            return pd.Series(np.full(len(idxs), bias))
        rows = np.repeat(np.arange(len(idxs), dtype="int64"), lens)
        idx = np.concatenate([np.asarray(a, dtype="int64") for a in idxs])
        val = np.concatenate([np.asarray(a, dtype="float64") for a in vals])
        z = bias + np.bincount(rows, weights=val * w[idx],
                               minlength=len(idxs))
        return pd.Series(z)

    out = df.withColumn(margin_col, _margin(F.col(idxs_col), F.col(vals_col)))
    if prob_col is not None:
        out = out.withColumn(
            prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(margin_col))))
    return out
