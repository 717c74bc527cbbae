"""Distributed PCA over embedding columns — the dimensionality-
reduction / whitening step ahead of clustering and semantic dedup
(SemDeDup, Abbas et al. 2023, clusters normalized+reduced embeddings;
FAISS's OPQ/PCA pre-transforms are the ANN-side analogue).

Scale shape (the 100 TB plan):

- **Moments** (mean + covariance) in ONE corpus pass: each Arrow batch
  emits the skinny partial cells ``(cell, value)`` of ``[n | Σx |
  upper-triangle Σ x xᵀ]`` — ``1 + d + d(d+1)/2`` rows per batch
  (d=64 → 2145), reduced by a map-side-combined ``groupBy(cell).sum``
  after one metadata-sized exchange; only the reduced cells reach the
  driver. Same partial-aggregate shape as ``clustering.fit_kmeans``.
- **Eigendecomposition** is a driver-side ``numpy.linalg.eigh`` of the
  d×d covariance (d ≤ a few thousand — never corpus-sized).
- **Projection / whitening** broadcasts the (k, d) component matrix
  and runs one zero-shuffle Arrow matmul pass.

Determinism: eigh of a symmetric matrix is deterministic for fixed
input; the remaining sign ambiguity is pinned by flipping each
component so its largest-|coefficient| entry is positive (first index
wins ties). The covariance itself is SQL-replayable — the
``embedding_covariance`` contract query replays every upper-triangle
cell in DuckDB from the same sum formula.

Reference analogue: none (the reference delegates embedding tooling);
part of the training-data-pipeline surface (SURVEY "beyond the
reference" ops).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray                # (d,)
    components: np.ndarray          # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    n_rows: int


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding",
) -> tuple[int, np.ndarray, np.ndarray]:
    """One-pass ``(n, mean, covariance)`` over an embedding column.
    Covariance is the unbiased (n−1) estimator assembled from the
    reduced partial sums ``cov = (Σxxᵀ − (Σx)(Σx)ᵀ/n) / (n−1)``."""
    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError("no non-null vectors")
    d = len(first[0])
    n_tri = d * (d + 1) // 2
    iu = np.triu_indices(d)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if len(vecs) == 0:
                continue
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            s1 = mat.sum(axis=0)
            s2 = (mat.T @ mat)[iu]
            cells = np.concatenate(([float(len(mat))], s1, s2))
            yield pd.DataFrame({
                "cell": np.arange(1 + d + n_tri, dtype=np.int32),
                "v": cells})

    agg = (df.select(vec_col).mapInPandas(partials, schema="cell int, v double")
           .groupBy("cell").agg(F.sum("v").alias("v")).collect())
    flat = np.zeros(1 + d + n_tri, dtype=np.float64)
    for r in agg:
        flat[r["cell"]] = r["v"]
    n = int(flat[0])
    if n < 2:
        raise ValueError(f"need >= 2 vectors, got {n}")
    s1 = flat[1:1 + d]
    s2 = np.zeros((d, d), dtype=np.float64)
    s2[iu] = flat[1 + d:]
    s2 = s2 + np.triu(s2, 1).T
    mean = s1 / n
    cov = (s2 - np.outer(s1, s1) / n) / (n - 1)
    return n, mean, cov


def fit_pca(
    df: DataFrame, k: int, vec_col: str = "embedding",
) -> PCAModel:
    """Top-``k`` principal axes of the embedding column. One corpus
    pass (see :func:`embedding_moments`) + a driver-side d×d eigh."""
    n, mean, cov = embedding_moments(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comp = vecs[:, order].T                   # (k, d)
    ev = vals[order]
    # pin the sign: largest-|coefficient| entry positive, first index
    # wins ties (np.argmax returns the first maximum)
    for i in range(len(comp)):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return PCAModel(mean=mean, components=comp,
                    explained_variance=ev, n_rows=n)


def project_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Append the (k,) projection ``(x − mean) @ componentsᵀ``
    (optionally whitened by ``1/√eigenvalue``) — broadcast model, one
    zero-shuffle Arrow pass. Null vectors stay null."""
    spark = df.sparkSession
    scale = (1.0 / np.sqrt(np.maximum(model.explained_variance, eps))
             if whiten else None)
    bc = spark.sparkContext.broadcast(
        (model.mean, model.components, scale))

    @F.pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        mean, comp, sc = bc.value
        out: list[Optional[list[float]]] = [None] * len(vecs)
        ok = vecs.notna()
        if ok.any():
            mat = np.stack(vecs[ok].to_numpy()).astype(np.float64)
            proj = (mat - mean) @ comp.T
            if sc is not None:
                proj = proj * sc
            pos = np.flatnonzero(ok.to_numpy())
            for r, p in zip(pos, proj):
                out[r] = p.tolist()
        return pd.Series(out)

    return df.withColumn(out_col, _proj(F.col(vec_col)))
