"""Distributed k-means over embedding columns (full-corpus Lloyd).

The similarity module already trains a *sample-based* coarse quantizer
driver-side (`similarity._fit_centroids`, the FAISS-style IVF recipe).
This module is the complement for workloads where the assignment of
EVERY row matters — SemDeDup-style cluster-then-dedup (Abbas et al.
2023 runs k-means over the full corpus embedding table before
within-cluster dedup), cluster-balanced sampling, and prototype-based
data pruning (Sorscher et al. 2022).

Scale shape (the 100 TB plan):

- E-step: centroids are a small broadcast (k x dim floats); assignment
  is one Arrow-batched matmul pass over the corpus — zero shuffle.
- M-step: each Arrow batch emits k partial rows (cluster, count,
  sum-vector); partials reduce with a JVM zip_with fold after ONE
  exchange on the k-key cluster column (k x num_partitions skinny rows
  — metadata-sized at any corpus scale), and only the k reduced rows
  reach the driver.
- The loop is driver-side over a handful of iterations; the corpus is
  scanned once per iteration (persist the projected (id, vec) frame —
  callers at real scale materialize it to storage once).

Determinism: ``init="min_id"`` seeds centroids from the k
lexically-smallest ids (retry-stable, no RNG); ``quantize_decimals``
optionally rounds centroids and the argmin key after every update so a
double-precision SQL engine replays the EXACT fixpoint (the 1e-13
sum-order slack between numpy and SQL summation is quashed by the
1e-6 grid; ties then break on cluster index in both engines). Leave it
``None`` in production — plain float64 argmin, index tie-break.

Reference analogue: none — the reference delegates clustering to
offline tooling; this is part of the training-data-pipeline surface
(SURVEY "beyond the reference" ops).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _argmin_clusters(mat: np.ndarray, cent: np.ndarray,
                     quantize_decimals: Optional[int]) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, sqdist) per row: squared-euclidean argmin with index
    tie-break; optionally on a decimal grid (see module docstring)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2, computed as one matmul
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ cent.T)
        + (cent * cent).sum(axis=1)
    )
    # exact per-pair recompute for the winner would cost another pass;
    # clip the (rare, ~1e-13) negative round-off instead
    np.maximum(d2, 0.0, out=d2)
    key = np.round(d2, quantize_decimals) if quantize_decimals is not None else d2
    cluster = np.argmin(key, axis=1)  # np.argmin returns the FIRST min -> index tie-break
    dist = d2[np.arange(len(d2)), cluster]
    return cluster.astype(np.int32), dist


def fit_kmeans(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    init: str = "min_id",
    quantize_decimals: Optional[int] = None,
    tol: float = 0.0,
) -> np.ndarray:
    """Full-corpus distributed Lloyd. Returns the (k, dim) float64
    centroid matrix.

    ``init="min_id"``: centroids start at the vectors of the k smallest
    ids (distributed TakeOrderedAndProject — never a global sort).
    Empty clusters keep their previous centroid (deterministic).
    Stops early when the max elementwise centroid move is <= ``tol``
    (after quantization, a zero move is exact convergence).
    """
    spark = df.sparkSession
    if init != "min_id":
        raise ValueError(f"unknown init {init!r}")
    seeds = (df.select(id_col, vec_col).orderBy(id_col).limit(k).collect())
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seeds)}")
    cent = np.asarray([r[vec_col] for r in seeds], dtype=np.float64)
    if quantize_decimals is not None:
        cent = np.round(cent, quantize_decimals)
    dim = cent.shape[1]
    data = df.select(id_col, vec_col)

    sum_cols = ", ".join(f"s{i} double" for i in range(dim))
    partial_schema = f"cluster int, n long, {sum_cols}"

    for _ in range(max_iter):
        cb = spark.sparkContext.broadcast(cent)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = cb.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                cluster, _ = _argmin_clusters(mat, c, quantize_decimals)
                counts = np.bincount(cluster, minlength=len(c))
                sums = np.zeros((len(c), dim), dtype=np.float64)
                np.add.at(sums, cluster, mat)
                out = {"cluster": np.arange(len(c), dtype=np.int32),
                       "n": counts.astype(np.int64)}
                for i in range(dim):
                    out[f"s{i}"] = sums[:, i]
                yield pd.DataFrame(out)

        agg = (data.mapInPandas(partials, schema=partial_schema)
               .groupBy("cluster")
               .agg(F.sum("n").alias("n"),
                    *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)])
               .collect())  # exactly k rows
        new_cent = cent.copy()
        for r in agg:
            if r["n"] > 0:
                v = np.array([r[f"s{i}"] for i in range(dim)]) / r["n"]
                new_cent[r["cluster"]] = v
        if quantize_decimals is not None:
            new_cent = np.round(new_cent, quantize_decimals)
        move = float(np.max(np.abs(new_cent - cent))) if len(cent) else 0.0
        cent = new_cent
        cb.destroy()
        if move <= tol:
            break
    return cent


def assign_kmeans(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: Optional[str] = "sq_dist",
    quantize_decimals: Optional[int] = None,
) -> DataFrame:
    """Nearest-centroid assignment appended to ``df`` — one broadcast +
    one Arrow pass, zero shuffle. ``dist_col=None`` drops the distance."""
    spark = df.sparkSession
    cb = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf("struct<c: int, d: double>")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        cent = cb.value
        c = np.full(len(vecs), -1, dtype=np.int32)
        d = np.full(len(vecs), np.nan, dtype=np.float64)
        ok = vecs.notna()
        if ok.any():
            mat = np.stack(vecs[ok].to_numpy()).astype(np.float64)
            cc, dd = _argmin_clusters(mat, cent, quantize_decimals)
            c[ok.to_numpy()] = cc
            d[ok.to_numpy()] = dd
        return pd.DataFrame({"c": c, "d": d})

    out = df.withColumn("__km", _assign(F.col(vec_col)))
    out = out.withColumn(cluster_col, F.col("__km.c"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("__km.d"))
    return out.drop("__km")


def cluster_balanced_sample(
    df: DataFrame,
    centroids: np.ndarray,
    per_cluster: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: str = "closest",
) -> DataFrame:
    """At most ``per_cluster`` rows per k-means cluster — the
    prototype-pruning selection (Sorscher et al. 2022: keep the easiest
    ``closest`` examples, or the hardest ``farthest``). One exchange on
    the cluster id feeding a Window(row_number); ties break on id."""
    if keep not in ("closest", "farthest"):
        raise ValueError(f"keep must be closest|farthest, got {keep!r}")
    from pyspark.sql import Window

    assigned = assign_kmeans(df, centroids, vec_col=vec_col)
    order = [F.col("sq_dist").asc() if keep == "closest"
             else F.col("sq_dist").desc(), F.col(id_col).asc()]
    w = Window.partitionBy("cluster").orderBy(*order)
    return (assigned.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= per_cluster).drop("__rn"))
