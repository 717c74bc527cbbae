"""Product quantization for embedding columns (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search" — the FAISS IVF-PQ
recipe). Completes the engine's similarity stack (brute-force → LSH →
IVF): PQ is the 100 TB *storage* path — a d-dim float32 vector (256 B
at d=64) compresses to ``m`` uint8 codes (8 B at m=8), and top-k search
scans codes with a per-query lookup table instead of raw vectors.

Scale shape:

- **Train**: per-subspace Lloyd k-means runs driver-side on a BOUNDED
  sample (the FAISS protocol — codebooks are (m, ksub, d/m) floats,
  metadata-sized; the corpus never reaches the driver).
- **Encode**: broadcast codebook, ONE zero-shuffle Arrow pass; each
  batch does m small matmuls (batch × ksub per subspace).
- **Search (ADC)**: each query precomputes an (m, ksub) distance
  lookup table driver-side; tables broadcast; each partition scores
  its codes with numpy fancy indexing (sum of m table lookups per
  row) and emits only its LOCAL top-k — the global cut is a bounded
  Window over partitions × k candidate rows per query. The corpus
  crosses zero exchanges.

Determinism: ``train_pq(init="min_id", lloyd_rounds=N)`` seeds every
subspace codebook from the vectors of the ksub smallest ids and runs
exactly N Lloyd rounds with index tie-breaks (the
``clustering.fit_kmeans`` discipline), so a SQL engine can replay
encode + search exactly — the ``pq_topk_det`` contract query does, with
``lloyd_rounds=0`` (pure min-id codebook) for a join-only DuckDB replay.

Reference analogue: none (the reference delegates embedding tooling);
part of the training-data-pipeline surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PQCodebook:
    centroids: np.ndarray  # (m, ksub, dsub) float64
    dim: int

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ksub(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]


def _split(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, d) -> (m, n, dsub) contiguous subspace views."""
    n, d = mat.shape
    return mat.reshape(n, m, d // m).transpose(1, 0, 2)


def _assign_sub(sub: np.ndarray, cent: np.ndarray,
                quantize_decimals: Optional[int] = None) -> np.ndarray:
    """Argmin-L2 codes for one subspace; first-min index tie-break.
    ``quantize_decimals`` puts the argmin key on a decimal grid so a
    SQL engine computing the direct Σ(x−c)² form lands on the same
    winner as this expanded-form matmul (the fit_kmeans device)."""
    d2 = ((sub * sub).sum(axis=1, keepdims=True)
          - 2.0 * (sub @ cent.T)
          + (cent * cent).sum(axis=1))
    if quantize_decimals is not None:
        np.maximum(d2, 0.0, out=d2)
        d2 = np.round(d2, quantize_decimals)
    return np.argmin(d2, axis=1)


def train_pq(
    df: DataFrame,
    m: int = 8,
    ksub: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 20000,
    lloyd_rounds: int = 10,
    init: str = "min_id",
) -> PQCodebook:
    """Fit an (m, ksub) product codebook on the ``sample_size``
    smallest-id vectors (deterministic, retry-stable — a distributed
    TakeOrderedAndProject, never a global sort). ``lloyd_rounds=0``
    keeps the raw min-id seeds (the SQL-replayable form)."""
    if init != "min_id":
        raise ValueError(f"unknown init {init!r}")
    rows = (df.select(id_col, vec_col).where(F.col(vec_col).isNotNull())
            .orderBy(id_col).limit(sample_size).collect())
    if len(rows) < ksub:
        raise ValueError(f"ksub={ksub} exceeds sample size {len(rows)}")
    sample = np.stack([r[vec_col] for r in rows]).astype(np.float64)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    subs = _split(sample, m)                      # (m, n, dsub)
    cent = subs[:, :ksub, :].copy()               # min-id seeds per subspace
    for _ in range(lloyd_rounds):
        for s in range(m):
            codes = _assign_sub(subs[s], cent[s])
            for c in range(ksub):
                mask = codes == c
                if mask.any():
                    cent[s, c] = subs[s][mask].mean(axis=0)
    return PQCodebook(centroids=cent, dim=d)


def encode_pq(
    df: DataFrame,
    codebook: PQCodebook,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    quantize_decimals: Optional[int] = None,
) -> DataFrame:
    """Append the ``array<int>`` of m subspace codes — broadcast
    codebook, one zero-shuffle Arrow pass. Null vectors stay null."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebook.centroids)
    m, dim = codebook.m, codebook.dim

    @F.pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        out: list[Optional[list[int]]] = [None] * len(vecs)
        ok = vecs.notna()
        if ok.any():
            mat = np.stack(vecs[ok].to_numpy()).astype(np.float64)
            if mat.shape[1] != dim:
                raise ValueError(f"dim {mat.shape[1]} != codebook {dim}")
            subs = _split(mat, m)
            codes = np.stack(
                [_assign_sub(subs[s], cent[s], quantize_decimals)
                 for s in range(m)], axis=1)
            pos = np.flatnonzero(ok.to_numpy())
            for r, c in zip(pos, codes.astype("int32")):
                out[r] = c.tolist()
        return pd.Series(out)

    return df.withColumn(code_col, _encode(F.col(vec_col)))


def pq_topk(
    codes_df: DataFrame,
    codebook: PQCodebook,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    quantize_decimals: Optional[int] = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per-query
    (m, ksub) L2 lookup tables broadcast, each partition emits its
    local top-k (numpy fancy-indexed table sums — subspace-index
    accumulation order), global cut = one bounded Window over
    partitions × k rows per query. Returns
    ``(query_id, id, dist)`` with (dist ASC, id ASC) ranking."""
    spark = codes_df.sparkSession
    q = np.asarray(queries, dtype=np.float64)
    if q.ndim != 2 or q.shape[1] != codebook.dim:
        raise ValueError(f"queries must be (n, {codebook.dim})")
    cent = codebook.centroids
    m = codebook.m
    # LUT[qi, s, c] = ||q_s - cent[s, c]||^2
    qs = _split(q, m)                              # (m, nq, dsub)
    lut = np.stack(
        [((qs[s][:, None, :] - cent[s][None, :, :]) ** 2).sum(axis=2)
         for s in range(m)], axis=1)               # (nq, m, ksub)
    bc = spark.sparkContext.broadcast(lut)

    id_type = codes_df.schema[id_col].dataType.simpleString()
    out_schema = f"query_id int, `{id_col}` {id_type}, dist double"

    def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = bc.value
        nq = len(tables)
        ids_all: list[np.ndarray] = []
        dists_all: list[np.ndarray] = []
        qids_all: list[np.ndarray] = []
        for pdf in batches:
            codes = pdf[code_col]
            ok = codes.notna()
            if not ok.any():
                continue
            cmat = np.stack(codes[ok].to_numpy()).astype(np.int64)  # (n, m)
            ids = pdf[id_col][ok].to_numpy()
            for qi in range(nq):
                # ascending-subspace accumulation: t[0][c0] + t[1][c1] + ...
                t = tables[qi]
                d = np.zeros(len(cmat), dtype=np.float64)
                for s in range(m):
                    d += t[s][cmat[:, s]]
                if quantize_decimals is not None:
                    d = np.round(d, quantize_decimals)
                if len(d) > k:
                    part = np.argpartition(d, k)[:k]
                else:
                    part = np.arange(len(d))
                ids_all.append(ids[part])
                dists_all.append(d[part])
                qids_all.append(np.full(len(part), qi, dtype=np.int32))
        if qids_all:
            yield pd.DataFrame({
                "query_id": np.concatenate(qids_all),
                id_col: np.concatenate(ids_all),
                "dist": np.concatenate(dists_all),
            })

    local = codes_df.select(id_col, code_col).mapInPandas(
        _local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc(id_col))
    return (local.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))


def pq_reconstruct(
    df: DataFrame,
    codebook: PQCodebook,
    code_col: str = "pq_code",
    out_col: str = "decoded",
) -> DataFrame:
    """Decode PQ codes back to (approximate) vectors — broadcast
    codebook, zero-shuffle Arrow pass (analysis/debug path)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebook.centroids)
    m = codebook.m

    @F.pandas_udf("array<double>")
    def _decode(codes: pd.Series) -> pd.Series:
        cent = bc.value
        out: list[Optional[list[float]]] = [None] * len(codes)
        ok = codes.notna()
        if ok.any():
            cmat = np.stack(codes[ok].to_numpy()).astype(np.int64)
            vecs = np.concatenate(
                [cent[s][cmat[:, s]] for s in range(m)], axis=1)
            pos = np.flatnonzero(ok.to_numpy())
            for r, v in zip(pos, vecs):
                out[r] = v.tolist()
        return pd.Series(out)

    return df.withColumn(out_col, _decode(F.col(code_col)))
