"""Similarity search over an embedding column (``array<float>``).

- ``cosine_sim`` / ``dot_product``: JVM-side higher-order-function
  expressions (``zip_with`` + ``aggregate``) — exact, codegen'd.
- ``brute_force_topk``: exact top-k for a set of query vectors. The
  corpus never collects: each partition computes a block matmul
  (numpy, Arrow-batched) and emits only its local top-k per query;
  a final groupBy keeps the global top-k. Shuffle volume is
  O(n_queries * k * n_partitions), independent of corpus size.
- ``embedding_lsh_buckets`` / ``ann_topk_lsh``: random-hyperplane LSH
  (sign-bit sketch) as the scale path — probe matching buckets only,
  verify with exact cosine.
- ``embedding_near_dup_pairs``: near-duplicate pairs by LSH bucket +
  cosine threshold (the embedding-space dedup variant).

Hyperplanes are seed-fixed and regenerated inside each executor from
(seed, dim) — nothing is shipped but two ints.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact expressions (JVM-side)
# ---------------------------------------------------------------------------


def dot_product(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a, b):
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# exact brute-force top-k (distributed block matmul)
# ---------------------------------------------------------------------------


def brute_force_topk(
    corpus: DataFrame,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    dtype: str = "float32",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Returns (query_id, vec_id, score) with exactly k rows per query
    (fewer if the corpus is smaller). Ties break on ascending id.

    ``dtype``: float32 (default — half the matmul bandwidth, the 100 TB
    setting) or float64 (bit-matches a double-precision SQL oracle).
    """
    np_dtype = np.float64 if dtype == "float64" else np.float32
    q = np.asarray(queries, dtype=np_dtype)
    if metric == "cosine":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    spark = corpus.sparkSession
    qb = spark.sparkContext.broadcast(q)

    def partition_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm = qb.value  # (nq, d)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np_dtype)  # (n, d)
            if metric == "cosine":
                mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scores = qm @ mat.T  # (nq, n)
            kk = min(k, scores.shape[1])
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(np.arange(len(qm)), kk),
                id_col: ids[idx.ravel()],
                "score": np.take_along_axis(scores, idx, axis=1).ravel().astype(np.float64),
            }
            yield pd.DataFrame(rows)

    local = corpus.select(id_col, vec_col).mapInPandas(
        partition_topk, schema=f"query_id long, {id_col} long, score double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        local.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — the scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def embedding_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
    dtype: str = "float32",
) -> DataFrame:
    """Sign-bit sketch bucket id (long) per row — vectors in the same
    bucket are likely cosine-similar. Partition/cluster the corpus by
    this column for ANN probes. ``dtype``: float32 (default, the 100 TB
    bandwidth setting) or float64 (sign decisions match a
    double-precision SQL oracle replaying the same hyperplane
    literals — the knn_bruteforce recipe)."""
    np_dtype = np.float64 if dtype == "float64" else np.float32

    @F.pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        # regenerated per executor; float32 draws, widened if asked so
        # both dtypes bucket from the SAME hyperplane values
        H = _hyperplanes(dim, n_bits, seed).astype(np_dtype)
        out = np.zeros(len(vecs), dtype=np.int64)
        ok = vecs.notna()
        if ok.any():
            mat = np.stack(vecs[ok].to_numpy()).astype(np_dtype)
            bits = (mat @ H.T) > 0  # (n, n_bits)
            vals = bits @ (1 << np.arange(n_bits, dtype=np.int64))
            out[ok.to_numpy()] = vals
        return pd.Series(out)

    return df.withColumn(out_col, _bucket(F.col(vec_col)))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: Sequence[Sequence[float]],
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    n_probe_bits: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dtype: str = "float32",
) -> DataFrame:
    """Approximate top-k: search only corpus rows whose LSH bucket is
    within ``n_probe_bits`` Hamming distance of the query's bucket
    (multi-probe). Recall/latency tradeoff via n_bits / n_probe_bits.
    ``dtype``: float32 (default) or float64 — with float64 every
    decision (bucket signs, probe set, scores, ranking) matches a
    double-precision SQL oracle that replays the seed's hyperplanes as
    literals, so the seeded path itself earns a hard value-level check
    (bucket signs are scale-invariant: sign(v.h) == sign(v_norm.h)).
    """
    np_dtype = np.float64 if dtype == "float64" else np.float32
    H = _hyperplanes(dim, n_bits, seed).astype(np_dtype)
    q = np.asarray(queries, dtype=np_dtype)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qbits = (qn @ H.T) > 0
    qbuckets = qbits @ (1 << np.arange(n_bits, dtype=np.int64))

    if n_probe_bits > 2:
        raise ValueError("n_probe_bits > 2 not implemented (probe count "
                         "grows as C(n_bits, k); use more bands instead)")

    # multi-probe: all buckets within hamming distance n_probe_bits
    def probes(b: int) -> list[int]:
        out = [b]
        if n_probe_bits >= 1:
            out += [b ^ (1 << i) for i in range(n_bits)]
        if n_probe_bits >= 2:
            out += [b ^ (1 << i) ^ (1 << j)
                    for i in range(n_bits) for j in range(i + 1, n_bits)]
        return out

    spark = corpus.sparkSession
    probe_rows = [(int(qi), int(b)) for qi, qb in enumerate(qbuckets) for b in probes(int(qb))]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, lsh_bucket long").dropDuplicates()

    bucketed = embedding_lsh_buckets(corpus, dim, n_bits, seed, vec_col,
                                     dtype=dtype)
    candidates = bucketed.join(F.broadcast(probe_df), on="lsh_bucket")

    qb = spark.sparkContext.broadcast(qn)

    @F.pandas_udf("double")
    def _score(qids: pd.Series, vecs: pd.Series) -> pd.Series:
        qm = qb.value
        mat = np.stack(vecs.to_numpy()).astype(np_dtype)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sel = qm[qids.to_numpy()]
        return pd.Series(np.einsum("ij,ij->i", sel, mat).astype(np.float64))

    scored = candidates.withColumn("score", _score(F.col("query_id"), F.col(vec_col)))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.select("query_id", id_col, "score")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _det_weight(b: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane weight in [-999, 999].

    Plain integer arithmetic (no RNG, no hash function) so ANY engine —
    Spark, DuckDB, plain SQL — reproduces the identical hyperplane grid.
    """
    return ((b * 1000003 + d * 7919) % 1999) - 999


def det_signature(vec_col, dim: int, n_bits: int = 8, scale: int = 1_000_000):
    """Integer-exact LSH sign signature as a JVM Column (no UDF).

    Each embedding value is quantized to ``round(x * scale)`` (a long),
    then dotted with the integer hyperplane grid ``_det_weight(b, d)``;
    bit b of the signature is ``dot >= 0``. All arithmetic is int64 and
    therefore EXACT — the same signature is reproducible in any SQL
    engine (the DuckDB oracle recomputes it), with no float32/float64
    summation-order hazards. max |dot| <= scale * 999 * dim, so dims up
    to ~10^6 are overflow-safe at the default scale.

    This is the correctness-witness twin of :func:`_hyperplanes`
    (seeded Gaussian): same bucketing geometry, exactly reproducible.
    """
    q = F.transform(vec_col, lambda x: F.round(x * F.lit(float(scale))).cast("long"))
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        w = F.array([F.lit(_det_weight(b, d)).cast("long") for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(q, w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
    return sig


def ann_topk_det(
    corpus: DataFrame,
    query_ids: Sequence[int],
    dim: int,
    k: int = 3,
    n_bits: int = 8,
    n_probe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic multi-probe LSH ANN — the oracle-checkable twin of
    :func:`ann_topk_lsh`.

    Same plan shape as the production path (signature column on the
    corpus, driver-enumerated probe table broadcast into an equi-join,
    exact cosine verify, per-query top-k window), but the signature is
    the integer-exact :func:`det_signature` and the query vectors are
    **rows of the corpus itself** (``query_ids``), so a SQL oracle can
    reproduce every step bit-for-bit. Scores are rounded to ``round_dp``
    decimals and ties break on ascending id, making the output fully
    deterministic across engines.
    """
    sig_df = corpus.select(id_col, vec_col).withColumn(
        "__sig", det_signature(F.col(vec_col), dim, n_bits))
    q_df = sig_df.where(F.col(id_col).isin([int(i) for i in query_ids]))
    q_rows = q_df.select(id_col, "__sig").collect()  # bounded: len(query_ids)

    if n_probe_bits > 2:
        raise ValueError("n_probe_bits > 2 not implemented (probe count "
                         "grows as C(n_bits, k); use more bands instead)")

    def probes(b: int) -> list[int]:
        out = [b]
        if n_probe_bits >= 1:
            out += [b ^ (1 << i) for i in range(n_bits)]
        if n_probe_bits >= 2:
            out += [b ^ (1 << i) ^ (1 << j)
                    for i in range(n_bits) for j in range(i + 1, n_bits)]
        return out

    spark = corpus.sparkSession
    probe_rows = [(int(r[id_col]), int(p)) for r in q_rows
                  for p in probes(int(r["__sig"]))]
    probe_df = spark.createDataFrame(
        probe_rows, "query_id long, __sig long").dropDuplicates()
    qvec_df = q_df.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__qvec"))

    cand = (sig_df.join(F.broadcast(probe_df), on="__sig")
            .where(F.col(id_col) != F.col("query_id"))
            .join(F.broadcast(qvec_df), on="query_id"))
    # score in DOUBLE (cast before multiply): float32 products differ
    # from a double-precision SQL oracle by ~1e-8, enough to flip a
    # 6-dp rounding; double-vs-double differences are ~1e-16
    score = F.round(cosine_sim(F.col("__qvec").cast("array<double>"),
                               F.col(vec_col).cast("array<double>")), round_dp)
    scored = cand.withColumn("score", score.cast("double"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (scored.select("query_id", id_col, "score")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))


def ivf_topk_det(
    corpus: DataFrame,
    query_ids: Sequence[int],
    centroid_ids: Sequence[int],
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic IVF ANN — the oracle-checkable twin of
    :func:`ivf_topk`.

    Coarse cells are the (normalized) embeddings of explicit corpus rows
    (``centroid_ids``) instead of a sampled k-means fit, so the whole
    pipeline — cell assignment (argmax cosine, lowest-cell tie-break),
    per-query probe list (top ``n_probe`` cells), candidate scoring,
    top-k — is a pure function of the table and reproducible in SQL.
    Assignment and scoring are JVM ``zip_with``/``aggregate`` double
    expressions (no UDF, no shuffle of the corpus; the probe table and
    query vectors broadcast)."""
    cids = [int(c) for c in centroid_ids]
    cent_rows = (corpus.where(F.col(id_col).isin(cids))
                 .select(id_col, vec_col).collect())  # bounded: len(cids)
    cent_by_id = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
                  for r in cent_rows}
    cents = []
    for ci, cid in enumerate(sorted(cent_by_id)):
        v = cent_by_id[cid]
        cents.append((ci, v / max(float(np.linalg.norm(v)), 1e-12)))

    def cos_to_cent(vec, cv: np.ndarray):
        w = F.array([F.lit(float(x)) for x in cv])
        return dot_product(vec, w) / l2_norm(vec)

    def cell_of(vec):
        arr = F.array([cos_to_cent(vec, cv) for _, cv in cents])
        # array_position returns the FIRST (1-based) match of the max —
        # the lowest-cell-id tie-break the oracle replicates. EXACT float
        # ties (duplicated centroid rows) resolve identically in both
        # engines; only an ulp-level near-tie between two centroid
        # cosines (different summation orders, ~1e-16) could diverge —
        # vanishing for non-degenerate embeddings, accepted here.
        return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")

    assigned = corpus.select(id_col, vec_col).withColumn(
        "__cell", cell_of(F.col(vec_col)))
    q_df = assigned.where(F.col(id_col).isin([int(i) for i in query_ids]))
    q_rows = q_df.select(id_col, vec_col).collect()  # bounded: len(query_ids)

    spark = corpus.sparkSession
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qv = qv / max(float(np.linalg.norm(qv)), 1e-12)
        sims = [(float(qv @ cv), ci) for ci, cv in cents]
        top = sorted(sims, key=lambda t: (-t[0], t[1]))[:n_probe]
        probe_rows += [(int(r[id_col]), ci) for _, ci in top]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, __cell int")
    qvec_df = q_df.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__qvec"))

    cand = (assigned.join(F.broadcast(probe_df), on="__cell")
            .where(F.col(id_col) != F.col("query_id"))
            .join(F.broadcast(qvec_df), on="query_id"))
    score = F.round(cosine_sim(F.col("__qvec").cast("array<double>"),
                               F.col(vec_col).cast("array<double>")), round_dp)
    scored = cand.withColumn("score", score.cast("double"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (scored.select("query_id", id_col, "score")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a < id_b, cosine) pairs with cosine >= threshold, candidates
    restricted to equal LSH buckets (high threshold -> high recall)."""
    b = embedding_lsh_buckets(df, dim, n_bits, seed, vec_col).select(id_col, vec_col, "lsh_bucket")
    left = b.select(F.col("lsh_bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = b.select(F.col("lsh_bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = left.join(right, "lsh_bucket").where(F.col("id_a") < F.col("id_b"))
    cos = dot_product(F.col("va"), F.col("vb")) / (l2_norm(F.col("va")) * l2_norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", cos.cast("double"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruned scale path
# ---------------------------------------------------------------------------


def _fit_centroids(sample: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Driver-side Lloyd k-means on a BOUNDED sample (the classic IVF
    coarse quantizer — FAISS trains its coarse centroids on a sample the
    same way; the full corpus never reaches the driver)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        sims = sample @ cent.T  # normalized -> cosine
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(float(np.linalg.norm(v)), 1e-12)
    return cent


def _fit_centroids_det(sample: np.ndarray, n_centroids: int,
                       iters: int) -> np.ndarray:
    """Deterministic Lloyd fit: the RNG-free twin of
    :func:`_fit_centroids`. Init centroids are the evenly spaced rows
    ``c * (n // k)`` of the (id-ordered, normalized) sample; each
    iteration assigns by argmax cosine (first max wins — ties go to the
    lowest cell, matching a SQL ``ORDER BY sim DESC, cell`` rank) and
    recenters to the normalized member mean, keeping the previous
    centroid for empty cells. Every step is a pure float64 function of
    the sample, so a double-precision SQL oracle can replay the fit
    exactly (the ann_ivf driver oracle does)."""
    n = len(sample)
    k = min(n_centroids, n)
    step = max(n // k, 1)
    idx = [min(c * step, n - 1) for c in range(k)]
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(float(np.linalg.norm(v)), 1e-12)
    return cent


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
    dtype: str = "float32",
) -> DataFrame:
    """Nearest-centroid cell id per row (Arrow-batched matmul). At scale,
    write the corpus partitioned/bucketed by this column once and every
    subsequent query prunes to n_probe cells at the SCAN. ``dtype``:
    float32 (default) or float64 (cell decisions match a
    double-precision SQL oracle)."""
    np_dtype = np.float64 if dtype == "float64" else np.float32
    spark = corpus.sparkSession
    cb = spark.sparkContext.broadcast(centroids.astype(np_dtype))

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        cent = cb.value
        out = np.full(len(vecs), -1, dtype=np.int32)
        ok = vecs.notna()
        if ok.any():
            mat = np.stack(vecs[ok].to_numpy()).astype(np_dtype)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            out[ok.to_numpy()] = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
        return pd.Series(out)

    return corpus.withColumn(out_col, _assign(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    kmeans_iters: int = 5,
    sample_size: int = 20000,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit: str = "seeded",
    dtype: str = "float32",
) -> DataFrame:
    """IVF approximate top-k cosine neighbors: coarse k-means centroids
    (fit driver-side on a bounded sample), corpus rows assigned to their
    nearest cell, each query scored ONLY against its ``n_probe`` nearest
    cells — the candidate set shrinks ~n_probe/n_centroids versus
    brute force, and the (query, cell) probe table is a broadcast join,
    so no shuffle of the corpus. Returns (query_id, vec_id, score).

    ``fit``: "seeded" (default — RNG init over an arbitrary-order
    sample, the FAISS-style production setting) or "det"
    (:func:`_fit_centroids_det` over the first ``sample_size`` rows in
    ``id_col`` order — every step a pure function of the table, so with
    ``dtype="float64"`` a double-precision SQL oracle replays the whole
    pipeline including the Lloyd fit). ``dtype`` as in
    :func:`brute_force_topk`."""
    np_dtype = np.float64 if dtype == "float64" else np.float32
    spark = corpus.sparkSession
    if fit == "det":
        sample_rows = (corpus.select(id_col, vec_col)
                       .where(F.col(vec_col).isNotNull())
                       .orderBy(id_col).limit(sample_size).collect())
    else:
        sample_rows = corpus.select(vec_col).where(F.col(vec_col).isNotNull()) \
            .limit(sample_size).collect()
    if not sample_rows:
        return spark.createDataFrame([], f"query_id long, {id_col} long, score double")
    sample = np.stack([r[vec_col] for r in sample_rows]).astype(np_dtype)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    if fit == "det":
        cent = _fit_centroids_det(sample, n_centroids, kmeans_iters)
    else:
        cent = _fit_centroids(sample, n_centroids, kmeans_iters, seed)

    q = np.asarray(queries, dtype=np_dtype)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, : min(n_probe, len(cent))]
    probe_rows = [(int(qi), int(c)) for qi in range(len(qn)) for c in probe[qi]]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, ivf_cell int")

    assigned = ivf_assign(corpus, cent, vec_col, dtype=dtype)
    candidates = assigned.join(F.broadcast(probe_df), on="ivf_cell")

    qb = spark.sparkContext.broadcast(qn)

    @F.pandas_udf("double")
    def _score(qids: pd.Series, vecs: pd.Series) -> pd.Series:
        qm = qb.value
        mat = np.stack(vecs.to_numpy()).astype(np_dtype)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sel = qm[qids.to_numpy()]
        return pd.Series(np.einsum("ij,ij->i", sel, mat).astype(np.float64))

    scored = candidates.withColumn("score", _score(F.col("query_id"), F.col(vec_col)))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.select("query_id", id_col, "score")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Embedding quantization (int8) — storage/bandwidth path for 100 TB corpora
# ---------------------------------------------------------------------------


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization, pure JVM expressions:
    scale = max|x| / 127, q[i] = floor(x[i]/scale + 0.5) clamped to
    [-127, 127] (explicit floor(+0.5) so a SQL oracle reproduces the
    rounding bit-exactly; banker's-vs-half-up round() differences would
    break value checks). Null/zero vectors quantize to scale 0 / all-0."""
    x = F.col(vec_col)
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = (absmax / F.lit(127.0))
    qexpr = F.transform(
        x,
        lambda v: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(v / F.nullif(scale, F.lit(0.0)) + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    qexpr = F.when(scale.isNull() | (scale == 0.0),
                   F.transform(x, lambda v: F.lit(0))).otherwise(qexpr)
    return df.withColumn(q_col, qexpr.cast("array<tinyint>")) \
             .withColumn(scale_col, F.coalesce(scale, F.lit(0.0)))

# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540)
# ---------------------------------------------------------------------------


def semantic_dedup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    strategy: str = "lsh",
    n_bits: int = 12,
    n_centroids: int = 64,
    kmeans_iters: int = 5,
    sample_size: int = 20000,
    max_cell: int = 20000,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a < id_b, cosine) semantic near-dup candidate pairs with
    cosine >= threshold.

    ``strategy="lsh"``: random-hyperplane buckets
    (:func:`embedding_near_dup_pairs`) — no global model, fully
    data-parallel; at very high thresholds recall is near-exact.

    ``strategy="ivf"``: the SemDeDup shape — coarse k-means cells (fit
    driver-side on a bounded sample, exactly like the IVF quantizer),
    pairs enumerated only within a cell. Cells are semantically
    coherent, so near-dups co-locate; ``max_cell`` (rank by id) bounds
    the per-cell quadratic blow-up the same way LSH buckets are capped.

    ``strategy="exact"``: all-pairs self-join — O(n²), for small
    corpora and as the recall baseline the bucketed strategies are
    tested against. Bucketed recall is a function of the threshold
    angle: near-identical vectors (the semantic-dedup regime,
    threshold >= 0.95) co-bucket with probability ~(1 - θ/π)^n_bits →
    ~1, while low thresholds need the exact path.
    """
    if strategy == "lsh":
        return embedding_near_dup_pairs(df, dim, threshold, n_bits, seed,
                                        id_col, vec_col)
    if strategy == "exact":
        e = df.select(F.col(id_col), F.col(vec_col))
        a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        cos = cosine_sim(F.col("va"), F.col("vb"))
        return (pairs.withColumn("cosine", cos.cast("double"))
                .where(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine"))
    if strategy == "kmeans":
        # SemDeDup-proper (Abbas et al. 2023): full-corpus Lloyd
        # clusters as the candidate buckets (deterministic min-id init,
        # every row's assignment exact — vs "ivf"'s sample-fit coarse
        # quantizer). Same capped within-cell enumeration below.
        from feathr_spark.operators.clustering import assign_kmeans, fit_kmeans

        cent = fit_kmeans(df, k=n_centroids, vec_col=vec_col,
                          id_col=id_col, max_iter=kmeans_iters)
        cells = (assign_kmeans(df.select(id_col, vec_col), cent,
                               vec_col=vec_col, cluster_col="ivf_cell",
                               dist_col=None))
    elif strategy == "ivf":
        sample_rows = df.select(vec_col).where(F.col(vec_col).isNotNull()) \
            .limit(sample_size).collect()
        if not sample_rows:
            return df.sparkSession.createDataFrame(
                [], f"id_a long, id_b long, cosine double")
        sample = np.stack([r[vec_col] for r in sample_rows]).astype(np.float32)
        sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        cent = _fit_centroids(sample, n_centroids, kmeans_iters, seed)
        cells = ivf_assign(df.select(id_col, vec_col), cent, vec_col)
    else:
        raise ValueError(f"unknown semantic-dedup strategy {strategy!r}")
    from pyspark.sql import Window
    w = Window.partitionBy("ivf_cell").orderBy(id_col)
    cells = cells.withColumn("__rn", F.row_number().over(w)) \
        .where(F.col("__rn") <= max_cell).drop("__rn")
    left = cells.select(F.col("ivf_cell"), F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"))
    right = cells.select(F.col("ivf_cell"), F.col(id_col).alias("id_b"),
                         F.col(vec_col).alias("vb"))
    pairs = left.join(right, "ivf_cell").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_sim(F.col("va"), F.col("vb"))
    return (
        pairs.withColumn("cosine", cos.cast("double"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    strategy: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Drop rows that are semantic near-duplicates of a lower-id row.

    Keep rule: a row survives iff it has NO cosine >= threshold
    neighbor with a smaller id among the generated candidate pairs
    ("smaller-id witness" — deterministic and order-free, so the result
    is reproducible and SQL-oracle-checkable, unlike SemDeDup's
    keep-closest-to-centroid which depends on the fitted centroids).
    More aggressive than greedy-sequential dedup on chains (a dropped
    row still witnesses its larger-id neighbors), which is the standard
    conservative choice for corpus pruning.

    One anti-join against the distinct dropped-id set: at scale the
    pair table is tiny relative to the corpus (only near-dup edges),
    so the anti-join broadcasts."""
    pairs = semantic_dedup_pairs(df, dim, threshold, strategy,
                                 id_col=id_col, vec_col=vec_col, **kwargs)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


# ---------------------------------------------------------------------------
# semantic benchmark contamination (embedding-space decontamination)
# ---------------------------------------------------------------------------


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: Optional[str] = None,
    bench_vec_col: Optional[str] = None,
    dtype: str = "float32",
    max_bench: int = 2_000_000,
    keep_cols: bool = False,
) -> DataFrame:
    """Embedding-space benchmark contamination: for every corpus row,
    the max cosine similarity against the benchmark/eval embedding set
    and the nearest benchmark id — the semantic complement of n-gram
    :func:`feathr_spark.operators.corpus.contamination` (catches
    paraphrased/reworded eval leakage that token overlap misses).

    Scale shape: eval sets are bounded (⌀ 1e3–1e5 rows; ``max_bench``
    guards the assumption), so the benchmark matrix is collected,
    L2-normalized, and BROADCAST; the corpus — the unbounded side — is
    scored where it sits in ONE vectorized Arrow ``mapInPandas`` pass
    (per-batch matmul against the broadcast matrix). ZERO shuffle, no
    corpus-scale join. For a benchmark too large to broadcast, go
    through :func:`semantic_dedup_pairs` (LSH-bucketed) instead.

    Ties on the max break toward the smallest benchmark id (the matrix
    is collected in ascending id order and ``argmax`` takes the first
    winner), matching a SQL ``ORDER BY score DESC, bench_id`` replay.
    ``dtype``: float32 (default, half the matmul bandwidth) or float64
    (bit-matches a double-precision SQL oracle).

    Returns ``(id_col, bench_id, max_cosine, contaminated)``; with
    ``keep_cols=True`` the corpus columns ride along (for direct
    filtering — see :func:`decontaminate_semantic`).
    """
    from pyspark.sql import types as T

    np_dtype = np.float64 if dtype == "float64" else np.float32
    bid = bench_id_col or id_col
    bvec = bench_vec_col or vec_col
    # derive the bench_id output type from the benchmark schema instead
    # of assuming int64 — string/uuid eval-set ids are common
    bid_type = {f.name: f.dataType for f in benchmark.schema.fields}[bid]
    if isinstance(bid_type, T.IntegralType):
        bid_ddl, bid_np = "long", np.int64
    elif isinstance(bid_type, T.StringType):
        bid_ddl, bid_np = "string", object
    else:
        raise ValueError(
            f"benchmark id column {bid!r} has type "
            f"{bid_type.simpleString()}; only integer and string ids are "
            f"supported (cast it in the benchmark DataFrame first)")
    rows = benchmark.select(bid, bvec).orderBy(bid).limit(max_bench + 1).collect()
    if len(rows) > max_bench:
        raise ValueError(
            f"benchmark exceeds max_bench={max_bench} rows; use the "
            "LSH-bucketed pair path (semantic_dedup_pairs) instead")
    if not rows:
        raise ValueError("benchmark is empty")
    # reference length from the first NON-null vector — indexing
    # rows[0][1] directly would TypeError when the smallest-id row is
    # the null one, defeating this guard's purpose
    ref_len = next((len(r[1]) for r in rows if r[1] is not None), None)
    bad = [r[0] for r in rows if r[1] is None or len(r[1]) != ref_len]
    if bad:
        raise ValueError(
            f"benchmark has null or ragged {bvec!r} vectors (e.g. ids "
            f"{bad[:3]}); filter/fix them before contamination scoring")
    ids = np.asarray([r[0] for r in rows], dtype=bid_np)
    bm = np.asarray([r[1] for r in rows], dtype=np_dtype)
    bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
    spark = corpus.sparkSession
    bb = spark.sparkContext.broadcast((ids, bm))

    src = corpus if keep_cols else corpus.select(id_col, vec_col)
    passthrough = [f"`{f.name}` {f.dataType.simpleString()}"
                   for f in src.schema.fields
                   if keep_cols or f.name != vec_col]
    schema = ", ".join(passthrough +
                       [f"bench_id {bid_ddl}", "max_cosine double",
                        "contaminated boolean"])

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bids, bmat = bb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pdf[vec_col].isna().any():
                raise ValueError(
                    f"corpus has null {vec_col!r} vectors; filter them "
                    f"before contamination scoring")
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np_dtype)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            scores = mat @ bmat.T                     # (n, n_bench)
            j = np.argmax(scores, axis=1)             # first max = min id
            best = scores[np.arange(len(mat)), j].astype(np.float64)
            out = pdf if keep_cols else pdf.drop(columns=[vec_col])
            out = out.copy()
            out["bench_id"] = bids[j]
            out["max_cosine"] = best
            out["contaminated"] = best >= threshold
            yield out

    return src.mapInPandas(_score, schema=schema)


def decontaminate_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Corpus rows whose max benchmark cosine stays below ``threshold``
    (ALL columns preserved, score columns dropped) — the filter twin of
    :func:`semantic_contamination`, still one zero-shuffle pass."""
    scored = semantic_contamination(
        corpus, benchmark, threshold, id_col=id_col, vec_col=vec_col,
        keep_cols=True, **kwargs)
    return scored.where(~F.col("contaminated")) \
                 .drop("bench_id", "max_cosine", "contaminated")
