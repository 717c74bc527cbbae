"""Product quantization: encode/ADC parity vs numpy, reconstruction
quality, recall on clustered data, deterministic min-id codebook."""

from __future__ import annotations

import numpy as np

from feathr_spark.operators.pq import (
    PQCodebook,
    encode_pq,
    pq_reconstruct,
    pq_topk,
    train_pq,
)


def _emb_df(spark, mat):
    rows = [(int(i), [float(v) for v in r]) for i, r in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _clustered(rng, n, d, k):
    cent = rng.randn(k, d) * 4
    idx = rng.randint(0, k, n)
    return cent[idx] + rng.randn(n, d) * 0.3


def test_min_id_seeds_are_sample_rows(spark):
    rng = np.random.RandomState(0)
    mat = rng.randn(40, 8)
    df = _emb_df(spark, mat)
    cb = train_pq(df, m=2, ksub=4, lloyd_rounds=0)
    assert cb.m == 2 and cb.ksub == 4 and cb.dsub == 4
    np.testing.assert_allclose(cb.centroids[0], mat[:4, :4])
    np.testing.assert_allclose(cb.centroids[1], mat[:4, 4:])


def test_encode_matches_numpy_argmin(spark):
    rng = np.random.RandomState(1)
    mat = _clustered(rng, 120, 8, 5)
    df = _emb_df(spark, mat)
    cb = train_pq(df, m=2, ksub=8, lloyd_rounds=3)
    got = {r["vec_id"]: r["pq_code"]
           for r in encode_pq(df, cb).collect()}
    for i, x in enumerate(mat):
        for s in range(2):
            sub = x[s * 4:(s + 1) * 4]
            want = int(np.argmin(((cb.centroids[s] - sub) ** 2).sum(axis=1)))
            assert got[i][s] == want
    # nulls stay null
    with_null = spark.createDataFrame(
        [(99, None)], "vec_id long, embedding array<double>")
    assert encode_pq(with_null, cb).collect()[0]["pq_code"] is None


def test_adc_topk_matches_numpy(spark):
    rng = np.random.RandomState(2)
    mat = _clustered(rng, 200, 16, 6)
    df = _emb_df(spark, mat)
    cb = train_pq(df, m=4, ksub=16, lloyd_rounds=4)
    codes_df = encode_pq(df, cb)
    queries = mat[:3]
    out = pq_topk(codes_df, cb, queries, k=5)
    got = {(r["query_id"], r["vec_id"]): r["dist"] for r in out.collect()}
    assert len(got) == 15

    # numpy ADC reference
    codes = {r["vec_id"]: r["pq_code"] for r in codes_df.collect()}
    for qi, q in enumerate(queries):
        dists = {}
        for vid, code in codes.items():
            d = 0.0
            for s in range(4):
                qsub = q[s * 4:(s + 1) * 4]
                d += float(((qsub - cb.centroids[s][code[s]]) ** 2).sum())
            dists[vid] = d
        want = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:5]
        for vid, d in want:
            assert (qi, vid) in got
            assert abs(got[(qi, vid)] - d) < 1e-9


def test_reconstruction_and_recall_on_clustered_data(spark):
    rng = np.random.RandomState(3)
    mat = _clustered(rng, 400, 16, 8)
    df = _emb_df(spark, mat)
    cb = train_pq(df, m=8, ksub=32, lloyd_rounds=6)
    codes_df = encode_pq(df, cb)
    rec = pq_reconstruct(codes_df, cb).collect()
    err = np.mean([np.linalg.norm(np.array(r["decoded"])
                                  - mat[r["vec_id"]]) for r in rec])
    scale = np.mean(np.linalg.norm(mat - mat.mean(0), axis=1))
    assert err < 0.35 * scale  # codes capture the cluster structure

    # recall@10 of ADC vs exact L2 top-10
    queries = mat[:5]
    out = pq_topk(codes_df, cb, queries, k=10).collect()
    hits = 0
    for qi, q in enumerate(queries):
        exact = set(np.argsort(((mat - q) ** 2).sum(axis=1))[:10].tolist())
        approx = {r["vec_id"] for r in out if r["query_id"] == qi}
        hits += len(exact & approx)
    assert hits / 50 >= 0.6


def test_train_pq_validations(spark):
    df = _emb_df(spark, np.random.RandomState(4).randn(10, 6))
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        train_pq(df, m=4, ksub=4, lloyd_rounds=0)
    with pytest.raises(ValueError, match="exceeds sample"):
        train_pq(df, m=2, ksub=64, lloyd_rounds=0)
    cb = PQCodebook(centroids=np.zeros((2, 4, 3)), dim=6)
    with pytest.raises(ValueError, match="queries must be"):
        pq_topk(df, cb, [[1.0, 2.0]], k=1)
