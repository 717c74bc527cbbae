"""Distributed PCA: one-pass moments vs numpy, projection/whitening
parity, sign-convention determinism."""

from __future__ import annotations

import numpy as np

from feathr_spark.operators.pca import (
    embedding_moments,
    fit_pca,
    project_pca,
)


def _emb_df(spark, mat, ids=None):
    ids = ids if ids is not None else range(len(mat))
    rows = [(int(i), [float(v) for v in row]) for i, row in zip(ids, mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_moments_match_numpy(spark):
    rng = np.random.RandomState(11)
    mat = rng.randn(257, 6) * [1, 2, 3, 0.5, 1, 1] + rng.randn(6)
    df = _emb_df(spark, mat).repartition(7)
    n, mean, cov = embedding_moments(df)
    assert n == 257
    np.testing.assert_allclose(mean, mat.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(mat, rowvar=False), atol=1e-10)


def test_moments_skip_nulls(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0]), (4, [5.0, 0.0])],
        "vec_id long, embedding array<double>")
    n, mean, cov = embedding_moments(df)
    assert n == 3
    np.testing.assert_allclose(mean, [3.0, 2.0])


def test_fit_project_matches_numpy_reference(spark):
    rng = np.random.RandomState(5)
    # anisotropic cloud: top axis is unambiguous
    base = rng.randn(400, 4) * [5.0, 2.0, 0.7, 0.1]
    rot, _ = np.linalg.qr(rng.randn(4, 4))
    mat = base @ rot + [1, -2, 0, 3]
    df = _emb_df(spark, mat).repartition(5)
    model = fit_pca(df, k=2)

    # numpy reference with the same sign convention
    cov = np.cov(mat, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    ref = vecs[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(model.components, ref, atol=1e-8)
    np.testing.assert_allclose(model.explained_variance,
                               vals[order], rtol=1e-10)
    # sign convention holds on the fitted model
    for row in model.components:
        assert row[int(np.argmax(np.abs(row)))] > 0

    out = project_pca(df, model).orderBy("vec_id").collect()
    got = np.array([r["pca"] for r in out])
    want = (mat - mat.mean(axis=0)) @ ref.T
    np.testing.assert_allclose(got, want, atol=1e-8)
    # projected covariance is diagonal with the eigenvalues
    pc = np.cov(got, rowvar=False)
    np.testing.assert_allclose(np.diag(pc), model.explained_variance,
                               rtol=1e-8)
    assert abs(pc[0, 1]) < 1e-8


def test_whiten_unit_variance_and_nulls(spark):
    rng = np.random.RandomState(9)
    mat = rng.randn(300, 3) * [4.0, 1.0, 0.2]
    df = _emb_df(spark, mat)
    model = fit_pca(df, k=3)
    out = project_pca(df, model, whiten=True).collect()
    got = np.array([r["pca"] for r in out])
    np.testing.assert_allclose(got.var(axis=0, ddof=1),
                               np.ones(3), rtol=1e-6)
    with_null = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<double>")
    res = project_pca(with_null, model).collect()[0]
    assert res["pca"] is None
