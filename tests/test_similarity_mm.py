"""Similarity search + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from feathr_spark.multimodal.binaryops import (
    deterministic_fake_decoder,
    extract_features,
    make_fake_media,
    resize_images,
    sample_frames,
)
from feathr_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    cosine_sim,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cosine_expr_matches_numpy(emb):
    rows = emb.limit(2).collect()
    a, b = np.array(rows[0]["embedding"]), np.array(rows[1]["embedding"])
    want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    two = emb.limit(2).agg(F.collect_list("embedding").alias("vs")).select(
        cosine_sim(F.col("vs")[0], F.col("vs")[1]).alias("c")).first()
    assert abs(two["c"] - want) < 1e-5


def test_brute_force_topk_exact(emb):
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = [mat[0].tolist(), mat[7].tolist()]
    got = brute_force_topk(emb, queries, k=5).toPandas()
    assert set(got.query_id) == {0, 1}
    for qi, src in [(0, 0), (1, 7)]:
        q = matn[src]
        scores = matn @ q
        want_ids = set(pdf["vec_id"].to_numpy()[np.argsort(-scores)[:5]])
        got_ids = set(got[got.query_id == qi]["vec_id"])
        assert got[got.query_id == qi].iloc[0]["vec_id"] == pdf["vec_id"][src]
        assert len(got_ids & want_ids) >= 4  # ties at equal score may swap


def test_ann_lsh_recall(spark):
    # clustered corpus: LSH recall is only meaningful when true neighbors
    # are actually closer than random (uniform embeddings have no winners)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 32)).astype(np.float32) * 3
    vecs = np.concatenate([
        c + rng.standard_normal((40, 32)).astype(np.float32) * 0.3 for c in centers
    ])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    queries = [vecs[0].tolist(), vecs[40].tolist(), vecs[200].tolist()]
    exact = brute_force_topk(df, queries, k=5).toPandas()
    approx = ann_topk_lsh(df, queries, dim=32, k=5, n_bits=10, n_probe_bits=2).toPandas()
    recalls = []
    for qi in range(len(queries)):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(e & a) / 5)
    # self-match always found (query bucket == its own bucket)
    for qi, src in enumerate([0, 40, 200]):
        assert src in set(approx[approx.query_id == qi]["vec_id"])
    assert np.mean(recalls) >= 0.7


def test_embedding_near_dup(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(32).astype(np.float32)
    rows = [
        (1, (base / np.linalg.norm(base)).tolist()),
        (2, (base / np.linalg.norm(base) * 2.0).tolist()),      # same direction
        (3, rng.standard_normal(32).astype(np.float32).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, dim=32, threshold=0.99).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]


def test_multimodal_extract(spark):
    media = make_fake_media(spark, n=30)
    feats = extract_features(media, feature_dim=16, decoder=deterministic_fake_decoder)
    pdf = feats.toPandas()
    assert len(pdf) == 30
    assert pdf["decode_error"].isna().all()
    assert all(len(v) == 16 for v in pdf["feature"])
    # determinism
    pdf2 = extract_features(media, feature_dim=16, decoder=deterministic_fake_decoder).toPandas()
    a = np.stack(pdf.sort_values("media_id")["feature"].to_numpy())
    b = np.stack(pdf2.sort_values("media_id")["feature"].to_numpy())
    assert np.array_equal(a, b)


def test_multimodal_stub_raises_into_error_column(spark):
    media = make_fake_media(spark, n=4)
    out = extract_features(media).toPandas()  # default real_decoder stub
    assert out["feature"].isna().all()
    assert out["decode_error"].str.contains("NotImplementedError").all()


def test_resize_and_frames(spark):
    media = make_fake_media(spark, n=6)
    r = resize_images(media, 4, 3, decoder=deterministic_fake_decoder).toPandas()
    assert (r["width"] == 4).all() and (r["height"] == 3).all()
    assert all(len(p) == 4 * 3 * 4 for p in r["payload"])  # float32 bytes
    fr = sample_frames(media, every_n=10)
    counts = fr.groupBy("media_id").count().collect()
    assert all(c["count"] == 3 for c in counts)  # 30 frames / 10


def test_ivf_topk_recall(spark, emb):
    """IVF ANN with generous probes recovers most of the exact top-k
    (scale path: candidate set ~ n_probe/n_centroids of the corpus)."""
    from feathr_spark.operators.similarity import brute_force_topk, ivf_topk

    queries = [r["embedding"] for r in emb.where(F.col("vec_id") < 5)
               .orderBy("vec_id").collect()]
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=8)
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.7, f"recall {recall}"
    # every query answered with exactly k rows
    cnt = {r["query_id"]: r["count"]
           for r in approx.groupBy("query_id").count().collect()}
    assert all(v == 5 for v in cnt.values())


def test_ivf_assign_partitions_corpus(spark, emb):
    from feathr_spark.operators.similarity import _fit_centroids, ivf_assign

    sample = np.stack([r["embedding"] for r in emb.limit(200).collect()])
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = _fit_centroids(sample.astype(np.float32), 8, 3, seed=1)
    assigned = ivf_assign(emb, cent)
    cells = assigned.groupBy("ivf_cell").count().collect()
    assert all(0 <= r["ivf_cell"] < 8 for r in cells)
    assert assigned.count() == emb.count()


def test_quantize_embeddings_roundtrip(spark, emb):
    """Dequantized vectors approximate originals within the 1/127 step;
    zero/null vectors quantize cleanly to scale 0."""
    from feathr_spark.operators.similarity import quantize_embeddings

    out = quantize_embeddings(emb.select("vec_id", "embedding")).limit(50).collect()
    for r in out:
        x = np.array(r["embedding"], dtype=np.float64)
        q = np.array(r["q8"], dtype=np.float64)
        s = r["q8_scale"]
        if s == 0:
            assert np.all(q == 0)
            continue
        err = np.abs(q * s - x)
        assert err.max() <= s * 0.5 + 1e-9
    z = spark.createDataFrame([(1, [0.0, 0.0]), (2, None)],
                              "vec_id long, embedding array<double>")
    zr = {r["vec_id"]: r for r in quantize_embeddings(z).collect()}
    assert zr[1]["q8_scale"] == 0.0 and list(zr[1]["q8"]) == [0, 0]
    assert zr[2]["q8"] is None and zr[2]["q8_scale"] == 0.0


def test_repetition_features(spark):
    from feathr_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [(1, "a b\na b\nc d"),        # 3 lines, 2 distinct -> 1/3 dup
         (2, "x y x y x y"),          # bigrams: 'x y'x3,'y x'x2 -> 3/5
         (3, "unique words only"),
         (4, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert abs(rows[1]["dup_line_frac"] - 1 / 3) < 1e-9
    assert abs(rows[2]["top_bigram_frac"] - 3 / 5) < 1e-9
    assert rows[3]["dup_line_frac"] == 0.0
    assert rows[4]["dup_line_frac"] == 0.0 and rows[4]["top_bigram_frac"] == 0.0


def _planted_corpus(spark, n_clusters=5, per_cluster=40, n_dups=15, seed=7):
    """Clustered vectors plus near-identical copies (cos > 0.999) of
    the first n_dups vectors — the semantic-dedup regime."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, 32))
    base = np.repeat(centers, per_cluster, axis=0) + rng.normal(
        scale=0.15, size=(n_clusters * per_cluster, 32))
    dups = base[:n_dups] + rng.normal(scale=1e-3, size=(n_dups, 32))
    V = np.vstack([base, dups])
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(V)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), len(base)


@pytest.mark.parametrize("strategy", ["lsh", "ivf", "kmeans"])
def test_semantic_dedup_scale_strategies_full_recall(spark, strategy):
    from feathr_spark.operators.similarity import semantic_dedup, semantic_dedup_pairs

    df, n_base = _planted_corpus(spark)
    exact = {(r["id_a"], r["id_b"]) for r in semantic_dedup_pairs(
        df, dim=32, threshold=0.999, strategy="exact",
        id_col="vec_id", vec_col="v").collect()}
    assert len(exact) >= 15  # every planted dup pairs with its source
    got = {(r["id_a"], r["id_b"]) for r in semantic_dedup_pairs(
        df, dim=32, threshold=0.999, strategy=strategy,
        id_col="vec_id", vec_col="v", n_centroids=8, sample_size=1000).collect()}
    # bucketed candidates are a subset of exact (same verify threshold)
    assert got <= exact
    # near-identical vectors co-bucket: full recall in the dedup regime
    assert got == exact
    kept = semantic_dedup(df, dim=32, threshold=0.999, strategy=strategy,
                          id_col="vec_id", vec_col="v",
                          n_centroids=8, sample_size=1000)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    dropped = {b for _, b in exact}
    assert kept_ids == set(range(n_base + 15)) - dropped
    # every planted copy (id >= n_base) was dropped, no original lost
    assert all(d >= n_base for d in dropped)


def test_semantic_dedup_unknown_strategy(spark):
    from feathr_spark.operators.similarity import semantic_dedup_pairs

    df, _ = _planted_corpus(spark, n_clusters=1, per_cluster=3, n_dups=1)
    with pytest.raises(ValueError):
        semantic_dedup_pairs(df, dim=32, strategy="bogus",
                             id_col="vec_id", vec_col="v").collect()


def test_bmp_roundtrip_numpy():
    """encode_bmp -> decode_bmp is exact for grayscale (R=G=B) pixels."""
    from feathr_spark.multimodal.binaryops import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (3, 5), (7, 4), (16, 16)]:
        gray = (rng.integers(0, 256, size=(h, w))).astype(np.float32)
        back = decode_bmp(encode_bmp(gray))
        assert back.shape == (h, w)
        # luma of (g,g,g) == g exactly up to float32 coeff rounding
        assert np.allclose(back, gray, atol=0.01)


def test_ppm_decode():
    from feathr_spark.multimodal.binaryops import decode_ppm

    # 2x2 P5 grayscale with a comment in the header
    payload = b"P5\n# comment\n2 2\n255\n" + bytes([0, 64, 128, 255])
    arr = decode_ppm(payload)
    assert arr.shape == (2, 2)
    assert arr.tolist() == [[0.0, 64.0], [128.0, 255.0]]
    # 1x2 P6 RGB: pure red and pure white
    p6 = b"P6 2 1 255 " + bytes([255, 0, 0, 255, 255, 255])
    arr6 = decode_ppm(p6)
    assert arr6.shape == (1, 2)
    assert abs(arr6[0, 0] - 0.299 * 255) < 0.01 and abs(arr6[0, 1] - 255) < 0.01


def test_multimodal_real_bmp_end_to_end(spark):
    """Real image bytes -> default real_decoder -> width/height/mean
    features, all through the Arrow mapInPandas plumbing (no fakes)."""
    from feathr_spark.multimodal.binaryops import decode_bmp, image_stats, make_bmp_media

    media = make_bmp_media(spark, n=24)
    stats = image_stats(media).toPandas().sort_values("media_id")
    assert stats["decode_error"].isna().all()
    # meta carries the true dims; decoded dims must agree
    meta = media.select("media_id", "meta.width", "meta.height").toPandas().sort_values("media_id")
    assert stats["width"].tolist() == meta["width"].tolist()
    assert stats["height"].tolist() == meta["height"].tolist()
    # spot-check the mean against a local decode of the same bytes
    row = media.where(F.col("media_id") == 5).first()
    local = decode_bmp(bytes(row["payload"]))
    got = float(stats[stats.media_id == 5]["mean_pixel"].iloc[0])
    assert abs(got - float(local.mean())) < 1e-4
    # extract_features also runs green on real bytes with the default decoder
    feats = extract_features(media, feature_dim=8).toPandas()
    assert feats["decode_error"].isna().all()
    assert all(len(v) == 8 for v in feats["feature"])


# ---------------------------------------------------------------------------
# semantic benchmark contamination
# ---------------------------------------------------------------------------


def test_semantic_contamination_flags_and_ties(spark):
    import numpy as np
    from feathr_spark.operators.similarity import (decontaminate_semantic,
                                                   semantic_contamination)

    rng = np.random.default_rng(7)
    b0 = rng.normal(size=8); b0 /= np.linalg.norm(b0)
    b1 = rng.normal(size=8); b1 /= np.linalg.norm(b1)
    near = (b0 + 0.05 * rng.normal(size=8)); near /= np.linalg.norm(near)
    # orthonormalize the span of (b0, b1) before projecting out, so
    # far is exactly orthogonal to BOTH (b0 and b1 are not orthogonal
    # to each other)
    u1 = b1 - (b1 @ b0) * b0; u1 /= np.linalg.norm(u1)
    far = rng.normal(size=8); far -= (far @ b0) * b0; far -= (far @ u1) * u1
    far /= np.linalg.norm(far)
    bench = spark.createDataFrame(
        [(10, b0.tolist()), (11, b1.tolist())],
        "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame(
        [(0, near.tolist()),       # ~identical to bench 10
         (1, far.tolist()),        # orthogonal to both
         (2, b1.tolist())],        # exactly bench 11
        "vec_id long, embedding array<double>")

    out = {r["vec_id"]: r for r in
           semantic_contamination(corpus, bench, threshold=0.95,
                                  dtype="float64").collect()}
    assert out[0]["bench_id"] == 10 and out[0]["contaminated"]
    assert out[0]["max_cosine"] > 0.98
    assert not out[1]["contaminated"] and abs(out[1]["max_cosine"]) < 1e-9
    assert out[2]["bench_id"] == 11 and out[2]["max_cosine"] == pytest.approx(1.0)

    kept = decontaminate_semantic(corpus, bench, threshold=0.95,
                                  dtype="float64")
    assert [r["vec_id"] for r in kept.orderBy("vec_id").collect()] == [1]
    # all corpus columns survive the filter, including the embedding
    assert set(kept.columns) == {"vec_id", "embedding"}


def test_semantic_contamination_guards(spark):
    from feathr_spark.operators.similarity import semantic_contamination

    df = spark.createDataFrame([(0, [1.0, 0.0])],
                               "vec_id long, embedding array<double>")
    empty = df.where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination(df, empty)
    with pytest.raises(ValueError, match="max_bench"):
        semantic_contamination(df, df, max_bench=0)


def test_semantic_contamination_string_ids_and_vector_guards(spark):
    from feathr_spark.operators.similarity import semantic_contamination

    corpus = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])],
                                   "vec_id long, embedding array<double>")
    # string/uuid benchmark ids: output bench_id keeps the string type
    bench = spark.createDataFrame(
        [("eval-b", [1.0, 0.0]), ("eval-a", [0.0, 1.0])],
        "bench_id string, embedding array<double>")
    out = semantic_contamination(corpus, bench, bench_id_col="bench_id",
                                 bench_vec_col="embedding", threshold=0.9)
    assert dict(out.dtypes)["bench_id"] == "string"
    got = {r["vec_id"]: r["bench_id"] for r in out.collect()}
    assert got == {0: "eval-b", 1: "eval-a"}

    # unsupported id type -> clear error, not a numpy cast crash
    bench_bad = bench.select(F.array("bench_id").alias("bench_id"),
                             "embedding")
    with pytest.raises(ValueError, match="only integer and string ids"):
        semantic_contamination(corpus, bench_bad, bench_id_col="bench_id",
                               bench_vec_col="embedding")

    # null / ragged benchmark vectors -> clear error before np.stack
    bench_null = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", None)],
        "bench_id string, embedding array<double>")
    with pytest.raises(ValueError, match="null or ragged"):
        semantic_contamination(corpus, bench_null, bench_id_col="bench_id",
                               bench_vec_col="embedding")
    bench_ragged = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0])],
        "bench_id string, embedding array<double>")
    with pytest.raises(ValueError, match="null or ragged"):
        semantic_contamination(corpus, bench_ragged, bench_id_col="bench_id",
                               bench_vec_col="embedding")


def test_semantic_contamination_null_first_vector(spark):
    """The null/ragged guard must fire its clear ValueError even when
    the FIRST (smallest-id) benchmark row carries the null vector."""
    from feathr_spark.operators.similarity import semantic_contamination

    corpus = spark.createDataFrame([(0, [1.0, 0.0])],
                                   "vec_id long, embedding array<double>")
    bench = spark.createDataFrame(
        [("a", None), ("b", [1.0, 0.0])],
        "bench_id string, embedding array<double>")
    with pytest.raises(ValueError, match="null or ragged"):
        semantic_contamination(corpus, bench, bench_id_col="bench_id",
                               bench_vec_col="embedding")


def test_ivf_det_fit_recall_and_determinism(spark, emb):
    """The RNG-free fit mode (fit="det" — the hard-oracle path) keeps
    IVF recall, and two runs produce identical rows (the property that
    lets the DuckDB oracle replay the whole pipeline)."""
    from feathr_spark.operators.similarity import brute_force_topk, ivf_topk

    queries = [r["embedding"] for r in emb.where(F.col("vec_id") < 5)
               .orderBy("vec_id").collect()]
    exact = brute_force_topk(emb, queries, k=5, dtype="float64")
    a1 = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=8,
                  fit="det", dtype="float64")
    a2 = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=8,
                  fit="det", dtype="float64")
    ex = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    s1 = {(r["query_id"], r["vec_id"], round(r["score"], 9))
          for r in a1.collect()}
    s2 = {(r["query_id"], r["vec_id"], round(r["score"], 9))
          for r in a2.collect()}
    assert s1 == s2
    recall = len(ex & {(q, v) for q, v, _ in s1}) / len(ex)
    assert recall >= 0.7, f"recall {recall}"


def test_lsh_float64_matches_float32_buckets(spark, emb):
    """float64 bucketing (the oracle mode) agrees with float32 on
    virtually every row — the sign decisions differ only for dots
    within float32 rounding of zero."""
    from feathr_spark.operators.similarity import embedding_lsh_buckets

    b32 = embedding_lsh_buckets(emb, 64, n_bits=8, seed=7).select(
        "vec_id", F.col("lsh_bucket").alias("b32"))
    b64 = embedding_lsh_buckets(emb, 64, n_bits=8, seed=7,
                                dtype="float64").select(
        "vec_id", F.col("lsh_bucket").alias("b64"))
    j = b32.join(b64, "vec_id")
    n = j.count()
    same = j.where(F.col("b32") == F.col("b64")).count()
    assert same / n >= 0.99, f"{same}/{n}"
