"""SWA join: golden window-boundary tests (reference semantics:
SlidingWindowJoinIterator.scala:177-220), brute-force oracle
cross-check on the synthesized corpus, strategy equivalence, leakage.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feathr_spark import SWAFeature, WindowSpec
from feathr_spark.datagen import corpus
from feathr_spark.operators.swa import join_window_agg_features

STRATEGIES = ["union", "cogroup"]


@pytest.fixture(scope="module")
def toy(spark):
    obs = spark.createDataFrame(
        [
            (1, "a", 100.0, 0.5),
            (2, "a", 200.0, 0.6),
            (3, "b", 150.0, 0.7),
            (4, "c", 100.0, 0.8),  # key with no fact rows
            (5, None, 100.0, 0.9),  # null key
            (6, "a", 100.0, 1.0),  # duplicate (key, ts)
        ],
        "obs_id long, k string, ts double, label double",
    )
    fact = spark.createDataFrame(
        [
            ("a", 50.0, 1.0, "x"),
            ("a", 100.0, 2.0, "y"),  # exactly at obs ts (right-inclusive)
            ("a", 150.0, 3.0, "x"),
            ("a", 0.0, 7.0, "z"),  # exactly window before obs1 (left-exclusive)
            ("b", 149.0, 10.0, "x"),
            ("b", 150.0, None, "y"),  # null metric
        ],
        "k string, ts double, v double, cat string",
    )
    return obs, fact


FEATS = [
    SWAFeature("v_sum", "SUM", "v", WindowSpec(100)),
    SWAFeature("v_cnt", "COUNT", "v", WindowSpec(100)),
    SWAFeature("v_avg", "AVG", "v", WindowSpec(100)),
    SWAFeature("v_min", "MIN", "v", WindowSpec(100)),
    SWAFeature("v_max", "MAX", "v", WindowSpec(100)),
    SWAFeature("v_latest", "LATEST", "v", WindowSpec(100)),
    SWAFeature("v_timesince", "TIMESINCE", "v", WindowSpec(100)),
    SWAFeature("v_cd", "COUNT_DISTINCT", "cat", WindowSpec(100)),
    SWAFeature("v_sum_x", "SUM", "v", WindowSpec(100), filter="cat = 'x'"),
    SWAFeature("v_sum_delay", "SUM", "v", WindowSpec(100, delay=50)),
]

GOLDEN = {
    # obs 1: key a @100, window (0,100]: rows 50->1.0, 100->2.0 (0->7.0 excluded)
    1: dict(v_sum=3.0, v_cnt=2, v_avg=1.5, v_min=1.0, v_max=2.0, v_latest=2.0,
            v_timesince=0.0, v_cd=2, v_sum_x=1.0, v_sum_delay=1.0),
    # obs 2: key a @200, window (100,200]: 150->3.0 only
    2: dict(v_sum=3.0, v_cnt=1, v_avg=3.0, v_min=3.0, v_max=3.0, v_latest=3.0,
            v_timesince=50.0, v_cd=1, v_sum_x=3.0, v_sum_delay=3.0),
    # obs 3: key b @150, window (50,150]: 149->10.0, 150->null
    3: dict(v_sum=10.0, v_cnt=1, v_avg=10.0, v_min=10.0, v_max=10.0, v_latest=10.0,
            v_timesince=0.0, v_cd=2, v_sum_x=10.0, v_sum_delay=10.0),
    4: dict(v_sum=None, v_cnt=None, v_avg=None, v_min=None, v_max=None, v_latest=None,
            v_timesince=None, v_cd=None, v_sum_x=None, v_sum_delay=None),
    5: dict(v_sum=None, v_cnt=None, v_avg=None, v_min=None, v_max=None, v_latest=None,
            v_timesince=None, v_cd=None, v_sum_x=None, v_sum_delay=None),
    6: dict(v_sum=3.0, v_cnt=2, v_avg=1.5, v_min=1.0, v_max=2.0, v_latest=2.0,
            v_timesince=0.0, v_cd=2, v_sum_x=1.0, v_sum_delay=1.0),
}
# v_sum_delay for obs1 (@100, w=100 d=50): window (-50, 50]: rows 0->7.0, 50->1.0 => 8.0
GOLDEN[1]["v_sum_delay"] = 8.0
# obs2 (@200): window (50,150]: 100->2.0, 150->3.0 => 5.0
GOLDEN[2]["v_sum_delay"] = 5.0
# obs3 (b @150): window (0,100]: none => null
GOLDEN[3]["v_sum_delay"] = None
GOLDEN[6]["v_sum_delay"] = 8.0


def _check_golden(rows):
    for r in rows:
        exp = GOLDEN[r["obs_id"]]
        for name, want in exp.items():
            got = r[name]
            if want is None:
                assert got is None, f"obs {r['obs_id']} {name}: want null got {got}"
            else:
                assert got is not None and math.isclose(float(got), want, rel_tol=1e-9), \
                    f"obs {r['obs_id']} {name}: want {want} got {got}"


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_swa_golden(toy, strategy):
    obs, fact = toy
    out = join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", FEATS,
                                   strategy=strategy)
    _check_golden(out.collect())


def test_strategies_agree_on_corpus(spark):
    fact, obs = corpus(spark, sf=0.0005)
    feats = [
        SWAFeature("tok_sum_1d", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("ev_cnt_7d", "COUNT", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("tok_avg_7d", "AVG", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("tok_max_1d", "MAX", "n_tok", WindowSpec(86400)),
        SWAFeature("latest_src_7d", "LATEST", "source", WindowSpec(7 * 86400)),
        SWAFeature("ts_since", "TIMESINCE", "event_ts", WindowSpec(30 * 86400)),
        SWAFeature("src_cd_7d", "COUNT_DISTINCT", "source", WindowSpec(7 * 86400)),
        SWAFeature("web_cnt_7d", "COUNT", "n_tok", WindowSpec(7 * 86400), filter="source = 'web'"),
    ]
    kwargs = dict(obs_keys=["doc_id"], fact_keys=["doc_id"], obs_ts="ts",
                  fact_ts="event_ts", features=feats)
    a = join_window_agg_features(obs, fact, strategy="union", **kwargs) \
        .orderBy("obs_id").toPandas().set_index("obs_id")
    b = join_window_agg_features(obs, fact, strategy="cogroup", **kwargs) \
        .orderBy("obs_id").toPandas().set_index("obs_id")
    assert len(a) == len(b) == obs.count()
    for f in feats:
        av, bv = a[f.name], b[f.name]
        if av.dtype == object:
            assert (av.fillna("∅") == bv.fillna("∅")).all(), f.name
        else:
            assert np.allclose(av.astype(float).fillna(-1e18),
                               bv.astype(float).fillna(-1e18), rtol=1e-9), f.name


def test_bruteforce_oracle(spark):
    """Per-row pandas recompute — order-independent ground truth."""
    fact, obs = corpus(spark, sf=0.0005)
    w, d = 3 * 86400, 3600
    feats = [
        SWAFeature("s", "SUM", "n_tok", WindowSpec(w, d)),
        SWAFeature("c", "COUNT", "n_tok", WindowSpec(w, d)),
        SWAFeature("mn", "MIN", "n_tok", WindowSpec(w, d)),
        SWAFeature("mx", "MAX", "n_tok", WindowSpec(w, d)),
    ]
    got = join_window_agg_features(obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
                                   feats, strategy="cogroup") \
        .orderBy("obs_id").toPandas()
    fpd = fact.select("doc_id", "event_ts", "n_tok").toPandas()
    opd = obs.toPandas().sort_values("obs_id").reset_index(drop=True)
    by_key = dict(tuple(fpd.groupby("doc_id")))
    for _, r in opd.sample(n=min(300, len(opd)), random_state=0).iterrows():
        g = got[got.obs_id == r.obs_id].iloc[0]
        if r.doc_id is None or pd.isna(r.doc_id) or r.doc_id not in by_key:
            assert pd.isna(g.s) and pd.isna(g.c)
            continue
        kf = by_key[r.doc_id]
        in_w = kf[(kf.event_ts > r.ts - w - d) & (kf.event_ts <= r.ts - d)]
        if len(in_w) == 0:
            assert pd.isna(g.s), f"obs {r.obs_id}"
        else:
            assert math.isclose(g.s, in_w.n_tok.sum(), rel_tol=1e-9), f"obs {r.obs_id}"
            assert g.c == len(in_w)
            assert g.mn == in_w.n_tok.min() and g.mx == in_w.n_tok.max()


def test_no_temporal_leakage(spark):
    """Mutating every future fact row must not change any feature."""
    fact, obs = corpus(spark, sf=0.0003)
    feats = [SWAFeature("s", "SUM", "n_tok", WindowSpec(86400, delay=3600))]
    base = join_window_agg_features(obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
                                    feats).orderBy("obs_id").toPandas()
    # push every fact row's metric to an absurd value when it is in the
    # "future" of every obs for its doc: join-free approximation — shift
    # all fact timestamps forward past every window; features must go null
    from pyspark.sql import functions as F
    shifted = fact.withColumn("event_ts", F.col("event_ts") + F.lit(10**9))
    leaked = join_window_agg_features(obs, shifted, ["doc_id"], ["doc_id"], "ts",
                                      "event_ts", feats).orderBy("obs_id").toPandas()
    assert leaked["s"].isna().all()
    assert len(base) == len(leaked)


def test_grouped_topk_and_pooling(spark, toy):
    obs, fact = toy
    feats = [
        SWAFeature("by_cat", "SUM", "v", WindowSpec(1000), group_by="cat", limit=2),
        SWAFeature("cat_cnt", "COUNT", "v", WindowSpec(1000), group_by="cat"),
    ]
    out = join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", feats) \
        .orderBy("obs_id").collect()
    r2 = next(r for r in out if r["obs_id"] == 2)  # key a @200: all 4 rows in window
    pairs = {p["group"]: p["value"] for p in r2["by_cat"]}
    # sums: z=7 (t=0), x=1+3=4, y=2 -> top-2 = z,x
    assert pairs == {"z": 7.0, "x": 4.0}
    cnt = {p["group"]: p["value"] for p in r2["cat_cnt"]}
    assert cnt == {"x": 2.0, "y": 1.0, "z": 1.0}


def test_pooling(spark):
    obs = spark.createDataFrame([(1, "a", 100.0)], "obs_id long, k string, ts double")
    fact = spark.createDataFrame(
        [("a", 10.0, [1.0, 5.0]), ("a", 20.0, [3.0, 2.0]), ("a", 30.0, None)],
        "k string, ts double, vec array<double>",
    )
    feats = [
        SWAFeature("vmax", "MAX_POOLING", "vec", WindowSpec(100)),
        SWAFeature("vsum", "SUM_POOLING", "vec", WindowSpec(100)),
        SWAFeature("vavg", "AVG_POOLING", "vec", WindowSpec(100)),
    ]
    r = join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", feats).first()
    assert r["vmax"] == [3.0, 5.0]
    assert r["vsum"] == [4.0, 7.0]
    assert r["vavg"] == [2.0, 3.5]


def test_salted_cogroup_matches_unsalted(spark):
    fact, obs = corpus(spark, sf=0.0005)
    feats = [
        SWAFeature("s", "SUM", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("m", "MAX", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("lt", "LATEST", "n_tok", WindowSpec(7 * 86400)),
    ]
    kwargs = dict(obs_keys=["doc_id"], fact_keys=["doc_id"], obs_ts="ts",
                  fact_ts="event_ts", features=feats, strategy="cogroup")
    plain = join_window_agg_features(obs, fact, **kwargs).orderBy("obs_id").toPandas()
    salted = join_window_agg_features(obs, fact, hot_key_threshold=50, salt_buckets=4,
                                      **kwargs).orderBy("obs_id").toPandas()
    for c in ("s", "m", "lt"):
        assert np.allclose(plain[c].astype(float).fillna(-1),
                           salted[c].astype(float).fillna(-1), rtol=1e-9), c


def test_time_slice_salt_matches_replicate(spark):
    """Time-sliced salting (hot key chunked by window width, <=2 fact
    copies) must equal full replication AND the unsalted run — including
    per-feature delays, which widen the visibility span."""
    fact, obs = corpus(spark, sf=0.0005)
    feats = [
        SWAFeature("s1", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("s7", "SUM", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("cd", "COUNT_DISTINCT", "source", WindowSpec(7 * 86400)),
        SWAFeature("dl", "SUM", "n_tok", WindowSpec(2 * 86400, delay=86400)),
    ]
    kwargs = dict(obs_keys=["doc_id"], fact_keys=["doc_id"], obs_ts="ts",
                  fact_ts="event_ts", features=feats, strategy="cogroup")
    plain = join_window_agg_features(obs, fact, **kwargs).orderBy("obs_id").toPandas()
    sliced = join_window_agg_features(obs, fact, hot_key_threshold=50, salt_buckets=4,
                                      salt_mode="time_slice", **kwargs) \
        .orderBy("obs_id").toPandas()
    repl = join_window_agg_features(obs, fact, hot_key_threshold=50, salt_buckets=4,
                                    salt_mode="replicate", **kwargs) \
        .orderBy("obs_id").toPandas()
    for c in ("s1", "s7", "cd", "dl"):
        assert np.allclose(plain[c].astype(float).fillna(-1),
                           sliced[c].astype(float).fillna(-1), rtol=1e-9), c
        assert np.allclose(plain[c].astype(float).fillna(-1),
                           repl[c].astype(float).fillna(-1), rtol=1e-9), c


def test_negative_delay_salted_matches_unsalted(spark):
    """A negative delay lets an observation see FUTURE fact rows; the
    time-sliced salt must copy hot-key fact rows DOWN into earlier
    chunks (lo_shift) or matches silently vanish. Parity across
    unsalted / time-slice / replicate."""
    fact, obs = corpus(spark, sf=0.0005)
    feats = [
        SWAFeature("fw", "SUM", "n_tok", WindowSpec(2 * 86400, delay=-86400)),
        SWAFeature("bk", "SUM", "n_tok", WindowSpec(86400)),
    ]
    kwargs = dict(obs_keys=["doc_id"], fact_keys=["doc_id"], obs_ts="ts",
                  fact_ts="event_ts", features=feats, strategy="cogroup")
    plain = join_window_agg_features(obs, fact, **kwargs).orderBy("obs_id").toPandas()
    sliced = join_window_agg_features(obs, fact, hot_key_threshold=50, salt_buckets=4,
                                      salt_mode="time_slice", **kwargs) \
        .orderBy("obs_id").toPandas()
    repl = join_window_agg_features(obs, fact, hot_key_threshold=50, salt_buckets=4,
                                    salt_mode="replicate", **kwargs) \
        .orderBy("obs_id").toPandas()
    assert plain["fw"].notna().any()  # future-window matches actually exist
    for c in ("fw", "bk"):
        assert np.allclose(plain[c].astype(float).fillna(-1),
                           sliced[c].astype(float).fillna(-1), rtol=1e-9), c
        assert np.allclose(plain[c].astype(float).fillna(-1),
                           repl[c].astype(float).fillna(-1), rtol=1e-9), c


def test_slick_map_columns_hash_into_uid(spark):
    """Map-typed obs columns (top-level AND nested in an array) must not
    crash the content uid, and rows differing ONLY in a map — including
    when the JOIN KEY is read out of the map — keep distinct uids and
    get their own correct features."""
    obs = spark.createDataFrame(
        [(1, 10.0, {"k": "a"}, [{"t": "p"}]),
         (2, 10.0, {"k": "b"}, [{"t": "q"}])],  # differs only in maps
        "obs_id long, ts double, m map<string,string>, am array<map<string,string>>")
    fact = spark.createDataFrame(
        [("a", 5.0, 2.0), ("b", 5.0, 30.0)], "k string, ts double, v double")
    feats = [SWAFeature("vsum", "SUM", "v", WindowSpec(100))]
    out = join_window_agg_features(
        obs.withColumn("k", F.col("m")["k"]), fact, ["k"], ["k"], "ts", "ts",
        feats, slick=True).orderBy("obs_id").collect()
    assert [r["vsum"] for r in out] == [2.0, 30.0]


def test_release_caches(spark):
    """Operator-internal persists registered via track_cache are freed by
    feathr_spark.release_caches()."""
    import feathr_spark as fs
    from feathr_spark.operators.asof import asof_join

    obs = spark.createDataFrame([(1, "a", 100.0)], "obs_id long, k string, ts double")
    fact = spark.createDataFrame([("a", 50.0, 1.0)], "k string, ts double, v double")
    out = asof_join(obs, fact, ["k"], ["k"], "ts", "ts", ["v"], strategy="prune")
    assert out.count() == 1
    assert fs.release_caches() >= 1
    assert fs.release_caches() == 0  # registry drained


def test_defaults_and_simulate_delay(toy):
    obs, fact = toy
    feats = [SWAFeature("v_sum", "SUM", "v", WindowSpec(100), default=0.0)]
    out = join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", feats)
    vals = {r["obs_id"]: r["v_sum"] for r in out.collect()}
    assert vals[4] == 0.0 and vals[5] == 0.0 and vals[1] == 3.0


def test_swa_slick_parity(spark):
    """slick=True (uid-trimmed merge + wide join-back) must match the
    direct formulation row-for-row, preserving all observation columns."""
    from feathr_spark import SWAFeature, WindowSpec, join_window_agg_features
    from feathr_spark.datagen import corpus

    fact, obs = corpus(spark, sf=0.0005)
    feats = [SWAFeature("s1", "SUM", "n_tok", WindowSpec(86400)),
             SWAFeature("c1", "COUNT", "n_tok", WindowSpec(86400))]
    kw = dict(obs_ts_format="epoch", fact_ts_format="epoch")
    base = join_window_agg_features(
        obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats, **kw
    ).orderBy("obs_id").toPandas()
    slick = join_window_agg_features(
        obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats, slick=True, **kw
    ).orderBy("obs_id").toPandas()
    assert list(base.columns) == list(slick.columns)
    assert len(base) == len(slick)
    for c in ("obs_id", "label", "s1", "c1"):
        a = base[c].astype("float").fillna(-1).to_numpy()
        b = slick[c].astype("float").fillna(-1).to_numpy()
        assert np.allclose(a, b), c


def test_hot_key_estimators_agree(spark):
    """freq_items and precomputed hot-key lists both produce correct
    (parity with unsalted) results."""
    from feathr_spark import SWAFeature, WindowSpec, join_window_agg_features
    from feathr_spark.datagen import corpus

    fact, obs = corpus(spark, sf=0.0005)
    feats = [SWAFeature("s1", "SUM", "n_tok", WindowSpec(86400))]
    kw = dict(obs_ts_format="epoch", fact_ts_format="epoch", strategy="cogroup")
    base = join_window_agg_features(
        obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats, **kw
    ).orderBy("obs_id").toPandas()
    fi = join_window_agg_features(
        obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
        hot_key_threshold=50, hot_key_method="freq_items", salt_buckets=4, **kw
    ).orderBy("obs_id").toPandas()
    pre = join_window_agg_features(
        obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
        hot_keys_df=spark.createDataFrame([("doc_0",), ("doc_1",)], "doc_id string"),
        salt_buckets=4, **kw
    ).orderBy("obs_id").toPandas()
    for other, tag in ((fi, "freq_items"), (pre, "precomputed")):
        a = base["s1"].astype("float").fillna(-1).to_numpy()
        b = other["s1"].astype("float").fillna(-1).to_numpy()
        assert np.allclose(a, b), tag


def test_slick_no_checkpoint_and_duplicates(spark):
    """slick uid is content-derived: no localCheckpoint (ExistingRDD scan)
    in the plan, and bytewise-duplicate observation rows each survive the
    join-back with identical (correct) features."""
    from feathr_spark import join_window_agg_features

    # inputs built from spark.range (plans as Range): createDataFrame from
    # local rows ALSO scans as ExistingRDD, which would false-positive the
    # checkpoint assertion below. Row (k=1, ts=10) is duplicated.
    obs = spark.range(3).select(
        F.when(F.col("id") < 2, 1).otherwise(2).cast("long").alias("k"),
        F.when(F.col("id") < 2, 10).otherwise(25).cast("long").alias("ts"))
    fact = spark.range(3).select(
        F.when(F.col("id") < 2, 1).otherwise(2).cast("long").alias("k"),
        F.element_at(F.array(F.lit(5), F.lit(9), F.lit(20)),
                     (F.col("id") + 1).cast("int")).cast("long").alias("ts"),
        F.element_at(F.array(F.lit(2.0), F.lit(3.0), F.lit(7.0)),
                     (F.col("id") + 1).cast("int")).alias("v"))
    feats = [SWAFeature("vsum", "SUM", "v", WindowSpec(100))]
    out = join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", feats,
                                   slick=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, "localCheckpoint crept back into slick"
    rows = sorted([(r["k"], r["ts"], r["vsum"]) for r in out.collect()])
    assert rows == [(1, 10, 5.0), (1, 10, 5.0), (2, 25, 7.0)]


def test_freq_items_composite_keys_rejected(spark):
    from feathr_spark.operators.swa import _hot_keys, _with_keys_ts

    fact = spark.createDataFrame([(1, "a", 5)], "k1 long, k2 string, ts long")
    f2 = _with_keys_ts(fact, ["k1", "k2"], "ts", "epoch")
    with pytest.raises(ValueError, match="single-column"):
        _hot_keys(f2, 2, 10, method="freq_items")


def test_global_count_distinct_matches_loop():
    """Interval-stabbing COUNT_DISTINCT == the per-window np.unique
    reference on randomized multi-key buckets (incl. nulls, delays,
    obs keys with no facts, obs times outside the fact span)."""
    import numpy as np
    import pandas as pd

    from feathr_spark.operators import kernels

    rng = np.random.default_rng(7)
    for trial in range(3):
        nf, no, nk = 5000, 2000, 23
        fc = np.sort(rng.integers(0, nk, nf))
        fts_raw = rng.integers(0, 10**7, nf)
        ordf = np.lexsort((fts_raw, fc)); fc, fts = fc[ordf], fts_raw[ordf]
        oc = np.sort(rng.integers(0, nk + 3, no))
        ots_raw = rng.integers(-10**5, int(1.1e7), no).astype(np.int64)
        ordo = np.lexsort((ots_raw, oc)); oc, ots = oc[ordo], ots_raw[ordo]
        vals = rng.integers(0, 12, nf).astype(object)
        vals[rng.random(nf) < 0.1] = None
        codes, _ = pd.factorize(pd.Series(vals), use_na_sentinel=True)
        codes = codes.astype(np.int64)
        W = int(rng.integers(10**5, 5 * 10**6))
        D = int(rng.integers(0, 5 * 10**5)) if trial % 2 else 0
        got = kernels.global_count_distinct(fc, fts, oc, ots, codes, W, D)
        want = np.zeros(no, dtype=np.int64)
        o_starts, o_ends, f_los, f_his = kernels.key_segments(oc, fc)
        for gi in range(len(o_starts)):
            o0, o1 = o_starts[gi], o_ends[gi]
            fl, fh = f_los[gi], f_his[gi]
            if fh <= fl:
                continue
            lo, hi = kernels.window_bounds(fts[fl:fh], ots[o0:o1], W, D)
            c = codes[fl:fh]
            for i in range(o1 - o0):
                cc = c[lo[i]:hi[i]]
                cc = cc[cc >= 0]
                want[o0 + i] = len(np.unique(cc))
        assert (got == want).all(), f"trial {trial}"


def test_custom_aggregation_registry(spark):
    """register_aggregation: a user-defined RANGE agg (max - min) runs
    inside the cogroup kernel on per-key window slices; union strategy
    rejects it with a clear error."""
    import feathr_spark
    from feathr_spark.definitions import CUSTOM_AGGS

    def value_range(values, ts, lo, hi):
        out = np.full(len(lo), None, dtype=object)
        for i in range(len(lo)):
            w = [float(v) for v in values[lo[i]:hi[i]] if v is not None]
            if w:
                out[i] = max(w) - min(w)
        return out

    feathr_spark.register_aggregation("RANGE", value_range, dtype="double")
    try:
        obs = spark.createDataFrame([(1, 100), (2, 100)], "k long, ts long")
        fact = spark.createDataFrame(
            [(1, 50, 2.0), (1, 60, 7.0), (1, 90, 4.0), (2, 10, 1.0)],
            "k long, ts long, v double")
        feats = [SWAFeature("vrange", "RANGE", "v", WindowSpec(80))]
        out = join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", feats)
        rows = {r["k"]: r["vrange"] for r in out.collect()}
        assert rows[1] == 5.0  # window (20,100]: values 2,7,4
        assert rows[2] is None  # fact at ts=10 outside (20,100]
        with pytest.raises(ValueError, match="cogroup"):
            join_window_agg_features(obs, fact, ["k"], ["k"], "ts", "ts", feats,
                                     strategy="union")
        with pytest.raises(ValueError, match="built-in"):
            feathr_spark.register_aggregation("SUM", value_range)
    finally:
        CUSTOM_AGGS.pop("RANGE", None)


def test_cms_hot_keys_superset_of_exact(spark):
    """Count-min sketch estimator never MISSES a hot key (one-sided
    error); composite keys supported via tuple hashing."""
    from feathr_spark.operators.swa import _hot_keys, _with_keys_ts

    rows = [(1, "a", i) for i in range(300)] + \
           [(2, "b", i) for i in range(40)] + \
           [(i + 10, "c", i) for i in range(50)]
    fact = spark.createDataFrame(rows, "k1 long, k2 string, ts long")
    f2 = _with_keys_ts(fact, ["k1", "k2"], "ts", "epoch")
    exact = {(r["__k0"], r["__k1"])
             for r in _hot_keys(f2, 2, 100, method="exact").collect()}
    cms = {(r["__k0"], r["__k1"])
           for r in _hot_keys(f2, 2, 100, method="cms").collect()}
    assert exact == {(1, "a")}
    assert exact <= cms  # may over-report, never under-reports
    # over-reporting is bounded: eps=0.01 of 390 rows ~ 4 extra counts max
    assert (2, "b") not in cms


def test_null_key_rows_stay_off_the_global_composite():
    """Null-key/null-ts observations carry per-row-unique __nk ids; left
    inside the kernel's composite key codes they inflate cardinality by
    the null-row count and trip the int64-composite overflow guard,
    silently demoting EVERY bucket to the per-key fallback loop
    (measured 3-5x kernel cost at sf8 with a 1%-null-key corpus). The
    kernel must answer them directly (all-null features) and keep the
    global searchsorted path for the valid rows."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    from feathr_spark.operators import kernels, swa

    n = 4000
    rng = np.random.default_rng(3)
    DAY = 86_400_000_000
    fact = pd.DataFrame({
        "__k0": [f"k{i % 300}" for i in range(n)],
        "__ts": rng.integers(0, 30 * DAY, n),
        "__nk": np.zeros(n, dtype=np.int64),
        "__m0": rng.random(n) * 10,
    })
    nk = np.where(np.arange(n) % 2 == 1, np.arange(n) + 1, 0)
    obs = pd.DataFrame({
        "__k0": [f"k{i % 300}" if i % 2 == 0 else None for i in range(n)],
        "obs_id": np.arange(n),
        "__ts": rng.integers(0, 31 * DAY, n),
        "__nk": nk.astype(np.int64),
    })
    obs_schema = T.StructType([
        T.StructField("__k0", T.StringType()), T.StructField("obs_id", T.LongType()),
        T.StructField("__ts", T.LongType()), T.StructField("__nk", T.LongType())])
    out_schema = T.StructType(list(obs_schema.fields) + [
        T.StructField("vsum", T.DoubleType()), T.StructField("vcd", T.LongType())])
    specs = [dict(name="vsum", agg="SUM", metric="__m0", group_col=None,
                  width_us=7 * DAY, delay_us=0, limit=None),
             dict(name="vcd", agg="COUNT_DISTINCT", metric="__m0", group_col=None,
                  width_us=7 * DAY, delay_us=0, limit=None)]
    kern = swa._make_kernel(obs_schema, out_schema, specs, ["__k0", "__nk"])

    calls = {"global": 0, "fallback": 0}
    orig = kernels.global_window_bounds

    def spy(*a, **k):
        r = orig(*a, **k)
        calls["global" if r is not None else "fallback"] += 1
        return r

    kernels.global_window_bounds = spy
    try:
        res = kern(obs, fact)
    finally:
        kernels.global_window_bounds = orig
    # the __nk cardinality (n/2 unique ids x 300 keys over a month-span
    # micro timeline) would overflow the span composite if it leaked in
    assert calls["global"] > 0 and calls["fallback"] == 0
    assert len(res) == n
    by_id = res.set_index("obs_id")
    odd = by_id.loc[[i for i in range(1, n, 2)]]
    assert odd["vsum"].isna().all() and odd["vcd"].isna().all()
    even = by_id.loc[[i for i in range(0, n, 2)]]
    assert even["vsum"].notna().any()


def test_rank_compressed_composite_tier_matches_span_tier():
    """When key-cardinality x timestamp-span overflows int64, the global
    kernels fall back to rank-compressed composites, not the per-key
    loop; results must be identical to the span tier on the same data
    (exercised by scaling timestamps+widths 10^6x, which preserves every
    window membership)."""
    import numpy as np

    from feathr_spark.operators import kernels

    rng = np.random.default_rng(11)
    nf, no, nk = 8000, 3000, 40
    fc = np.sort(rng.integers(0, nk, nf))
    fts_raw = rng.integers(0, 10**7, nf)
    ordf = np.lexsort((fts_raw, fc)); fc, fts = fc[ordf], fts_raw[ordf]
    oc = np.sort(rng.integers(0, nk + 3, no))
    ots_raw = rng.integers(-10**5, int(1.1e7), no).astype(np.int64)
    ordo = np.lexsort((ots_raw, oc)); oc, ots = oc[ordo], ots_raw[ordo]
    W, D = 2 * 10**6, 3 * 10**5
    S = 4 * 10**11  # scale => span*kmax >> 2^62 => rank tier
    lo1, hi1 = kernels.global_window_bounds(fc, fts, oc, ots, W, D)
    lo2, hi2 = kernels.global_window_bounds(fc, fts * S, oc, ots * S, W * S, D * S)
    assert (lo1 == lo2).all() and (hi1 == hi2).all()

    vals = rng.integers(0, 9, nf).astype(np.int64)
    cd1 = kernels.global_count_distinct(fc, fts, oc, ots, vals, W, D)
    cd2 = kernels.global_count_distinct(fc, fts * S, oc, ots * S, vals, W * S, D * S)
    assert (cd1 == cd2).all()

    i1, ok1 = kernels.global_asof_indices(fc, fts, oc, ots, D)
    i2, ok2 = kernels.global_asof_indices(fc, fts * S, oc, ots * S, D * S)
    assert (ok1 == ok2).all() and (i1[ok1] == i2[ok2]).all()


def test_salted_union_matches_unsalted_and_cogroup(spark):
    """Round-4: the pure-JVM union path gains hot-key salting (same
    _salt machinery as cogroup — __salt joins the window partition).
    Parity across unsalted union / salted union (both salt modes) /
    salted cogroup, incl. a delayed window and COUNT_DISTINCT."""
    fact, obs = corpus(spark, sf=0.0005)
    feats = [
        SWAFeature("s1", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("a7", "AVG", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("lt", "LATEST", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("cd", "COUNT_DISTINCT", "source", WindowSpec(7 * 86400)),
        SWAFeature("dl", "SUM", "n_tok", WindowSpec(2 * 86400, delay=86400)),
    ]
    kwargs = dict(obs_keys=["doc_id"], fact_keys=["doc_id"], obs_ts="ts",
                  fact_ts="event_ts", features=feats)
    plain = join_window_agg_features(obs, fact, strategy="union", **kwargs) \
        .orderBy("obs_id").toPandas()
    for mode in ("time_slice", "replicate"):
        salted = join_window_agg_features(
            obs, fact, strategy="union", hot_key_threshold=50,
            salt_buckets=4, salt_mode=mode, **kwargs) \
            .orderBy("obs_id").toPandas()
        for c in ("s1", "a7", "lt", "cd", "dl"):
            assert np.allclose(plain[c].astype(float).fillna(-1),
                               salted[c].astype(float).fillna(-1),
                               rtol=1e-9), (mode, c)
    cg = join_window_agg_features(obs, fact, strategy="cogroup",
                                  hot_key_threshold=50, salt_buckets=4,
                                  **kwargs).orderBy("obs_id").toPandas()
    for c in ("s1", "a7", "lt", "cd", "dl"):
        assert np.allclose(plain[c].astype(float).fillna(-1),
                           cg[c].astype(float).fillna(-1), rtol=1e-9), c
