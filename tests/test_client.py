"""FeathrClient façade: the reference's four-call user flow
(build_features -> get_offline_features -> materialize_features ->
get_online_features) driven in-session, checked against direct engine
calls on the same data (reference: feathr_project/feathr/client.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feathr_spark import (
    Anchor,
    DerivedFeature,
    FeathrClient,
    FeatureQuery,
    MaterializationSettings,
    ObservationSettings,
    Source,
    SWAFeature,
    WindowSpec,
)
from feathr_spark.materialize import BackfillTime


def _anchor(sf_dir):
    src = Source(path=f"{sf_dir}/events.parquet", fmt="parquet",
                 timestamp_col="ts", timestamp_format="timestamp")
    return Anchor(
        name="ev_swa", source=src, keys=["user_id"],
        features=[
            SWAFeature("v_sum_1h", "SUM", "value", WindowSpec(3600)),
            SWAFeature("n_1d", "COUNT", "value", WindowSpec(86400)),
        ],
    )


def _obs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id", "user_id", "ts"))


def test_client_offline_matches_direct_join(spark, sf_dir):
    client = FeathrClient(spark)
    client.build_features(
        anchor_list=[_anchor(sf_dir)],
        derived_feature_list=[
            DerivedFeature("v_avg_like", "v_sum_1h / greatest(n_1d, 1)",
                           inputs=("v_sum_1h", "n_1d"))],
    )
    settings = ObservationSettings(keys=["user_id"], timestamp_col="ts",
                                   timestamp_format="timestamp")
    got = client.get_offline_features(
        _obs(spark, sf_dir),
        FeatureQuery(["v_sum_1h", "v_avg_like"]), settings)
    # derived requested -> its inputs joined via closure, output pruned
    assert set(got.columns) == {"event_id", "user_id", "ts",
                                "v_sum_1h", "v_avg_like"}

    from feathr_spark import join_window_agg_features

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = join_window_agg_features(
        _obs(spark, sf_dir), ev, ["user_id"], ["user_id"], "ts", "ts",
        [SWAFeature("v_sum_1h", "SUM", "value", WindowSpec(3600)),
         SWAFeature("n_1d", "COUNT", "value", WindowSpec(86400))],
        obs_ts_format="timestamp", fact_ts_format="timestamp",
    ).withColumn("v_avg_like",
                 F.expr("v_sum_1h / greatest(n_1d, 1)"))

    def canon(df):
        return sorted(
            (r["event_id"],
             None if r["v_sum_1h"] is None else round(r["v_sum_1h"], 6),
             None if r["v_avg_like"] is None else round(r["v_avg_like"], 6))
            for r in df.select("event_id", "v_sum_1h", "v_avg_like").collect())

    assert canon(got) == canon(want)


def test_client_query_key_binding(spark, sf_dir):
    """A FeatureQuery key override binds that feature's anchor to a
    different observation key expression (the reference's key tags)."""
    client = FeathrClient(spark)
    client.build_features(anchor_list=[_anchor(sf_dir)])
    settings = ObservationSettings(keys=["user_id"], timestamp_col="ts",
                                   timestamp_format="timestamp")
    obs = _obs(spark, sf_dir).withColumn("uid2", F.col("user_id"))
    a = client.get_offline_features(
        obs, FeatureQuery(["v_sum_1h"], key=["uid2"]), settings)
    b = client.get_offline_features(
        obs, FeatureQuery(["v_sum_1h"]), settings)
    ca = sorted((r["event_id"], r["v_sum_1h"]) for r in
                a.select("event_id", "v_sum_1h").collect())
    cb = sorted((r["event_id"], r["v_sum_1h"]) for r in
                b.select("event_id", "v_sum_1h").collect())
    assert ca == cb  # same key values through the other column


def test_client_guards(spark, sf_dir):
    client = FeathrClient(spark)
    with pytest.raises(RuntimeError, match="build_features"):
        client.get_offline_features(
            _obs(spark, sf_dir), FeatureQuery(["x"]),
            ObservationSettings(keys=["user_id"], timestamp_col="ts"))
    a = _anchor(sf_dir)
    with pytest.raises(RuntimeError, match="conflict"):
        client.build_features(anchor_list=[
            a, Anchor(name="dup", source=a.source, keys=["user_id"],
                      features=[SWAFeature("v_sum_1h", "SUM", "value",
                                           WindowSpec(60))])])
    client.build_features(anchor_list=[a])
    with pytest.raises(KeyError, match="unknown feature"):
        client.get_offline_features(
            _obs(spark, sf_dir), FeatureQuery(["nope"]),
            ObservationSettings(keys=["user_id"], timestamp_col="ts"))


def test_client_materialize_and_online_roundtrip(spark, sf_dir, tmp_path):
    client = FeathrClient(spark, online_store_dir=str(tmp_path / "online"))
    client.build_features(anchor_list=[_anchor(sf_dir)])

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hi = ev.select(F.max(F.unix_timestamp(F.col("ts").cast("timestamp")))).first()[0]
    cutoff = int(hi) + 1
    settings = MaterializationSettings(
        name="ev_daily", feature_names=["v_sum_1h", "n_1d"],
        backfill_time=BackfillTime(cutoff - 3600, cutoff, 3600),
        sink_path=str(tmp_path / "sink"), online_table="ev_table")
    report = client.materialize_features(settings)
    assert len(report["written"]) == 2
    assert report["online_table"] == "ev_table"

    # resume: nothing rewritten
    report2 = client.materialize_features(settings)
    assert report2["written"] == [] and len(report2["skipped"]) == 2

    # online values == latest-cutoff snapshot values
    snap = spark.read.parquet(str(tmp_path / "sink") + f"/cutoff={cutoff}")
    row = snap.orderBy("key0").first()
    got = client.get_online_features("ev_table", row["key0"],
                                     ["v_sum_1h", "n_1d", "missing"])
    def _num(x):
        return None if x is None else round(float(x), 6)
    assert _num(got[0]) == _num(row["v_sum_1h"])
    assert got[1] == row["n_1d"]
    assert got[2] is None

    # batch form
    keys = [r["key0"] for r in snap.orderBy("key0").limit(3).collect()]
    multi = client.multi_get_online_features("ev_table", keys, ["n_1d"])
    want = {str(r["key0"]): [r["n_1d"]] for r in
            snap.where(F.col("key0").isin(keys)).collect()}
    assert multi == want


def test_client_materialize_rejects_multi_anchor(spark, sf_dir):
    client = FeathrClient(spark)
    a = _anchor(sf_dir)
    b = Anchor(name="other", source=a.source, keys=["user_id"],
               features=[SWAFeature("other_sum", "SUM", "value",
                                    WindowSpec(60))])
    client.build_features(anchor_list=[a, b])
    with pytest.raises(RuntimeError, match="one\\s+anchor"):
        client.materialize_features(MaterializationSettings(
            name="x", feature_names=["v_sum_1h", "other_sum"],
            backfill_time=BackfillTime(0, 0, 1)))


def test_client_registry_roundtrip(spark, sf_dir, tmp_path):
    """register_features -> fresh client -> get_features_from_registry
    rebuilds the same context: same feature list, same join results."""
    reg = str(tmp_path / "registry")
    c1 = FeathrClient(spark, registry_dir=reg)
    c1.build_features(
        anchor_list=[_anchor(sf_dir)],
        derived_feature_list=[
            DerivedFeature("v_avg_like", "v_sum_1h / greatest(n_1d, 1)",
                           inputs=("v_sum_1h", "n_1d"))])
    path = c1.register_features("proj_a")
    assert path.endswith("proj_a.json")

    c2 = FeathrClient(spark, registry_dir=reg)
    assert sorted(c2.list_registered_features("proj_a")) == [
        "n_1d", "v_avg_like", "v_sum_1h"]
    feats, keys = c2.get_features_from_registry("proj_a", return_keys=True)
    assert keys["v_sum_1h"] == ["user_id"]
    assert feats["v_sum_1h"].window.width == 3600

    settings = ObservationSettings(keys=["user_id"], timestamp_col="ts",
                                   timestamp_format="timestamp")
    q = FeatureQuery(["v_avg_like"])
    a = c1.get_offline_features(_obs(spark, sf_dir), q, settings)
    b = c2.get_offline_features(_obs(spark, sf_dir), q, settings)
    ca = sorted((r["event_id"],
                 None if r["v_avg_like"] is None else round(r["v_avg_like"], 6))
                for r in a.select("event_id", "v_avg_like").collect())
    cb = sorted((r["event_id"],
                 None if r["v_avg_like"] is None else round(r["v_avg_like"], 6))
                for r in b.select("event_id", "v_avg_like").collect())
    assert ca == cb

    with pytest.raises(KeyError, match="no registered project"):
        c2.get_features_from_registry("nope")


def test_client_registry_rejects_code_hooks(spark, sf_dir, tmp_path):
    a = _anchor(sf_dir)
    a.source.preprocessing = lambda df: df
    c = FeathrClient(spark, registry_dir=str(tmp_path / "reg"))
    c.build_features(anchor_list=[a])
    with pytest.raises(ValueError, match="code hook"):
        c.register_features()


def test_client_offline_fds_output(spark, sf_dir):
    """output_format='fds' re-encodes the requested feature columns into
    Quince-FDS tensors and leaves key/timestamp columns raw."""
    client = FeathrClient(spark)
    client.build_features(anchor_list=[_anchor(sf_dir)])
    settings = ObservationSettings(keys=["user_id"], timestamp_col="ts",
                                   timestamp_format="timestamp")
    raw = client.get_offline_features(
        _obs(spark, sf_dir), FeatureQuery(["v_sum_1h", "n_1d"]), settings)
    got = client.get_offline_features(
        _obs(spark, sf_dir), FeatureQuery(["v_sum_1h", "n_1d"]), settings,
        output_format="fds")
    dt = dict(got.dtypes)
    assert dt["v_sum_1h"] == "float" and dt["n_1d"] == "float"
    assert dt["user_id"] == dict(raw.dtypes)["user_id"]  # keys untouched
    assert client.last_inferred_feature_types == {
        "v_sum_1h": "NUMERIC", "n_1d": "NUMERIC"}
    r = {x["event_id"]: x for x in raw.collect()}
    g = {x["event_id"]: x for x in got.collect()}
    import numpy as np
    for eid, row in g.items():
        want = r[eid]["v_sum_1h"]
        if want is None:
            assert row["v_sum_1h"] is None
        else:
            assert np.isclose(row["v_sum_1h"], np.float32(want))


def test_registry_lineage_and_search(spark, sf_dir, tmp_path):
    """Project lineage graph + per-feature BFS mirror the reference
    registry's /projects/{p} and /features/{f}/lineage payloads
    (sql-registry db_registry.py:150-183, models.py:113-117)."""
    reg = str(tmp_path / "registry")
    c = FeathrClient(spark, registry_dir=reg)
    c.build_features(
        anchor_list=[_anchor(sf_dir)],
        derived_feature_list=[
            DerivedFeature("v_avg_like", "v_sum_1h / greatest(n_1d, 1)",
                           inputs=("v_sum_1h", "n_1d"))])
    c.register_features("proj_l")

    # search mirrors GET /projects/{p}/features?keyword=
    assert c.search_features("v_", "proj_l") == ["v_sum_1h", "v_avg_like"] \
        or sorted(c.search_features("v_", "proj_l")) == ["v_avg_like", "v_sum_1h"]
    assert c.search_features("nope", "proj_l") == []

    g = c.get_project_lineage("proj_l")
    types = {n["id"]: n["type"] for n in g["nodes"]}
    assert types["feature:v_sum_1h"] == "anchor_feature"
    assert types["feature:v_avg_like"] == "derived_feature"
    assert any(t == "source" for t in types.values())
    etypes = {(e["from"], e["to"], e["type"]) for e in g["edges"]}
    anchor_id = next(i for i, t in types.items() if t == "anchor")
    src_id = next(i for i, t in types.items() if t == "source")
    assert (anchor_id, src_id, "Consumes") in etypes
    assert (anchor_id, "feature:v_sum_1h", "Produces") in etypes
    assert ("feature:v_avg_like", "feature:v_sum_1h", "Consumes") in etypes

    # upstream of the derived feature reaches inputs -> anchor -> source
    lin = c.get_feature_lineage("v_avg_like", "proj_l")
    ids = {n["id"] for n in lin["nodes"]}
    assert {"feature:v_avg_like", "feature:v_sum_1h", "feature:n_1d",
            anchor_id, src_id} <= ids

    # downstream of an anchor feature reaches the derived feature
    lin2 = c.get_feature_lineage("v_sum_1h", "proj_l")
    assert "feature:v_avg_like" in {n["id"] for n in lin2["nodes"]}

    with pytest.raises(KeyError, match="not registered"):
        c.get_feature_lineage("ghost", "proj_l")


def test_lineage_unresolved_inputs_get_nodes(spark, sf_dir, tmp_path):
    """An edge to a feature no anchor/derived/lookup defines must still
    resolve against the nodes list (type 'unresolved'), not dangle."""
    reg = str(tmp_path / "registry")
    c = FeathrClient(spark, registry_dir=reg)
    c.build_features(
        anchor_list=[_anchor(sf_dir)],
        derived_feature_list=[
            DerivedFeature("odd", "v_sum_1h + ghost_feature",
                           inputs=("v_sum_1h", "ghost_feature"))])
    c.register_features("proj_g")
    g = c.get_project_lineage("proj_g")
    types = {n["id"]: n["type"] for n in g["nodes"]}
    assert types.get("feature:ghost_feature") == "unresolved"
    ids = {n["id"] for n in g["nodes"]}
    for e in g["edges"]:
        assert e["from"] in ids and e["to"] in ids
