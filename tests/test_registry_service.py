"""Registry HTTP service (feathr_spark/registry_service.py) — the
reference registry API surface (registry/sql-registry/main.py) over the
client's JSON project documents, exercised through real HTTP."""
from __future__ import annotations

import json
import urllib.request
from urllib.error import HTTPError

import pytest

from feathr_spark.client import FeathrClient
from feathr_spark.definitions import (Anchor, DerivedFeature, Source,
                                      SWAFeature, WindowSpec)
from feathr_spark.registry_service import serve_registry


@pytest.fixture(scope="module")
def service(spark, sf_dir, tmp_path_factory):
    reg = str(tmp_path_factory.mktemp("registry"))
    c = FeathrClient(spark, registry_dir=reg)
    src = Source(path=f"{sf_dir}/events.parquet", timestamp_col="ts",
                 timestamp_format="timestamp")
    anchor = Anchor(
        "events_anchor", src, keys=["user_id"],
        features=[SWAFeature("v_sum_1h", "SUM", "value", WindowSpec(3600)),
                  SWAFeature("n_1d", "COUNT", "value", WindowSpec(86400))])
    c.build_features(
        anchor_list=[anchor],
        derived_feature_list=[
            DerivedFeature("v_avg_like", "v_sum_1h / greatest(n_1d, 1)",
                           inputs=("v_sum_1h", "n_1d"))])
    c.register_features("proj_http")
    srv = serve_registry(reg, port=0)
    host, port = srv.server_address
    yield f"http://{host}:{port}", reg
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def test_projects_and_graph(service):
    base, _ = service
    assert _get(f"{base}/projects") == ["proj_http"]
    g = _get(f"{base}/projects/proj_http")
    types = {n["type"] for n in g["nodes"]}
    assert {"project", "source", "anchor", "anchor_feature",
            "derived_feature"} <= types
    etypes = {e["type"] for e in g["edges"]}
    assert {"Contains", "Consumes", "Produces"} <= etypes


def test_features_search_paging_and_detail(service):
    base, _ = service
    names = [f["name"] for f in _get(f"{base}/projects/proj_http/features")]
    assert sorted(names) == ["n_1d", "v_avg_like", "v_sum_1h"]
    hits = _get(f"{base}/projects/proj_http/features?keyword=avg")
    assert [f["name"] for f in hits] == ["v_avg_like"]
    page1 = _get(f"{base}/projects/proj_http/features?page=1&limit=2")
    page2 = _get(f"{base}/projects/proj_http/features?page=2&limit=2")
    assert len(page1) == 2 and len(page2) == 1
    f = _get(f"{base}/features/proj_http/v_sum_1h")
    assert f["project"] == "proj_http" and f["agg"] == "SUM"
    lin = _get(f"{base}/features/v_avg_like/lineage")
    ids = {n["id"] for n in lin["nodes"]}
    assert any("v_sum_1h" in i for i in ids)


def test_datasources_and_errors(service):
    base, _ = service
    ds = _get(f"{base}/projects/proj_http/datasources")
    assert len(ds) == 1 and ds[0]["type"] == "source"
    with pytest.raises(HTTPError) as e:
        _get(f"{base}/projects/nope")
    assert e.value.code == 404
    with pytest.raises(HTTPError) as e:
        _get(f"{base}/features/ghost_feature")
    assert e.value.code == 404


def test_post_project_roundtrip(service):
    base, reg = service
    doc = _get(f"{base}/projects/proj_http")  # graph, not the raw doc
    raw = json.load(open(f"{reg}/proj_http.json"))
    raw["project"] = "proj_copy"
    req = urllib.request.Request(
        f"{base}/projects", data=json.dumps(raw).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["guid"] == "proj_copy"
    assert _get(f"{base}/projects") == ["proj_copy", "proj_http"]
    assert [f["name"] for f in
            _get(f"{base}/projects/proj_copy/features?keyword=sum")] == \
        ["v_sum_1h"]
    assert doc["project"] == "proj_http"


def test_dependents_and_delete(service):
    base, reg = service
    # v_avg_like consumes v_sum_1h -> it is a dependent
    deps = _get(f"{base}/dependent/proj_http/v_sum_1h")
    assert [d["name"] for d in deps] == ["v_avg_like"]
    assert _get(f"{base}/dependent/proj_http/v_avg_like") == []

    # deleting a feature with dependents -> 412 (reference main.py:100)
    req = urllib.request.Request(f"{base}/entity/proj_http/v_sum_1h",
                                 method="DELETE")
    with pytest.raises(HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 412

    # leaf deletion works and the feature disappears
    req = urllib.request.Request(f"{base}/entity/proj_http/v_avg_like",
                                 method="DELETE")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["deleted"] == "v_avg_like"
    names = [f["name"] for f in _get(f"{base}/projects/proj_http/features")]
    assert "v_avg_like" not in names
    # now the base feature is deletable
    req = urllib.request.Request(f"{base}/entity/proj_http/v_sum_1h",
                                 method="DELETE")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["deleted"] == "v_sum_1h"
