"""Reference-shaped Python client façade.

Reference: ``feathr_project/feathr/client.py`` — ``FeathrClient``
(:62-80), ``build_features`` (:241-299), ``get_offline_features``
(:497-616), ``materialize_features`` (:718-760), ``get_online_features``
(:322-340); ``FeatureQuery`` from ``definition/query_feature_list.py``;
``MaterializationSettings`` from ``definition/materialization_settings.py``.

The reference client renders HOCON configs and SUBMITS a remote Spark
job; this façade drives the same four-call user flow in-session against
the engine's native planner/materializer, so a reference user's script
structure ports line-for-line:

    client = FeathrClient(spark)
    client.build_features(anchor_list=[...], derived_feature_list=[...])
    df = client.get_offline_features(obs, FeatureQuery([...]), settings)
    client.materialize_features(MaterializationSettings(...), fact)
    client.get_online_features("table", "user42", ["f_sum"])

Reference users with existing HOCON configs load them through
``feathr_spark.config`` instead (``load_feature_def`` +
``run_join_config`` — the two surfaces share the planner underneath).

Scale notes: ``get_offline_features`` is one
:func:`~feathr_spark.plans.planner.join_features` plan (per-stage
checkpoint knob for 50-anchor DAGs); ``materialize_features`` runs the
resumable per-cutoff :func:`~feathr_spark.materialize.materialize` with
lineage manifests; the online push is the embarrassingly-parallel
:func:`~feathr_spark.sources.online.write_online` per-partition path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from feathr_spark.definitions import (
    Anchor,
    DerivedFeature,
    LookupFeature,
    ObservationSettings,
    SWAFeature,
)
from feathr_spark.materialize import BackfillTime, GenSpec, materialize
from feathr_spark.sources.online import (
    LocalOnlineStore,
    decode_online_value,
    online_key_column,
    write_online,
)


@dataclass(frozen=True)
class FeatureQuery:
    """A list of requested features and the observation key expressions
    they join on (reference: definition/query_feature_list.py — the
    ``key`` is the reference's TypedKey list; here SQL expressions over
    observation columns, None = the ObservationSettings default keys)."""

    feature_list: Sequence[str]
    key: Optional[Sequence[str]] = None


@dataclass
class MaterializationSettings:
    """What to materialize and where (reference:
    definition/materialization_settings.py:21-64). ``sink_path`` is the
    offline snapshot store (per-cutoff lineage-manifest partitions);
    ``online_table`` additionally pushes the LATEST cutoff to the online
    store under that table name."""

    name: str
    feature_names: Sequence[str]
    backfill_time: BackfillTime
    sink_path: Optional[str] = None
    online_table: Optional[str] = None


class FeathrClient:
    """In-session driver for the reference client's user flow."""

    def __init__(
        self,
        spark: SparkSession,
        online_store_dir: Optional[str] = None,
        online_client_factory=None,
        registry_dir: Optional[str] = None,
    ):
        self.spark = spark
        self._registry_dir = registry_dir
        if online_client_factory is not None:
            self._online = online_client_factory
        else:
            if online_store_dir is None:
                import tempfile

                online_store_dir = tempfile.mkdtemp(prefix="feathr_online_")
            self._online = LocalOnlineStore(online_store_dir)
        self.anchor_list: list = []
        self.derived_feature_list: list = []
        self.lookup_feature_list: list = []
        self._built = False

    # -- build ----------------------------------------------------------
    def build_features(
        self,
        anchor_list: Sequence[Anchor] = (),
        derived_feature_list: Sequence[Union[DerivedFeature, LookupFeature]] = (),
    ) -> None:
        """Register the feature context (reference client.py:241-299;
        must precede get_offline_features / materialize_features, same
        contract as the reference's RuntimeError at client.py:556-560).
        Duplicate feature names across anchors/deriveds raise, mirroring
        the reference's conflict check (client.py:525-536)."""
        anchors = list(anchor_list)
        derived = [d for d in derived_feature_list
                   if isinstance(d, DerivedFeature)]
        lookups = [d for d in derived_feature_list
                   if isinstance(d, LookupFeature)]
        seen: dict = {}
        for a in anchors:
            for f in a.features:
                if f.name in seen:
                    raise RuntimeError(
                        f"feature name conflict: {f.name!r} defined by "
                        f"anchors {seen[f.name]!r} and {a.name!r}")
                seen[f.name] = a.name
        for d in list(derived) + list(lookups):
            if d.name in seen:
                raise RuntimeError(
                    f"feature name conflict: {d.name!r} already defined "
                    f"by {seen[d.name]!r}")
            seen[d.name] = "<derived>"
        self.anchor_list = anchors
        self.derived_feature_list = derived
        self.lookup_feature_list = lookups
        self._feature_owner = seen
        self._built = True

    def _require_built(self) -> None:
        if not self._built:
            raise RuntimeError(
                "Please call FeathrClient.build_features() first")

    # -- offline join ----------------------------------------------------
    def get_offline_features(
        self,
        observation: Union[DataFrame, str],
        feature_query: Union[FeatureQuery, Sequence[FeatureQuery]],
        observation_settings: ObservationSettings,
        output_path: Optional[str] = None,
        source_cache: Optional[dict] = None,
        checkpoint_every: int = 0,
        output_format: str = "raw",
    ) -> DataFrame:
        """Point-in-time join of the requested features onto the
        observation (reference client.py:497-616). ``observation`` is a
        DataFrame or a path (the reference's observation_path).
        Per-query ``key`` binds those features' anchors to different
        observation key expressions (the reference's key tags). With
        ``output_path`` the result is also written as parquet.
        ``output_format="fds"`` re-encodes every requested feature column
        into Quince-FDS tensor format before returning/writing (the
        reference always materializes offline joins as FDS —
        SlidingWindowFeatureUtils.convertSWADFToFDS; here it is opt-in
        and a pure projection, see functions/fds.py)."""
        self._require_built()
        from dataclasses import replace

        from feathr_spark.plans.planner import join_features

        if isinstance(observation, str):
            from feathr_spark.sources.batch import read_batch

            observation = read_batch(self.spark, observation)

        queries = ([feature_query] if isinstance(feature_query, FeatureQuery)
                   else list(feature_query))
        requested: list = []
        key_of: dict = {}
        for q in queries:
            for name in q.feature_list:
                if name not in self._feature_owner:
                    raise KeyError(f"unknown feature {name!r} — not in "
                                   "build_features context")
                requested.append(name)
                if q.key is not None:
                    key_of[name] = list(q.key)
        if len(set(requested)) != len(requested):
            raise RuntimeError("a feature was requested by two "
                               "FeatureQuery lists; request it once")

        # needed-feature closure: requested + declared derived inputs +
        # lookup base features (anchors are pruned to this set, so a
        # requested derived/lookup still finds its inputs joined)
        needed = set(requested)
        changed = True
        while changed:
            changed = False
            for d in self.derived_feature_list:
                if d.name in needed:
                    for i in d.inputs:
                        if i not in needed:
                            needed.add(i)
                            changed = True
            for lk in self.lookup_feature_list:
                if lk.name in needed and lk.base_feature not in needed:
                    needed.add(lk.base_feature)
                    changed = True

        # clone anchors per observation-key binding (run_join_config does
        # the same for HOCON key tags)
        anchors: list = []
        for a in self.anchor_list:
            wanted = [f for f in a.features if f.name in needed]
            none_key = [f for f in wanted if f.name not in key_of]
            by_key: dict = {}
            for f in wanted:
                if f.name in key_of:
                    by_key.setdefault(tuple(key_of[f.name]), []).append(f)
            if none_key:
                anchors.append(replace(a, features=none_key))
            for kt, fs in by_key.items():
                anchors.append(replace(a, features=fs, obs_keys=list(kt),
                                       name=f"{a.name}__{'_'.join(kt)}"))
        # lookup expansion anchors ride along under their ORIGINAL name
        # (the planner resolves them by exact name at expansion time)
        for lk in self.lookup_feature_list:
            if lk.name in needed and not any(
                    a.name == lk.expansion_anchor for a in anchors):
                anchors.append(next(
                    a for a in self.anchor_list
                    if a.name == lk.expansion_anchor))
        # full derived/lookup context goes to the planner; ``requested``
        # prunes the output (a requested derived still pulls its inputs)
        out = join_features(
            self.spark, observation, observation_settings, anchors,
            derived=self.derived_feature_list,
            lookups=self.lookup_feature_list,
            requested=requested, source_cache=source_cache,
            checkpoint_every=checkpoint_every,
        )
        if output_format == "fds":
            from feathr_spark.functions.fds import to_fds
            out, self.last_inferred_feature_types = to_fds(out, requested)
        elif output_format != "raw":
            raise ValueError(f"unknown output_format {output_format!r}")
        if output_path:
            out.write.mode("overwrite").parquet(output_path)
            out = self.spark.read.parquet(output_path)
        return out

    # -- materialization ---------------------------------------------------
    def materialize_features(
        self,
        settings: MaterializationSettings,
        fact: Optional[DataFrame] = None,
        source_cache: Optional[dict] = None,
        resume: bool = True,
    ) -> dict:
        """Materialize per-entity snapshots of the requested (SWA)
        features for every backfill cutoff (reference client.py:718-760
        → the engine's resumable :func:`materialize`), then push the
        latest cutoff online when ``online_table`` is set. All requested
        features must live on ONE anchor (one fact table + key space per
        materialization job — the reference's per-anchor constraint).
        ``fact`` overrides loading the anchor's source (tests inject
        in-memory frames)."""
        self._require_built()
        names = set(settings.feature_names)
        owners = {self._feature_owner.get(n) for n in names}
        if None in owners:
            missing = [n for n in names if n not in self._feature_owner]
            raise KeyError(f"unknown features {missing!r}")
        if len(owners) != 1 or "<derived>" in owners:
            raise RuntimeError(
                "materialize_features requires all features on one "
                f"anchor (got owners {sorted(owners)!r}); derived "
                "features go in GenSpec.derived")
        anchor = next(a for a in self.anchor_list if a.name in owners)
        feats = [f for f in anchor.features if f.name in names]
        not_swa = [f.name for f in feats if not isinstance(f, SWAFeature)]
        if not_swa:
            raise RuntimeError(
                f"non-aggregated features {not_swa!r} cannot be "
                "materialized (reference: allow_materialize_non_agg_"
                "feature guard, client.py:718)")
        if fact is None:
            if source_cache and anchor.source.path in source_cache:
                fact = source_cache[anchor.source.path]
            else:
                from feathr_spark.sources.batch import load_source

                fact = load_source(self.spark, anchor.source)
        key_names = [f"key{i}" for i in range(len(anchor.keys))]
        spec = GenSpec(
            keys=list(anchor.keys), key_names=key_names,
            ts_col=anchor.source.timestamp_col or "ts",
            features=feats,
            ts_format=anchor.source.timestamp_format,
        )
        sink = settings.sink_path
        if sink is None:
            import tempfile

            sink = tempfile.mkdtemp(prefix=f"feathr_mat_{settings.name}_")
        report = materialize(fact, spec, sink, settings.backfill_time,
                             resume=resume)
        report["sink_path"] = sink
        if settings.online_table:
            last = max(settings.backfill_time.cutoffs())
            snap = self.spark.read.parquet(f"{sink}/cutoff={last}")
            write_online(snap, settings.online_table, key_names,
                         self._online)
            report["online_table"] = settings.online_table
        return report

    # -- online read -------------------------------------------------------
    def get_online_features(self, feature_table: str, key,
                            feature_names: Sequence[str]) -> list:
        """Fetch feature values for one entity key from the online store
        (reference client.py:322-340: ``hmget`` on ``<table>:<key>``;
        missing features come back None). ``key`` is the entity key
        string, or a tuple/list joined with the reference's ``#``
        separator."""
        if isinstance(key, (tuple, list)):
            key = "#".join(str(k) for k in key)
        client = self._online() if callable(self._online) else self._online
        row = client.hgetall(f"{feature_table}:{key}")
        return [decode_online_value(row[f]) if f in row else None
                for f in feature_names]

    def multi_get_online_features(self, feature_table: str,
                                  keys: Sequence,
                                  feature_names: Sequence[str]) -> dict:
        """Batch form of :meth:`get_online_features` (reference
        client.py:345-360): {key: [values...]} for each requested key."""
        return {("#".join(str(p) for p in k)
                 if isinstance(k, (tuple, list)) else str(k)):
                self.get_online_features(feature_table, k, feature_names)
                for k in keys}

    # -- registry ----------------------------------------------------------
    def _registry_path(self, project_name: str) -> str:
        import os

        if self._registry_dir is None:
            import tempfile

            self._registry_dir = tempfile.mkdtemp(prefix="feathr_registry_")
        os.makedirs(self._registry_dir, exist_ok=True)
        return os.path.join(self._registry_dir, f"{project_name}.json")

    def register_features(self, project_name: str = "default") -> str:
        """Persist the built feature context as registry metadata
        (reference client.py:229-296 registers to Purview/SQL; here a
        JSON project file under ``registry_dir`` — same metadata, local
        backend). Code hooks (source ``preprocessing``, anchor
        ``extractor``) are code, not metadata: anchors carrying them
        raise, mirroring the reference shipping UDFs separately from
        registry entries (client.py:537 _PreprocessingPyudfManager)."""
        self._require_built()
        import json
        import os
        import tempfile

        for a in self.anchor_list:
            if a.source.preprocessing is not None or a.extractor is not None:
                raise ValueError(
                    f"anchor {a.name!r} carries a code hook "
                    "(preprocessing/extractor); register metadata only "
                    "and re-attach code after get_features_from_registry")
        doc = {
            "project": project_name,
            "anchors": [_anchor_to_dict(a) for a in self.anchor_list],
            "derived": [_derived_to_dict(d)
                        for d in self.derived_feature_list],
            "lookups": [_lookup_to_dict(lk)
                        for lk in self.lookup_feature_list],
        }
        path = self._registry_path(project_name)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return path

    def list_registered_features(self, project_name: str = "default") -> list:
        """Feature names registered under the project (reference
        client.py:298-320)."""
        doc = self._read_registry(project_name)
        names = [f["name"] for a in doc["anchors"] for f in a["features"]]
        names += [d["name"] for d in doc["derived"]]
        names += [lk["name"] for lk in doc["lookups"]]
        return names

    def get_features_from_registry(self, project_name: str = "default",
                                   return_keys: bool = False):
        """Rebuild the feature context from the registry (reference
        client.py:1003-1030): loads the project, calls
        :meth:`build_features` with the restored definitions, and
        returns ``{name: definition}`` (plus ``{name: anchor key
        expressions}`` when ``return_keys``)."""
        doc = self._read_registry(project_name)
        anchors = [_anchor_from_dict(a) for a in doc["anchors"]]
        derived = [_derived_from_dict(d) for d in doc["derived"]]
        lookups = [_lookup_from_dict(lk) for lk in doc["lookups"]]
        self.build_features(anchor_list=anchors,
                            derived_feature_list=derived + lookups)
        feats: dict = {}
        keys: dict = {}
        for a in anchors:
            for f in a.features:
                feats[f.name] = f
                keys[f.name] = list(a.keys)
        for d in derived + lookups:
            feats[d.name] = d
        return (feats, keys) if return_keys else feats

    def _read_registry(self, project_name: str) -> dict:
        import json
        import os

        path = self._registry_path(project_name)
        if not os.path.exists(path):
            raise KeyError(f"no registered project {project_name!r} "
                           f"under {self._registry_dir!r}")
        with open(path) as fh:
            return json.load(fh)

    def search_features(self, keyword: str,
                        project_name: str = "default") -> list:
        """Case-insensitive substring search over the project's feature
        names — the reference registry's
        ``GET /projects/{p}/features?keyword=`` (sql-registry
        main.py:127-146)."""
        kw = keyword.lower()
        return [n for n in self.list_registered_features(project_name)
                if kw in n.lower()]

    def get_project_lineage(self, project_name: str = "default") -> dict:
        """Full project lineage graph from registry metadata — the
        reference registry service's project graph
        (sql-registry registry/db_registry.py:164-183 ``get_project``)
        reduced to its payload: typed nodes and typed edges using the
        reference's RelationshipType vocabulary (models.py:113-117 —
        Contains / Consumes / Produces):

        - ``anchor --Consumes--> source``
        - ``anchor --Produces--> anchor feature``
        - ``derived/lookup feature --Consumes--> input feature``
        - ``project --Contains--> anchor | derived | lookup``

        Returns ``{"project", "nodes": [{id, type, ...}],
        "edges": [{from, to, type}]}``.
        """
        doc = self._read_registry(project_name)
        nodes: dict[str, dict] = {}
        edges: list[dict] = []

        def node(nid: str, ntype: str, **attrs) -> str:
            nodes.setdefault(nid, {"id": nid, "type": ntype, **attrs})
            return nid

        def edge(frm: str, to: str, etype: str) -> None:
            edges.append({"from": frm, "to": to, "type": etype})

        proj = node(f"project:{doc['project']}", "project")
        for a in doc["anchors"]:
            s = a["source"]
            src = node(f"source:{s['path']}", "source",
                       path=s["path"], fmt=s["fmt"])
            anc = node(f"anchor:{a['name']}", "anchor", keys=a["keys"])
            edge(proj, anc, "Contains")
            edge(anc, src, "Consumes")
            for f in a["features"]:
                feat = node(f"feature:{f['name']}", "anchor_feature",
                            kind=f["kind"])
                edge(anc, feat, "Produces")
        for d in doc["derived"]:
            feat = node(f"feature:{d['name']}", "derived_feature",
                        expr=d["expr"])
            edge(proj, feat, "Contains")
            for inp in d["inputs"]:
                edge(feat, f"feature:{inp}", "Consumes")
        for lk in doc["lookups"]:
            feat = node(f"feature:{lk['name']}", "lookup_feature",
                        aggregation=lk["aggregation"])
            edge(proj, feat, "Contains")
            edge(feat, f"feature:{lk['base_feature']}", "Consumes")
            edge(feat, f"feature:{lk['expansion_feature']}", "Consumes")
        # every edge endpoint must resolve against the nodes list:
        # derived/lookup inputs are edged by name, and a typo'd or
        # partially-registered input would otherwise leave a dangling
        # edge consumers cannot resolve
        for e in edges:
            for endpoint in (e["from"], e["to"]):
                if endpoint not in nodes:
                    node(endpoint, "unresolved")
        return {"project": doc["project"], "nodes": list(nodes.values()),
                "edges": edges}

    def get_feature_lineage(self, feature_name: str,
                            project_name: str = "default") -> dict:
        """Upstream + downstream lineage subgraph of one feature — the
        reference registry's ``GET /features/{feature}/lineage``
        (sql-registry main.py:156-159, db_registry.py:150-162: BFS
        upstream along Consumes, downstream along Produces). Upstream
        here = forward-Consumes ∪ reverse-Produces closure (a feature's
        producer anchor, that anchor's source, a derived feature's
        inputs); downstream = the mirror image (features derived from
        this one, anchors fed by this source)."""
        g = self.get_project_lineage(project_name)
        fid = f"feature:{feature_name}"
        if fid not in {n["id"] for n in g["nodes"]}:
            raise KeyError(f"feature {feature_name!r} not registered "
                           f"in project {project_name!r}")
        fwd: dict[str, list] = {}
        rev: dict[str, list] = {}
        for e in g["edges"]:
            if e["type"] == "Contains":
                continue
            fwd.setdefault(e["from"], []).append(e)
            rev.setdefault(e["to"], []).append(e)

        def closure(start: str, up: bool) -> tuple[set, list]:
            seen, out_edges, frontier = {start}, [], [start]
            while frontier:
                nxt = []
                for nid in frontier:
                    # upstream: what this node Consumes + what Produces it
                    # downstream: what this node Produces(-to) + consumers
                    step = []
                    if up:
                        step += [(e, e["to"]) for e in fwd.get(nid, [])
                                 if e["type"] == "Consumes"]
                        step += [(e, e["from"]) for e in rev.get(nid, [])
                                 if e["type"] == "Produces"]
                    else:
                        step += [(e, e["to"]) for e in fwd.get(nid, [])
                                 if e["type"] == "Produces"]
                        step += [(e, e["from"]) for e in rev.get(nid, [])
                                 if e["type"] == "Consumes"]
                    for e, other in step:
                        out_edges.append(e)
                        if other not in seen:
                            seen.add(other)
                            nxt.append(other)
                frontier = nxt
            return seen, out_edges

        up_nodes, up_edges = closure(fid, up=True)
        dn_nodes, dn_edges = closure(fid, up=False)
        keep = up_nodes | dn_nodes
        uniq = {(e["from"], e["to"], e["type"]): e
                for e in up_edges + dn_edges}
        return {"feature": feature_name,
                "nodes": [n for n in g["nodes"] if n["id"] in keep],
                "edges": list(uniq.values())}


# -- registry (de)serialization: metadata-only, no code hooks --------------

def _swa_to_dict(f: SWAFeature) -> dict:
    return {"kind": "swa", "name": f.name, "agg": f.agg, "metric": f.metric,
            "width": f.window.width, "delay": f.window.delay,
            "filter": f.filter, "group_by": f.group_by, "limit": f.limit,
            "default": f.default, "lateral_view": f.lateral_view,
            "lateral_view_alias": f.lateral_view_alias,
            "lateral_view_filter": f.lateral_view_filter}


def _feature_to_dict(f) -> dict:
    if isinstance(f, SWAFeature):
        return _swa_to_dict(f)
    return {"kind": "row", "name": f.name, "expr": f.expr,
            "default": f.default}


def _feature_from_dict(d: dict):
    from feathr_spark.definitions import Feature, WindowSpec

    if d["kind"] == "swa":
        return SWAFeature(
            d["name"], d["agg"], d["metric"],
            WindowSpec(d["width"], d["delay"]), filter=d["filter"],
            group_by=d["group_by"], limit=d["limit"], default=d["default"],
            lateral_view=d["lateral_view"],
            lateral_view_alias=d["lateral_view_alias"],
            lateral_view_filter=d["lateral_view_filter"])
    return Feature(d["name"], d["expr"], default=d["default"])


def _anchor_to_dict(a: Anchor) -> dict:
    return {
        "name": a.name,
        "source": {"path": a.source.path, "fmt": a.source.fmt,
                   "timestamp_col": a.source.timestamp_col,
                   "timestamp_format": a.source.timestamp_format,
                   "options": dict(a.source.options)},
        "keys": list(a.keys),
        "features": [_feature_to_dict(f) for f in a.features],
        "lateral_view": a.lateral_view,
        "lateral_view_alias": a.lateral_view_alias,
        "lateral_view_filter": a.lateral_view_filter,
        "obs_keys": list(a.obs_keys) if a.obs_keys else None,
    }


def _anchor_from_dict(d: dict) -> Anchor:
    from feathr_spark.definitions import Source

    s = d["source"]
    return Anchor(
        name=d["name"],
        source=Source(path=s["path"], fmt=s["fmt"],
                      timestamp_col=s["timestamp_col"],
                      timestamp_format=s["timestamp_format"],
                      options=dict(s["options"])),
        keys=list(d["keys"]),
        features=[_feature_from_dict(f) for f in d["features"]],
        lateral_view=d["lateral_view"],
        lateral_view_alias=d["lateral_view_alias"] or "lv",
        lateral_view_filter=d["lateral_view_filter"],
        obs_keys=list(d["obs_keys"]) if d["obs_keys"] else None,
    )


def _derived_to_dict(d: DerivedFeature) -> dict:
    return {"name": d.name, "expr": d.expr, "inputs": list(d.inputs)}


def _derived_from_dict(d: dict) -> DerivedFeature:
    return DerivedFeature(d["name"], d["expr"], inputs=tuple(d["inputs"]))


def _lookup_to_dict(lk: LookupFeature) -> dict:
    return {"name": lk.name, "base_feature": lk.base_feature,
            "expansion_anchor": lk.expansion_anchor,
            "expansion_feature": lk.expansion_feature,
            "aggregation": lk.aggregation}


def _lookup_from_dict(d: dict) -> LookupFeature:
    return LookupFeature(d["name"], d["base_feature"],
                         d["expansion_anchor"], d["expansion_feature"],
                         aggregation=d["aggregation"])
