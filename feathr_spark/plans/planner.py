"""Multi-anchor feature-join planning and execution.

Rebuilds the reference's pipeline (MultiStageJoinPlanner.scala:31-141 +
DataFrameFeatureJoiner.scala:128-315) Spark-first:

1. classify features into passthrough / window-agg / snapshot-anchored
   groups (FeatureGroups.scala:11-31)
2. group window-agg features by (source, key-expressions) so each source
   is SCANNED ONCE for the max window across its features
   (SlidingWindowAggregationJoiner.scala:147-171 — the engine's
   time-range prefilter already spans all features passed per call)
3. stage ordering: fewer-feature stages first, shrinking the shuffled
   observation early (MultiStageJoinPlanner.scala:137-140)
4. snapshot anchors: dedup right side on keys + left join; with a
   timestamp column declared they become LATEST as-of lookups
   (AnchoredFeatureJoinStep.scala:112-188, "closest from the past")
5. sequential/lookup features: base value -> expansion join -> agg
   (SequentialJoinAsDerivation.scala:44-167)
6. derived features applied in dependency order, then column pruning to
   the requested list (DataFrameFeatureJoiner.scala:276-311)

Catalyst does predicate pushdown/column pruning through every step, so
the planner only decides scan-sharing and join order — exactly the two
things Catalyst cannot infer across feature definitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feathr_spark.definitions import (
    Anchor,
    DerivedFeature,
    Feature,
    LookupFeature,
    ObservationSettings,
    SWAFeature,
)
from feathr_spark.operators.asof import asof_join
from feathr_spark.operators.derived import apply_derived_in_order
from feathr_spark.operators.lookup import lookup_join
from feathr_spark.operators.swa import content_uid_inputs, join_window_agg_features
from feathr_spark.sources.batch import load_source

PASSTHROUGH = "passthrough"


@dataclass
class FeatureGroups:
    """Classified anchors (reference: offline/logical/FeatureGroups.scala)."""

    passthrough: list = field(default_factory=list)   # [(Anchor, [Feature])]
    window_agg: list = field(default_factory=list)    # [(Anchor, [SWAFeature])]
    snapshot: list = field(default_factory=list)      # [(Anchor, [Feature])]

    @classmethod
    def classify(cls, anchors: Sequence[Anchor]) -> "FeatureGroups":
        g = cls()
        for a in anchors:
            if a.source is None or getattr(a.source, "path", None) == PASSTHROUGH:
                g.passthrough.append((a, list(a.features)))
            elif a.features and isinstance(a.features[0], SWAFeature):
                g.window_agg.append((a, list(a.features)))
            else:
                g.snapshot.append((a, list(a.features)))
        return g

    def all_feature_names(self) -> list[str]:
        names = []
        for group in (self.passthrough, self.window_agg, self.snapshot):
            for _, feats in group:
                names += [f.name for f in feats]
        return names


def _apply_lateral_view(df: DataFrame, lv: Optional[str], alias: str,
                        lv_filter: Optional[str]) -> DataFrame:
    """LATERAL VIEW explode(...) alias [WHERE ...] on the fact source
    (FeatureTransformer.scala:51-64)."""
    if not lv:
        return df
    out = df.select("*", F.expr(lv).alias(alias))
    if lv_filter:
        out = out.where(F.expr(lv_filter))
    return out


def _effective_lateral(anchor: Anchor, feat) -> tuple:
    """Per-feature lateral view wins over the anchor-level one
    (SlidingWindowDataDef.scala:83-86: the explode belongs to the
    feature; anchor-level is this engine's sugar)."""
    flv = getattr(feat, "lateral_view", None)
    if flv:
        return (flv, getattr(feat, "lateral_view_alias", None) or "lv",
                getattr(feat, "lateral_view_filter", None))
    return (anchor.lateral_view, anchor.lateral_view_alias, anchor.lateral_view_filter)


def _source_key(anchor: Anchor) -> tuple:
    s = anchor.source
    return (s.path, s.fmt, tuple(sorted((s.options or {}).items())),
            tuple(anchor.keys), tuple(anchor.obs_keys or ()),
            id(anchor.extractor) if getattr(anchor, "extractor", None) else None)


def join_features(
    spark: SparkSession,
    observation: DataFrame,
    settings: ObservationSettings,
    anchors: Sequence[Anchor],
    derived: Sequence[DerivedFeature] = (),
    lookups: Sequence[LookupFeature] = (),
    requested: Optional[Sequence[str]] = None,
    source_cache: Optional[dict] = None,
    checkpoint_every: int = 0,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Point-in-time join of every requested feature onto ``observation``.

    ``source_cache`` maps an anchor's source path to an already-loaded
    DataFrame (tests inject in-memory frames; production resolves via
    spark.read with the engine's loader).

    ``checkpoint_every``: truncate the lineage after every N join stages
    (the reference checkpoints long multi-anchor plans per stage,
    FeathrClient.scala:182-192 — without it a 50-anchor plan builds a
    DAG deep enough to blow planning time / stack). With
    ``checkpoint_dir`` set the checkpoint is RELIABLE (HDFS/S3-backed,
    survives executor loss — the 100 TB setting); without it, a
    lazy ``localCheckpoint`` (executor-local, cheaper, lost on executor
    death — acceptable for short local runs only).
    """
    groups = FeatureGroups.classify(anchors)
    out = observation
    anchor_dfs: dict[str, DataFrame] = {}
    # simulate_time_delay (reference settings.py:32-66): the observation
    # is treated as if it happened `sim` seconds EARLIER, shifting every
    # window and as-of lookup back by sim — implemented by folding the
    # delay into each feature's WindowSpec / the as-of delay param, so
    # the engines see ordinary delays (no timestamp rewriting).
    sim = float(getattr(settings, "simulate_time_delay", 0.0) or 0.0)

    # useLatestFeatureData (SlidingWindowAggregationJoiner.scala:225-229):
    # every window/as-of anchors to "now" instead of the observation's
    # timestamp column. One driver-side clock read per plan (the
    # reference evaluates unix_timestamp() once per join run too), a
    # constant column — not F.current_timestamp(), whose per-batch
    # re-evaluation would make retries non-deterministic.
    obs_ts_col = settings.timestamp_col
    obs_ts_format = settings.timestamp_format
    if getattr(settings, "use_latest_feature_data", False):
        import time as _time

        now_s = settings.now_epoch if settings.now_epoch is not None else _time.time()
        out = out.withColumn("__now_ts", F.lit(float(now_s)))
        obs_ts_col, obs_ts_format = "__now_ts", "epoch"

    if checkpoint_every and checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    stage_counter = [0]

    def _stage_done(df: DataFrame) -> DataFrame:
        if not checkpoint_every:
            return df
        stage_counter[0] += 1
        if stage_counter[0] % checkpoint_every:
            return df
        return df.checkpoint(eager=False) if checkpoint_dir \
            else df.localCheckpoint(eager=False)

    def _load_raw(anchor: Anchor) -> DataFrame:
        path = anchor.source.path
        if source_cache and path in source_cache:
            df = anchor.source.preprocessing(source_cache[path]) \
                if anchor.source.preprocessing else source_cache[path]
        else:
            df = load_source(spark, anchor.source)
        if getattr(anchor, "extractor", None) is not None:
            df = anchor.extractor.apply(df)
        return df

    def _load(anchor: Anchor) -> DataFrame:
        return _apply_lateral_view(_load_raw(anchor), anchor.lateral_view,
                                   anchor.lateral_view_alias, anchor.lateral_view_filter)

    # (1) passthrough: expressions over observation columns directly
    # (MultiStageJoinPlanner.scala:87-90)
    for _, feats in groups.passthrough:
        for f in feats:
            out = out.withColumn(f.name, F.expr(f.expr))

    # (2) window-agg stages: one engine call per (source, keys,
    # effective-lateral-view) group — the scan is shared and the time
    # prefilter spans the max window. Features with different lateral
    # views on the SAME anchor land in different stages (each needs its
    # own explode), per-feature lateralView parity.
    swa_by_source: dict[tuple, list] = {}
    for a, feats in groups.window_agg:
        for f in feats:
            lv = _effective_lateral(a, f)
            swa_by_source.setdefault((_source_key(a), lv), []).append((a, f))
    stages = sorted(swa_by_source.values(), key=len)
    # Observation time range computed ONCE on the pre-stage observation
    # and passed to every SWA stage: stage N's input embeds stages
    # 1..N-1's work, so letting each stage's _time_prefilter run its own
    # min/max action would re-execute the whole upstream DAG per stage —
    # a driver-action-per-stage scale hazard. Obs timestamps never
    # change as feature columns append, so one range serves all stages.
    obs_range = None
    if stages:
        from feathr_spark.functions.timestamps import to_epoch_micros

        rng = out.select(
            to_epoch_micros(F.expr(obs_ts_col), obs_ts_format).alias("__t")
        ).agg(F.min("__t").alias("lo"), F.max("__t").alias("hi")).first()
        if rng is not None and rng["lo"] is not None:
            obs_range = (int(rng["lo"]), int(rng["hi"]))
    for grp in stages:
        a0 = grp[0][0]
        lv0 = _effective_lateral(a0, grp[0][1])
        fact = _apply_lateral_view(_load_raw(a0), *lv0)
        feats = [f for _, f in grp]
        if sim:
            from dataclasses import replace

            from feathr_spark.definitions import WindowSpec
            feats = [replace(f, window=WindowSpec(f.window.width, f.window.delay + sim))
                     for f in feats]
        out = join_window_agg_features(
            out, fact,
            obs_keys=a0.obs_keys or settings.keys, fact_keys=a0.keys,
            obs_ts=obs_ts_col, fact_ts=a0.source.timestamp_col,
            features=feats,
            obs_ts_format=obs_ts_format,
            fact_ts_format=a0.source.timestamp_format,
            obs_time_range=obs_range,
        )
        out = _stage_done(out)

    # (3) snapshot anchors: as-of LATEST when the source is time-stamped,
    # plain dedup+left-join otherwise
    snap_sorted = sorted(groups.snapshot, key=lambda t: len(t[1]))
    for a, feats in snap_sorted:
        src = _load(a)
        anchor_dfs[a.name] = src
        if a.source.timestamp_col:
            out = asof_join(
                out, src, a.obs_keys or settings.keys, a.keys,
                obs_ts_col, a.source.timestamp_col,
                [f"{f.expr} as {f.name}" for f in feats],
                obs_ts_format=obs_ts_format,
                fact_ts_format=a.source.timestamp_format,
                delay=sim,
            )
        else:
            kcols = [f"__sk{i}" for i in range(len(a.keys))]
            proj = src.select(
                *[F.expr(k).alias(kc) for k, kc in zip(a.keys, kcols)],
                *[F.expr(f.expr).alias(f.name) for f in feats],
            ).dropDuplicates(kcols)
            cond = None
            for okey, kc in zip(a.obs_keys or settings.keys, kcols):
                c = F.expr(okey).eqNullSafe(F.col(kc)) & F.expr(okey).isNotNull()
                cond = c if cond is None else (cond & c)
            out = out.join(proj, cond, "left").drop(*kcols)
        for f in feats:
            if f.default is not None:
                out = out.withColumn(f.name, F.coalesce(F.col(f.name), F.lit(f.default)))
        out = _stage_done(out)

    # (4) sequential/lookup features over joined base values.
    # lookup_join references its obs twice (projection + join-back), so
    # the row uid must be deterministic across the two plan branches AND
    # across task retries: a content-derived 128-bit hash (two xxhash64
    # seeds packed in a struct) is both, with no localCheckpoint
    # materialization. monotonically_increasing_id is retry/branch
    # nondeterministic — the reference flags the same hazard
    # (SequentialJoinAsDerivation.scala:125-129). Bytewise-identical rows
    # share a uid; lookup_join dedups on uid pre-join and fans the one
    # (identical) result back to every duplicate. Map-containing columns
    # (any nesting) contribute via a to_json rendering — see
    # operators.swa.content_uid_inputs — so rows differing only in a map
    # never share a uid.
    if lookups:
        hash_in = content_uid_inputs(out.schema)
        out = out.withColumn("__lk_uid", F.struct(
            F.xxhash64(F.lit(0x100C_0001), *hash_in).alias("u1"),
            F.xxhash64(F.lit(0x100C_0002), *hash_in).alias("u2"),
        ))
    for lk in lookups:
        exp_anchor = next(a for a in anchors if a.name == lk.expansion_anchor)
        exp_df = anchor_dfs.get(lk.expansion_anchor)
        if exp_df is None:
            exp_df = _load(exp_anchor)
        exp_feat = next(f for f in exp_anchor.features if f.name == lk.expansion_feature)
        # array-valued base features expand one row per element
        # (SequentialJoinAsDerivation.scala:205-224 explode step)
        base_dt = out.schema[lk.base_feature].dataType
        out = lookup_join(
            out, "__lk_uid", lk.base_feature,
            exp_df.select(F.expr(exp_anchor.keys[0]).alias("__ek"),
                          F.expr(exp_feat.expr).alias(lk.expansion_feature)),
            "__ek", lk.expansion_feature, lk.name,
            aggregation=lk.aggregation,
            explode_base=isinstance(base_dt, T.ArrayType),
        )
    if lookups:
        out = out.drop("__lk_uid")

    # (5) derived features in dependency order
    out = apply_derived_in_order(out, derived)

    # (6) prune to requested features (+ observation columns)
    if obs_ts_col == "__now_ts":
        out = out.drop("__now_ts")
    if requested is not None:
        keep = list(observation.columns) + [c for c in requested if c in out.columns]
        out = out.select(*dict.fromkeys(keep))
    return out
