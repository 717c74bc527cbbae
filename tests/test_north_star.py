"""North-star integration: the full training-data pipeline end-to-end.

One story, every stage through the public API on one synthesized
corpus: near-dup dedup -> entity-partitioned tokenized fact table ->
point-in-time SWA + fused as-of token fetch (zero temporal leakage,
token-array equality) -> embargoed temporal split -> FDS encoding ->
resumable shard write with lineage + run metrics. Catches cross-module
drift no per-operator test sees.
"""
from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from feathr_spark import (SWAFeature, WindowSpec, asof_fetch,
                          join_window_agg_features, release_caches)
from feathr_spark.datagen import corpus


def test_pipeline_end_to_end(spark, tmp_path):
    fact, obs = corpus(spark, sf=0.005)
    # 1. entity-hash-partitioned fact cache (the Iceberg-layout stand-in)
    fact = fact.repartition(16, "doc_id").cache()
    obs = obs.cache()
    n_obs = obs.count()
    n_fact = fact.count()

    # 2. SWA battery + as-of match ts in ONE kernel pass, then the
    #    payload fetch (the flagship plan)
    feats = [
        SWAFeature("tok_sum_1d", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("seq_cnt_1d", "COUNT", "n_tok", WindowSpec(86400)),
        SWAFeature("last_ts", "LATEST", "event_ts", WindowSpec(7 * 86400)),
    ]
    vec = join_window_agg_features(
        obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
        obs_ts_format="epoch", fact_ts_format="epoch", strategy="cogroup")
    vec = vec.persist()
    assert vec.count() == n_obs
    out = asof_fetch(vec, fact, ["doc_id"], ["doc_id"], "last_ts",
                     "event_ts", ["tokens as last_tokens",
                                  "n_tok as last_n_tok"])
    out = out.persist()
    assert out.count() == n_obs

    # 3. zero temporal leakage: every matched ts is at or before obs ts
    assert out.where(F.col("last_ts") > F.col("ts")).count() == 0
    # unmatched rows have null payloads, matched rows non-null
    assert out.where(F.col("last_ts").isNull()
                     & F.col("last_tokens").isNotNull()).count() == 0

    # 4. token-array equality: the fetched payload IS the fact row's
    #    token array at the matched timestamp (north-rule per-row
    #    invariant), up to exact-ts ties collapsed by the deterministic
    #    max_by rule — so compare against the set of fact rows at that
    #    (key, ts) and require membership
    matched = out.where(F.col("last_ts").isNotNull())
    j = (matched.alias("m").join(
            fact.alias("f"),
            (F.col("m.doc_id") == F.col("f.doc_id"))
            & (F.col("m.last_ts") == F.col("f.event_ts"))))
    hit = j.where(F.col("m.last_tokens") == F.col("f.tokens")) \
           .select("m.obs_id").distinct().count()
    assert hit == matched.count()

    # 5. embargoed temporal split over the feature vectors
    from feathr_spark.operators.corpus import temporal_split
    t_mid = int(out.agg(F.expr("percentile(ts, 0.5)")).first()[0])
    split = temporal_split(out, "ts", float(t_mid), embargo=86400.0)
    by = {r["split"]: r["count"]
          for r in split.groupBy("split").count().collect()}
    assert by.get("train", 0) > 0 and by.get("val", 0) > 0
    leak = split.where(
        (F.col("split") == "train")
        & (F.col("ts") >= t_mid - 86400)).count()
    assert leak == 0

    # 6. FDS-encode the numeric features (zero-shuffle projection)
    from feathr_spark.functions.fds import to_fds
    fds_df, types = to_fds(split.select("obs_id", "tok_sum_1d",
                                        "seq_cnt_1d", "split"),
                           ["tok_sum_1d", "seq_cnt_1d"])
    assert types == {"tok_sum_1d": "NUMERIC", "seq_cnt_1d": "NUMERIC"}
    assert dict(fds_df.dtypes)["tok_sum_1d"] == "float"

    # 7. resumable shard write of the training slice + kill/resume
    from feathr_spark.materialize import read_run_metrics
    from feathr_spark.sources.shards import load_shards, write_shards
    train = split.where(F.col("split") == "train") \
                 .select("obs_id", "doc_id", "ts", "last_tokens")
    n_train = train.count()
    sink = "file://" + str(tmp_path / "train_shards")
    rpt = write_shards(train, sink, n_shards=4, key_col="obs_id", seed=7)
    assert rpt["metrics"]["rows_written"] == n_train
    m = read_run_metrics(sink)
    assert m["mode"] == "write_shards" and m["metrics"]["waves"] >= 1

    # kill one shard; resume rewrites exactly it, byte-stable counts
    local = str(tmp_path / "train_shards")
    before = {int(d.split("=")[1]): True for d in os.listdir(local)
              if d.startswith("shard=")}
    shutil.rmtree(os.path.join(local, "shard=2"))
    rpt2 = write_shards(train, sink, n_shards=4, key_col="obs_id", seed=7)
    assert rpt2["written"] == [2] and sorted(rpt2["skipped"]) == [0, 1, 3]
    assert load_shards(spark, sink).count() == n_train
    assert set(before) == {0, 1, 2, 3}

    out.unpersist(); vec.unpersist(); fact.unpersist(); obs.unpersist()
    release_caches()
