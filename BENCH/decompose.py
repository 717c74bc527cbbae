#!/usr/bin/env python
"""Decompose the flagship pipeline's wall time at one parallelism level.

Times, in one JVM, each of:
  scan   — decode the full bucketed fact table (tokens included) to noop
  slim   — decode fact WITHOUT tokens (the SWA branch's actual scan)
  swa    — SWA cogroup battery only
  fetch  — as-of prune payload fetch only (obs directly, no SWA)
  full   — the whole flagship pipeline (= run_scaling's measured job)

Usage: FEATHR_BENCH_WAREHOUSE=... python BENCH/decompose.py --cpus 16 --sf 8.0
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sf", type=float, default=8.0)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--parts", default="scan,slim,swa,fetch,full")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feathr_spark import SWAFeature, WindowSpec, asof_join, join_window_agg_features
    from feathr_spark.datagen import corpus
    from feathr_spark.session import get_spark

    wh = os.environ.get("FEATHR_BENCH_WAREHOUSE", "/dev/shm/feathr-bench-wh")
    spark = get_spark(cpus=args.cpus, app_name=f"decompose_{args.cpus}", extra_conf={
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.warehouse.dir": wh,
        "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
        "spark.executorEnv.MALLOC_TRIM_THRESHOLD_": "-1",
        "spark.executorEnv.MALLOC_MMAP_THRESHOLD_": "1073741824",
    })
    fact_raw, obs = corpus(spark, sf=args.sf)
    path = f"{wh}/fact_corpus_sf{args.sf}"
    assert os.path.exists(f"{path}/_SUCCESS"), "run run_scaling first to build the table"
    ddl = fact_raw._jdf.schema().toDDL()
    spark.sql(f"CREATE TABLE fact_corpus ({ddl}) USING parquet "
              f"CLUSTERED BY (doc_id) SORTED BY (doc_id, event_ts) "
              f"INTO 128 BUCKETS LOCATION '{path}'")
    fact = spark.table("fact_corpus")
    obs = obs.cache()
    n_obs = obs.count()

    feats = [
        SWAFeature("tok_sum_1d", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("seq_cnt_1d", "COUNT", "n_tok", WindowSpec(86400)),
        SWAFeature("tok_avg_7d", "AVG", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("tok_max_7d", "MAX", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("tok_min_7d", "MIN", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("src_cnt_7d", "COUNT_DISTINCT", "source", WindowSpec(7 * 86400)),
        SWAFeature("web_cnt_1d", "COUNT", "n_tok", WindowSpec(86400), filter="source = 'web'"),
        SWAFeature("tok_latest_7d", "LATEST", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("since_last_s", "TIMESINCE", "n_tok", WindowSpec(7 * 86400)),
    ]
    hot = max(2000, n_obs // 50)
    hot_df = (fact.groupBy("doc_id").count().where(F.col("count") > hot)
              .select("doc_id").cache())
    hot_df.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def p_scan():
        noop(fact)

    def p_slim():
        noop(fact.select("doc_id", "event_ts", "n_tok", "source"))

    def p_swa():
        noop(join_window_agg_features(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="cogroup",
            hot_keys_df=hot_df, salt_buckets=16, prefilter_time_range=False))

    def p_fetch():
        noop(asof_join(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            ["tokens as last_tokens", "n_tok as last_n_tok"],
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="prune"))

    def p_full():
        vec = join_window_agg_features(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="cogroup",
            hot_keys_df=hot_df, salt_buckets=16, prefilter_time_range=False)
        noop(asof_join(
            vec, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            ["tokens as last_tokens", "n_tok as last_n_tok"],
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="prune"))

    parts = {"scan": p_scan, "slim": p_slim, "swa": p_swa, "fetch": p_fetch, "full": p_full}
    out = {}
    for name in args.parts.split(","):
        fn = parts[name]
        fn()  # warmup
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 2)
        print(json.dumps({"part": name, "best_s": out[name], "cpus": args.cpus}))
    print(json.dumps({"cpus": args.cpus, "sf": args.sf, "parts": out}))
    spark.stop()


if __name__ == "__main__":
    main()
