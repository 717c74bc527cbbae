#!/usr/bin/env python
"""Diagnostic: per-iteration wall + machine cpu shares for the flagship
phases at one core count. Identifies host-interference windows (high
machine sys share = page-fault storms in this Firecracker sandbox;
steal alone does not capture them).

Usage: python BENCH/diag_iter.py CPUS [SF] [ITERS] [EXTRA_CONF_JSON]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cpustat():
    f = open("/proc/stat").readline().split()[1:]
    return [int(x) for x in f]


def main():
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    extra = json.loads(sys.argv[4]) if len(sys.argv) > 4 else {}

    from pyspark.sql import functions as F

    from feathr_spark import SWAFeature, WindowSpec, asof_join, join_window_agg_features
    from feathr_spark.datagen import corpus
    from feathr_spark.session import get_spark

    conf = {"spark.ui.showConsoleProgress": "false"}
    conf.update(extra)
    spark = get_spark(cpus=cpus, app_name=f"diag_{cpus}", extra_conf=conf)
    fact, obs = corpus(spark, sf=sf)
    # entity-hash-partitioned corpus layout (north star input shape)
    fact = fact.repartition(128, "doc_id").cache(); obs = obs.cache()
    n_fact = fact.count(); n_obs = obs.count()

    feats = [
        SWAFeature("tok_sum_1d", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("seq_cnt_1d", "COUNT", "n_tok", WindowSpec(86400)),
        SWAFeature("tok_avg_7d", "AVG", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("tok_max_7d", "MAX", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("tok_min_7d", "MIN", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("src_cnt_7d", "COUNT_DISTINCT", "source", WindowSpec(7 * 86400)),
        SWAFeature("web_cnt_1d", "COUNT", "n_tok", WindowSpec(86400),
                   filter="source = 'web'"),
        SWAFeature("tok_latest_7d", "LATEST", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("since_last_s", "TIMESINCE", "n_tok", WindowSpec(7 * 86400)),
    ]
    hot = max(2000, n_obs // 50)
    hot_df = (fact.groupBy("doc_id").count().where(F.col("count") > hot)
              .select("doc_id").cache())
    hot_df.count()

    def swa():
        return join_window_agg_features(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="cogroup",
            hot_keys_df=hot_df, salt_buckets=16, prefilter_time_range=False,
        )

    def full():
        out = asof_join(
            swa(), fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            ["tokens as last_tokens", "n_tok as last_n_tok"],
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="prune",
        )
        out.write.format("noop").mode("overwrite").save()

    def run_swa():
        swa().write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        s0 = cpustat(); t0 = time.monotonic()
        fn()
        w = time.monotonic() - t0; s1 = cpustat()
        d = [b - a for a, b in zip(s0, s1)]
        tot = max(sum(d), 1)
        print(json.dumps({
            "phase": name, "cpus": cpus, "wall_s": round(w, 2),
            "user_pct": round(100 * (d[0] + d[1]) / tot, 1),
            "sys_pct": round(100 * d[2] / tot, 1),
            "steal_pct": round(100 * d[7] / tot, 1),
            "idle_pct": round(100 * (d[3] + d[4]) / tot, 1),
        }), flush=True)

    timed("warmup_full", full)
    for i in range(iters):
        timed("swa", run_swa)
    for i in range(iters):
        timed("full", full)
    spark.stop()


if __name__ == "__main__":
    main()
