#!/usr/bin/env python
"""A/B: all-cogroup flagship SWA vs a hybrid split plan (VERDICT r4 #5).

Hypothesis under test: the cogroup kernel's Arrow serialization is the
flagship floor, so moving the frame-friendly aggregates
(SUM/COUNT/AVG/filtered COUNT — incremental window frames) to the
JVM-only salted-union path and keeping ONLY the kernel-bound features
(MAX / COUNT_DISTINCT / LATEST) in the Arrow pass, then joining the two
halves on obs_id, could beat one 7-feature cogroup pass.

Measures, min-of-N warm at the given sf/cpus (same protocol family as
bench.py):
  A  all-7-features cogroup (the shipping flagship SWA stage)
  B  hybrid: 4-feature salted union + 3-feature cogroup + obs_id join
  Bu the union half alone      (hybrid's JVM component)
  Bc the slim cogroup alone    (hybrid's Arrow component — quantifies
     how much the kernel gains from carrying fewer columns)
plus an order-independent checksum equality check of A vs B outputs.

Usage: python BENCH/ab_hybrid.py --sf 0.1 --cpus 32 --iters 3
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
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feathr_spark import (SWAFeature, WindowSpec,
                              join_window_agg_features, release_caches)
    from feathr_spark.datagen import corpus
    from feathr_spark.materialize import order_independent_checksum
    from feathr_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="ab_hybrid")
    fact, obs = corpus(spark, sf=args.sf)
    fact = fact.repartition(128, "doc_id").cache()
    obs = obs.cache()
    n_obs = obs.count()
    fact.count()

    frame_friendly = [
        SWAFeature("tok_sum_1d", "SUM", "n_tok", WindowSpec(86400)),
        SWAFeature("seq_cnt_1d", "COUNT", "n_tok", WindowSpec(86400)),
        SWAFeature("tok_avg_7d", "AVG", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("web_cnt_1d", "COUNT", "n_tok", WindowSpec(86400),
                   filter="source = 'web'"),
    ]
    kernel_bound = [
        SWAFeature("tok_max_7d", "MAX", "n_tok", WindowSpec(7 * 86400)),
        SWAFeature("src_cnt_7d", "COUNT_DISTINCT", "source",
                   WindowSpec(7 * 86400)),
        SWAFeature("last_ts", "LATEST", "event_ts", WindowSpec(7 * 86400)),
    ]
    all_feats = frame_friendly + kernel_bound

    hot = max(2000, n_obs // 50)
    hot_df = (fact.groupBy("doc_id").count().where(F.col("count") > hot)
              .select("doc_id").cache())
    hot_df.count()

    common = dict(obs_ts_format="epoch", fact_ts_format="epoch",
                  hot_keys_df=hot_df, salt_buckets=16,
                  prefilter_time_range=False)

    def plan_A():
        return join_window_agg_features(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            all_feats, strategy="cogroup", **common)

    def plan_Bu():
        return join_window_agg_features(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            frame_friendly, strategy="union", **common)

    def plan_Bc():
        slim = obs.select("obs_id", "doc_id", "ts")
        return join_window_agg_features(
            slim, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            kernel_bound, strategy="cogroup", **common)

    def plan_B():
        left = plan_Bu()
        right = plan_Bc().drop("doc_id", "ts")
        return left.join(right, "obs_id")

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(args.iters):
            spark.catalog.clearCache()
            fact.cache().count()
            obs.cache().count()
            hot_df.cache().count()
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
            release_caches()
        return round(best, 3)

    # equality first (cold): A and B must produce identical rows
    ck_a = order_independent_checksum(plan_A())
    ck_b = order_independent_checksum(
        plan_B().select(*[c for c in plan_A().columns]))
    # warmup then measure
    res = {
        "A_cogroup_7feat": timed(plan_A),
        "B_hybrid": timed(plan_B),
        "Bu_union_4feat": timed(plan_Bu),
        "Bc_cogroup_3feat": timed(plan_Bc),
        "checksum_equal": ck_a == ck_b,
        "sf": args.sf, "cpus": args.cpus, "iters": args.iters,
        "n_obs": n_obs,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
