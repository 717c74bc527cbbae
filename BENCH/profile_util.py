#!/usr/bin/env python
"""CPU-utilization timeline of the flagship phases at one core count.

Samples /proc/stat every 0.5s while each phase runs; prints busy% of
the WHOLE machine (32 cpus) per sample. Diagnostic only.
"""

from __future__ import annotations

import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cpu_busy():
    f = open("/proc/stat").readline().split()[1:]
    v = [int(x) for x in f]
    idle = v[3] + v[4]
    return sum(v), idle


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.samples = []
        self.stop = False

    def run(self):
        prev = cpu_busy()
        while not self.stop:
            time.sleep(0.5)
            cur = cpu_busy()
            dt, di = cur[0] - prev[0], cur[1] - prev[1]
            if dt > 0:
                self.samples.append(round(100 * (1 - di / dt), 1))
            prev = cur


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    from pyspark.sql import functions as F

    from feathr_spark import SWAFeature, WindowSpec, asof_join, join_window_agg_features
    from feathr_spark.datagen import corpus
    from feathr_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name=f"util_{cpus}",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    fact, obs = corpus(spark, sf=sf)
    fact = fact.cache(); obs = obs.cache()
    fact.count(); n_obs = obs.count()
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

    def swa():
        return join_window_agg_features(
            obs, fact, ["doc_id"], ["doc_id"], "ts", "event_ts", feats,
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="cogroup",
            hot_keys_df=hot_df, salt_buckets=16, prefilter_time_range=False)

    def asof(vec):
        return asof_join(vec, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
                         ["tokens as last_tokens", "n_tok as last_n_tok"],
                         obs_ts_format="epoch", fact_ts_format="epoch", strategy="union")

    asof(swa()).write.format("noop").mode("overwrite").save()  # warmup

    for name, fn in [("swa", lambda: swa()),
                     ("full", lambda: asof(swa()))]:
        s = Sampler(); s.start()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        w = time.monotonic() - t0
        s.stop = True; s.join(1)
        print(name, f"wall={w:.2f}s", "util%:", s.samples)

    spark.stop()


if __name__ == "__main__":
    main()
