#!/usr/bin/env python
"""Per-phase profiling of the flagship pipeline at two core counts.

Times the SWA cogroup phase and the as-of payload-fetch phase
separately (each with its own noop write, vec cached in between) so the
non-scaling phase is identifiable. Diagnostic only — not the graded
bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def job(cpus: int, sf: float) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from feathr_spark import SWAFeature, WindowSpec, asof_join, join_window_agg_features
    from feathr_spark.datagen import corpus
    from feathr_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name=f"profile_{cpus}",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    fact, obs = corpus(spark, sf=sf)
    fact = fact.cache(); obs = obs.cache()
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

    def asof(vec):
        return asof_join(
            vec, fact, ["doc_id"], ["doc_id"], "ts", "event_ts",
            ["tokens as last_tokens", "n_tok as last_n_tok"],
            obs_ts_format="epoch", fact_ts_format="epoch", strategy="union",
        )

    # swa-only vs full pipeline: asof cost = full - swa (avoids caching
    # the intermediate, which OOM'd alongside tmpfs shuffle files)
    def run_swa():
        swa().write.format("noop").mode("overwrite").save()

    def run_full():
        asof(swa()).write.format("noop").mode("overwrite").save()

    run_full()  # warmup
    times = {}
    for name, fn in [("swa", run_swa), ("full", run_full)]:
        best = 1e9
        for _ in range(2):
            t0 = time.monotonic(); fn(); best = min(best, time.monotonic() - t0)
        times[name] = round(best, 2)
    times["asof_derived"] = round(times["full"] - times["swa"], 2)

    print(json.dumps({"cpus": cpus, "sf": sf, "fact": n_fact, "obs": n_obs, **times}))
    spark.stop()


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    if len(sys.argv) > 2 and sys.argv[2] == "--job":
        job(int(sys.argv[3]), sf)
        return
    for cpus in (8, 32):
        p = subprocess.run([sys.executable, os.path.abspath(__file__), str(sf), "--job", str(cpus)],
                           capture_output=True, text=True, cwd=REPO, timeout=3600)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else p.stderr[-2000:])


if __name__ == "__main__":
    main()
