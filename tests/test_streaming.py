"""Structured Streaming ingestion: file-source micro-batches through the
row-transform + windowed/session aggregation + foreachBatch sink paths,
with a restart proving checkpoint recovery (no reprocessing)."""

from __future__ import annotations

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from feathr_spark.definitions import Feature
from feathr_spark.streaming import (
    stream_features,
    stream_session_agg,
    stream_to_sink,
    stream_window_agg,
)

SCHEMA = "uid string, ts timestamp, v double, et string"


def _write_batch(spark, path, rows):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "uid string, ts string, v double, et string") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def src_dir(spark, tmp_path):
    p = str(tmp_path / "src")
    _write_batch(spark, p, [
        ("u1", "2024-01-01 00:00:10", 1.0, "click"),
        ("u1", "2024-01-01 00:10:00", 2.0, "view"),
        ("u2", "2024-01-01 00:20:00", 5.0, "click"),
        ("u1", "2024-01-01 01:30:00", 3.0, "click"),
    ])
    return p


def _run_to_rows(spark, out_df, tmp_path, name, mode="update"):
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = stream_to_sink(out_df, sink, str(tmp_path / f"ckpt_{name}"),
                       output_mode=mode, query_name=name)
    q.awaitTermination(120)
    return collected


def test_stream_row_features(spark, src_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    out = stream_features(
        stream, ["upper(uid)"], [Feature("v2", "v * 2"), Feature("is_click", "cast(et = 'click' as int)")],
        key_names=["entity"], where="v > 0",
    )
    rows = _run_to_rows(spark, out, tmp_path, "rowfeat", mode="append")
    assert len(rows) == 4
    got = {(r["entity"], r["v2"], r["is_click"]) for r in rows}
    assert ("U1", 2.0, 1) in got and ("U2", 10.0, 1) in got


def test_stream_window_agg_and_checkpoint_restart(spark, src_dir, tmp_path):
    def make_stream():
        s = spark.readStream.schema(SCHEMA).parquet(src_dir)
        return stream_window_agg(
            s, ["uid"], "ts", "1 hour",
            {"v_sum": "sum(v)", "n": "count(v)"}, watermark="30 minutes",
        )

    rows1 = _run_to_rows(spark, make_stream(), tmp_path, "winagg")
    s1 = {(r["uid"], str(r["window_start"]), r["v_sum"], r["n"]) for r in rows1}
    assert ("u1", "2024-01-01 00:00:00", 3.0, 2) in s1
    assert ("u2", "2024-01-01 00:00:00", 5.0, 1) in s1
    assert ("u1", "2024-01-01 01:00:00", 3.0, 1) in s1

    # append late + new data, restart from the SAME checkpoint: only the
    # new file is processed (offset recovery), updated windows re-emit
    _write_batch(spark, src_dir, [
        ("u2", "2024-01-01 01:40:00", 7.0, "view"),
        ("u1", "2024-01-01 01:45:00", 10.0, "click"),
    ])
    rows2 = _run_to_rows(spark, make_stream(), tmp_path, "winagg")
    s2 = {(r["uid"], str(r["window_start"]), r["v_sum"], r["n"]) for r in rows2}
    assert ("u2", "2024-01-01 01:00:00", 7.0, 1) in s2
    assert ("u1", "2024-01-01 01:00:00", 13.0, 2) in s2  # merged with state
    # old finalized windows are NOT re-emitted
    assert not any(w == "2024-01-01 00:00:00" for _, w, _, _ in s2)


def test_stream_session_agg(spark, src_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    out = stream_session_agg(
        stream, ["uid"], "ts", "30 minutes",
        {"v_sum": "sum(v)", "n": "count(v)"}, watermark="10 minutes",
    )
    rows = _run_to_rows(spark, out, tmp_path, "sess", mode="complete")
    by = {(r["uid"], str(r["session_start"])): (r["v_sum"], r["n"]) for r in rows}
    # u1: events at 00:00:10 and 00:10:00 chain into one session; 01:30 alone
    assert by[("u1", "2024-01-01 00:00:10")] == (3.0, 2)
    assert by[("u1", "2024-01-01 01:30:00")] == (3.0, 1)
    assert by[("u2", "2024-01-01 00:20:00")] == (5.0, 1)


def test_stream_dedup_within_watermark(spark, tmp_path):
    from feathr_spark.streaming import stream_dedup

    p = str(tmp_path / "dup_src")
    _write_batch(spark, p, [
        ("u1", "2024-01-01 00:00:10", 1.0, "Hello,  World!"),
        ("u2", "2024-01-01 00:01:00", 2.0, "hello world"),  # same normalized content
        ("u3", "2024-01-01 00:02:00", 3.0, "something else"),
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(p)
    dedup = stream_dedup(stream, "ts", ["et"], watermark="1 hour")
    rows = _run_to_rows(spark, dedup, tmp_path, "sdedup", mode="append")
    # normalization folds "Hello,  World!" and "hello world" into one fingerprint
    assert len(rows) == 2
    assert {r["et"] for r in rows} == {"Hello,  World!", "something else"} or \
           {r["et"] for r in rows} == {"hello world", "something else"}
    assert "__fp" not in dedup.columns

    # a duplicate arriving in a LATER batch but inside the watermark
    # horizon is dropped by the cross-batch fingerprint state
    _write_batch(spark, p, [
        ("u4", "2024-01-01 00:05:00", 4.0, "HELLO world."),
        ("u5", "2024-01-01 00:06:00", 5.0, "brand new doc"),
    ])
    rows2 = _run_to_rows(spark, stream_dedup(
        spark.readStream.schema(SCHEMA).parquet(p), "ts", ["et"], watermark="1 hour"),
        tmp_path, "sdedup", mode="append")  # same checkpoint -> only new file
    assert {r["et"] for r in rows2} == {"brand new doc"}

    # normalize=False keys on the raw string: case variants survive
    raw = stream_dedup(spark.readStream.schema(SCHEMA).parquet(p), "ts", ["et"],
                       watermark="1 hour", normalize=False)
    rows3 = _run_to_rows(spark, raw, tmp_path, "sdedup_raw", mode="append")
    assert len(rows3) == 5


def test_stream_running_features_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState running state == batch groupBy oracle."""
    import pandas as pd

    from feathr_spark.streaming.ingest import stream_running_features

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .load(f"{sf_dir}/events*")
        .withColumn("ts_s", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("double"))
    )
    out = stream_running_features(stream, "user_id", "ts_s", "value")
    name = "t_running_state"
    q = (
        out.writeStream.outputMode("update").format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas()
    # update mode may emit a key several times; last emission is final
    got = got.groupby("entity").last().reset_index()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .withColumn("ts_s", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("double"))
    oracle = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("user_id").cast("string").alias("entity")).agg(
        F.count("value").alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.max_by("value", "ts_s").alias("latest_value"),
    ).toPandas()
    m = got.merge(oracle, on="entity", suffixes=("", "_o"))
    assert len(m) == len(oracle)
    assert (m["n_events"] == m["n_events_o"]).all()
    assert np.allclose(m["value_sum"], m["value_sum_o"])
    assert np.allclose(m["latest_value"], m["latest_value_o"])


def test_stream_asof_enrich_matches_batch(spark, src_dir, tmp_path):
    """Micro-batched point-in-time enrichment == batch as-of join of the
    full input, regardless of how the source splits into batches
    (maxFilesPerTrigger=1 forces one epoch per source file)."""
    from feathr_spark import asof_join
    from feathr_spark.streaming import stream_asof_enrich

    # second file -> second micro-batch
    _write_batch(spark, src_dir, [
        ("u2", "2024-01-01 00:25:00", 7.0, "view"),
        ("u1", "2024-01-01 02:00:00", 9.0, "view"),
        ("u3", "2024-01-01 02:00:00", 4.0, "view"),   # no click ever -> null
    ])
    batch = spark.read.schema(SCHEMA).parquet(src_dir)
    fact = batch.where("et = 'click'").selectExpr("uid", "ts", "v").persist()
    fact.count()  # materialize before start: one plan execution per epoch

    stream = (
        spark.readStream.schema(SCHEMA).format("parquet")
        .option("maxFilesPerTrigger", 1).load(src_dir)
    )
    sink = str(tmp_path / "enriched")
    q = stream_asof_enrich(
        stream, fact, ["uid"], ["uid"], "ts", "ts",
        ["v as last_click_v"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink_path=sink,
        obs_ts_format="timestamp", fact_ts_format="timestamp",
    )
    q.awaitTermination(300)

    got = spark.read.parquet(sink)
    assert got.select(F.max("__epoch")).first()[0] >= 1  # really micro-batched
    want = asof_join(batch, fact, ["uid"], ["uid"], "ts", "ts",
                     ["v as last_click_v"],
                     obs_ts_format="timestamp", fact_ts_format="timestamp")

    def canon(df):
        return sorted(
            (r["uid"], str(r["ts"]), r["v"], r["et"], r["last_click_v"])
            for r in df.select("uid", "ts", "v", "et", "last_click_v").collect()
        )

    assert canon(got) == canon(want)
    fact.unpersist()


def test_stream_asof_enrich_arg_validation(spark, src_dir, tmp_path):
    from feathr_spark.streaming import stream_asof_enrich

    batch = spark.read.schema(SCHEMA).parquet(src_dir)
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(src_dir)
    with pytest.raises(ValueError, match="exactly one"):
        stream_asof_enrich(stream, batch, ["uid"], ["uid"], "ts", "ts",
                           ["v as x"], checkpoint_dir=str(tmp_path / "c"))


# ---------------------------------------------------------------------------
# streaming corpus ingestion with cross-batch near-dup dedup
# ---------------------------------------------------------------------------


def _doc(doc_id, words):
    return (doc_id, " ".join(words))


def test_stream_dedup_ingest_cross_batch(spark, tmp_path):
    """Two micro-batches: within-batch near-dups collapse to one rep,
    a batch-2 near-dup of a batch-1 doc is dropped against the
    materialized fingerprints, and re-running the whole stream with a
    fresh checkpoint (an at-least-once replay of every epoch) leaves
    the corpus unchanged (per-epoch dynamic overwrite + current-epoch
    exclusion in the fingerprint read)."""
    from feathr_spark.streaming import load_ingested, stream_dedup_ingest

    w_a = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
           "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    w_b = ["red", "orange", "yellow", "green", "blue", "indigo", "violet",
           "cyan", "magenta", "maroon", "olive", "navy", "teal", "aqua",
           "plum"]
    w_c = ["one", "two", "three", "four", "five", "six", "seven", "eight",
           "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
           "fifteen"]
    w_d = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibex",
           "jay", "kiwi", "lion", "mole", "newt", "orca"]
    src = str(tmp_path / "docs_src")
    schema = "doc_id string, text string"
    # batch 1: A, near-dup of A (one word differs), B
    spark.createDataFrame(
        [_doc("a1", w_a), _doc("a2", w_a[:-1] + ["CHANGED"]), _doc("b1", w_b)],
        schema).coalesce(1).write.mode("append").parquet(src)
    # batch 2: C, near-dup of B (cross-batch), D
    spark.createDataFrame(
        [_doc("c1", w_c), _doc("b9", w_b[:-1] + ["ALTERED"]), _doc("d1", w_d)],
        schema).coalesce(1).write.mode("append").parquet(src)

    corpus = str(tmp_path / "corpus")
    fp = str(tmp_path / "fp")

    def run(ckpt):
        stream = (spark.readStream.schema(schema).format("parquet")
                  .option("maxFilesPerTrigger", 1).load(src))
        q = stream_dedup_ingest(
            stream, corpus, fp, checkpoint_dir=str(tmp_path / ckpt),
            annotate_path=str(tmp_path / "audit"))
        q.awaitTermination(300)

    run("ckpt1")
    got = load_ingested(spark, corpus)
    kept_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert kept_ids == {"a1", "b1", "c1", "d1"}

    audit = spark.read.parquet(str(tmp_path / "audit"))
    byid = {r["doc_id"]: r for r in audit.collect()}
    assert byid["a2"]["cluster_rep"] == "a1" and not byid["a2"]["keep"]
    assert byid["b9"]["dup_of_corpus"] and not byid["b9"]["keep"]
    assert byid["c1"]["keep"] and byid["d1"]["keep"]

    # full at-least-once replay: fresh checkpoint, same sinks
    run("ckpt2")
    again = load_ingested(spark, corpus)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} \
        == {"a1", "b1", "c1", "d1"}
    assert again.count() == 4
    # fingerprint table mirrors the kept corpus exactly
    fps = spark.read.parquet(fp)
    assert {r["doc_id"] for r in fps.select("doc_id").collect()} \
        == {"a1", "b1", "c1", "d1"}
