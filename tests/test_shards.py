"""Resumable sharded corpus writer (feathr_spark/sources/shards.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from feathr_spark.materialize import is_committed, read_manifest
from feathr_spark.operators.corpus import shard_shuffle
from feathr_spark.sources.shards import (load_shards, shard_report,
                                         write_shards)


@pytest.fixture()
def docs(spark):
    return (spark.range(0, 400)
            .select(F.concat(F.lit("doc_"), F.col("id").cast("string"))
                    .alias("doc_id"),
                    (F.col("id") * 7 % 101).alias("val")))


def test_write_and_load_round_trip(spark, docs, tmp_path):
    sink = str(tmp_path / "shards")
    report = write_shards(docs, sink, n_shards=8, seed=3, wave_size=3)
    assert sorted(report["written"]) == list(range(8))
    assert report["skipped"] == []
    assert report["metrics"]["rows_written"] == 400
    assert report["metrics"]["waves"] == 3  # ceil(8/3)

    back = load_shards(spark, sink)
    assert back.count() == 400
    # every row exactly once
    assert back.select("doc_id").distinct().count() == 400
    # shard/pos match the deterministic assignment
    expect = {(r["doc_id"], r["shard"], r["pos"])
              for r in shard_shuffle(docs, 8, seed=3).collect()}
    got = {(r["doc_id"], r["shard"], r["pos"]) for r in back.collect()}
    assert got == expect

    rep = shard_report(sink)
    assert rep["committed"] == 8 and rep["rows_total"] == 400
    m = read_manifest(os.path.join(sink, "shard=0"))
    assert m["n_shards"] == 8 and m["seed"] == 3 and m["rows"] > 0
    assert m["checksum"] is not None


def test_resume_skips_committed_and_rewrites_torn(spark, docs, tmp_path):
    sink = str(tmp_path / "shards")
    write_shards(docs, sink, n_shards=6, seed=1, wave_size=6)
    before = shard_report(sink)["rows_per_shard"]

    # simulate a kill: shard 2 fully lost, shard 4 torn (data present,
    # manifest never committed)
    shutil.rmtree(os.path.join(sink, "shard=2"))
    os.remove(os.path.join(sink, "shard=4", "_manifest.json"))
    assert not is_committed(os.path.join(sink, "shard=4"))
    with pytest.raises(FileNotFoundError):
        load_shards(spark, sink, shards=[2])
    # torn shard is invisible to readers until recommitted
    committed_rows = load_shards(spark, sink).count()
    assert committed_rows == 400 - before[2] - before[4]

    report = write_shards(docs, sink, n_shards=6, seed=1, wave_size=6)
    assert sorted(report["written"]) == [2, 4]
    assert sorted(report["skipped"]) == [0, 1, 3, 5]
    after = shard_report(sink)["rows_per_shard"]
    assert after == before  # byte-identical assignment -> same counts
    assert load_shards(spark, sink).count() == 400


def test_rows_sorted_by_pos_within_shard_files(spark, docs, tmp_path):
    sink = str(tmp_path / "shards")
    write_shards(docs, sink, n_shards=4, seed=0, wave_size=4,
                 with_checksum=False)
    m = read_manifest(os.path.join(sink, "shard=1"))
    assert m["checksum"] is None
    # physical row order inside each shard's files == pos order
    one = spark.read.parquet(os.path.join(sink, "shard=1"))
    got = [r["pos"] for r in one.select("pos").collect()]
    assert got == sorted(got)


def test_load_subset_and_no_commits(spark, docs, tmp_path):
    sink = str(tmp_path / "s2")
    write_shards(docs, sink, n_shards=5, seed=9)
    sub = load_shards(spark, sink, shards=[0, 3])
    assert set(r["shard"] for r in sub.select("shard").distinct().collect()) \
        == {0, 3}
    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        load_shards(spark, empty)


def test_empty_shards_commit_and_report(spark, tmp_path):
    # 3 rows into 128 shards: almost every shard is empty. Dynamic
    # partition overwrite creates no dir for them — write_shards must
    # still commit a manifest (rows=0) instead of crashing mid-wave.
    sink = str(tmp_path / "sparse")
    few = (spark.range(0, 3)
           .select(F.concat(F.lit("d"), F.col("id").cast("string"))
                   .alias("doc_id"), F.col("id").alias("val")))
    report = write_shards(few, sink, n_shards=128, seed=1, wave_size=64)
    assert sorted(report["written"]) == list(range(128))
    assert report["metrics"]["rows_written"] == 3
    rep = shard_report(sink)
    assert rep["committed"] == 128 and rep["rows_total"] == 3
    assert load_shards(spark, sink).count() == 3
    # rerun: everything committed -> full skip, no work
    again = write_shards(few, sink, n_shards=128, seed=1)
    assert again["written"] == [] and len(again["skipped"]) == 128


def test_resume_rejects_changed_parameters(spark, docs, tmp_path):
    # committed shards under one assignment + resume under another would
    # silently duplicate/lose rows — the writer must refuse
    sink = str(tmp_path / "guard")
    write_shards(docs, sink, n_shards=8, seed=3)
    for kwargs in ({"n_shards": 16, "seed": 3},
                   {"n_shards": 8, "seed": 4},
                   {"n_shards": 8, "seed": 3, "key_col": "val"},
                   {"n_shards": 8, "seed": 3,
                    "hash_col": F.xxhash64("doc_id")}):
        with pytest.raises(ValueError, match="different assignment"):
            write_shards(docs, sink, **kwargs)
    # the original parameters still resume cleanly
    ok = write_shards(docs, sink, n_shards=8, seed=3)
    assert ok["written"] == [] and len(ok["skipped"]) == 8


def test_resume_guard_checks_every_skipped_shard(spark, docs, tmp_path):
    # a sink mixing two assignments (aborted non-resume rerun over an
    # older fully-committed sink) must be refused even when the FIRST
    # skipped shard happens to match the current parameters
    import json
    sink = str(tmp_path / "mixed")
    write_shards(docs, sink, n_shards=4, seed=3)
    # simulate: shard 0 recommitted under seed=4, rest still seed=3 —
    # rewrite through the same fsio commit path a real rerun uses (a raw
    # POSIX write would desync Hadoop LocalFileSystem's .crc sidecar)
    from feathr_spark import fsio
    from feathr_spark.materialize import _commit
    mp = sink + "/shard=0"
    m = json.loads(fsio.read_text(mp + "/_manifest.json"))
    m["seed"] = 4
    _commit(mp, m)
    with pytest.raises(ValueError, match="shard=[123].*different assignment"):
        write_shards(docs, sink, n_shards=4, seed=4)


def test_load_all_empty_sink_returns_typed_empty(spark, tmp_path):
    sink = str(tmp_path / "void")
    empty = (spark.range(0).select(
        F.col("id").cast("string").alias("doc_id"),
        F.col("id").alias("val")))
    rep = write_shards(empty, sink, n_shards=16, seed=0)
    assert rep["metrics"]["rows_written"] == 0
    back = load_shards(spark, sink)
    assert back.count() == 0
    assert set(back.columns) >= {"doc_id", "val", "shard", "pos"}


def test_kill_resume_through_file_uri(spark, docs, tmp_path):
    # manifest I/O must run through the Hadoop FS API: the whole
    # kill/resume cycle over an explicit file:// URI sink (the exact
    # code path an hdfs:// or s3a:// sink takes)
    local = str(tmp_path / "uri_shards")
    sink = "file://" + local
    write_shards(docs, sink, n_shards=4, seed=2, wave_size=4)
    before = shard_report(sink)["rows_per_shard"]
    assert len(before) == 4

    # kill: shard 1 fully lost, shard 3 torn (manifest removed)
    shutil.rmtree(os.path.join(local, "shard=1"))
    os.remove(os.path.join(local, "shard=3", "_manifest.json"))
    assert not is_committed(sink + "/shard=3")
    assert load_shards(spark, sink).count() == 400 - before[1] - before[3]

    report = write_shards(docs, sink, n_shards=4, seed=2, wave_size=4)
    assert sorted(report["written"]) == [1, 3]
    assert sorted(report["skipped"]) == [0, 2]
    assert shard_report(sink)["rows_per_shard"] == before
    assert load_shards(spark, sink).count() == 400
