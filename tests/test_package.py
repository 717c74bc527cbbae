"""spark-submit --py-files packaging (north_star deployment contract)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

from feathr_spark.package import build_pyfiles_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_contains_package(tmp_path):
    out = build_pyfiles_zip(str(tmp_path / "fs.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "feathr_spark/__init__.py" in names
    assert "feathr_spark/operators/swa.py" in names
    assert not any("__pycache__" in n for n in names)
    # deterministic build: rebuilding yields identical bytes
    out2 = build_pyfiles_zip(str(tmp_path / "fs2.zip"))
    assert open(out, "rb").read() == open(out2, "rb").read()


def test_zip_importable(tmp_path):
    """The zip must be importable from its root — what --py-files does."""
    out = build_pyfiles_zip(str(tmp_path / "fs.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import feathr_spark.definitions as d; "
        "print(d.SWAFeature('x', 'SUM', 'v', d.WindowSpec(60)).name)" % out
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "x"


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """Run the REAL deployment command: ``spark-submit --py-files fs.zip
    jobs/corpus_features.py join --synthesize ...`` in a scratch cwd with
    the job script copied out of the repo, so ``import feathr_spark`` can
    resolve ONLY through the --py-files zip (the checkout is not on any
    path the driver or executors see). This is the north-star deployment
    contract executed end-to-end, not simulated."""
    import shutil

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):  # pragma: no cover - sandbox always has it
        import pytest
        pytest.skip("spark-submit not installed")

    zip_path = build_pyfiles_zip(str(tmp_path / "fs.zip"))
    job = tmp_path / "corpus_features.py"
    shutil.copyfile(os.path.join(REPO, "jobs", "corpus_features.py"), job)
    out_dir = tmp_path / "features"

    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable,
               # scratch local dir; don't fight the session-default sweep
               FEATHR_SPARK_LOCAL_DIR=str(tmp_path / "local"))
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    res = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.driver.memory=4g",
         "--py-files", zip_path, str(job),
         "join", "--synthesize", "0.002", "--output", str(out_dir)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    import json
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["mode"] == "join"
    assert report["rows"] > 0
    # the output is a real parquet dataset with the battery columns
    import duckdb
    cols = {r[0] for r in duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/*.parquet')").fetchall()}
    assert {"doc_id", "tok_sum_1d", "src_cnt_7d", "last_tokens"} <= cols


def test_job_tokenize_mode(tmp_path, sf_dir):
    """jobs CLI tokenize mode: documents -> vocab + pre-tokenized corpus."""
    import json
    import subprocess

    out = tmp_path / "tok"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "corpus_features.py"),
         "tokenize", "--docs", f"{sf_dir}/documents.parquet",
         "--output", str(out), "--vocab-size", "200", "--cpus", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] == 500 and rep["vocab_size"] > 0
    assert os.path.exists(out / "tokens") and os.path.exists(out / "vocab")


def test_job_curate_mode(tmp_path, sf_dir):
    """jobs CLI curate mode: raw documents -> curated corpus + funnel."""
    import json
    import subprocess

    out = tmp_path / "curated"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "corpus_features.py"),
         "curate", "--docs", f"{sf_dir}/documents.parquet",
         "--output", str(out), "--min-words", "25",
         "--min-stopword-hits", "1",
         "--max-per-source", "30", "--funnel-counts", "--cpus", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["mode"] == "curate" and rep["rows"] > 0
    stages = [s["stage"] for s in rep["funnel"]]
    assert stages == ["input", "gopher", "exact_dedup", "source_cap"]
    counts = [s["rows"] for s in rep["funnel"]]
    assert counts[0] == 500 and counts[-1] == rep["rows"]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_job_shard_mode(tmp_path, sf_dir):
    """jobs CLI shard mode: tokenize first, then write resumable
    pos-sorted shards with per-shard manifests; a second run resumes
    (all shards committed -> nothing rewritten)."""
    import json
    import subprocess

    tok = tmp_path / "tok"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "corpus_features.py"),
         "tokenize", "--docs", f"{sf_dir}/documents.parquet",
         "--output", str(tok), "--vocab-size", "200", "--cpus", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    out = tmp_path / "shards"
    cmd = [sys.executable, os.path.join(REPO, "jobs", "corpus_features.py"),
           "shard", "--tokens", str(tok / "tokens"),
           "--output", str(out), "--n-shards", "6",
           "--chunk-size", "32", "--cpus", "4"]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["mode"] == "shard" and rep["shards_written"] == 6
    assert rep["rows_written"] > 0
    assert all(os.path.exists(out / f"shard={k}" / "_manifest.json")
               for k in range(6))

    # resume: everything committed, nothing rewritten
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep2 = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep2["shards_written"] == 0 and rep2["shards_skipped"] == 6


def test_job_report_mode(tmp_path, sf_dir):
    """jobs CLI report mode: documents -> datacard JSON."""
    import json
    import subprocess

    out = tmp_path / "card.json"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "corpus_features.py"),
         "report", "--docs", f"{sf_dir}/documents.parquet",
         "--output", str(out), "--cpus", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["mode"] == "report" and rep["datacard"]["n_docs"] == 500.0
    card = json.loads(out.read_text())
    assert card["n_docs"] == 500.0
    assert any(k.startswith("share:") for k in card)
