"""JDBC/Snowflake source plumbing and the Redis-shaped online sink.

Jar-free: option maps are asserted against the reference's key names
(JDBCUtils.scala:23-46, SnowflakeDataLoader.scala:37-45,
RedisOutputUtils.scala:14-40); the connector-free online push runs for
real through foreachPartition with a file-backed fake client.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import uuid

import pytest

from feathr_spark.sources.external import (
    JDBC_FORMAT,
    SNOWFLAKE_FORMAT,
    JdbcConfig,
    SnowflakeConfig,
    jdbc_options,
    snowflake_config_from_url,
    snowflake_options,
)
from feathr_spark.sources.online import (
    KEY_COLUMN,
    NULL_KEY_GUARD,
    decode_online_value,
    prepare_online_frame,
    redis_write_spec,
    write_online,
)


def test_jdbc_options_password_auth():
    cfg = JdbcConfig(url="jdbc:postgresql://db:5432/x", dbtable="events",
                     driver="org.postgresql.Driver", user="u", password="p",
                     partition_column="event_id", num_partitions=16,
                     lower_bound=0, upper_bound=1_000_000)
    opts = jdbc_options(cfg)
    assert opts["url"].startswith("jdbc:postgresql")
    assert opts["dbtable"] == "events" and opts["driver"] == "org.postgresql.Driver"
    assert (opts["user"], opts["password"]) == ("u", "p")
    # parallel-scan options (single-task JDBC scans don't scale)
    assert opts["numPartitions"] == "16" and opts["partitionColumn"] == "event_id"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert JDBC_FORMAT == "jdbc"


def test_jdbc_options_token_auth_and_query():
    opts = jdbc_options(JdbcConfig(url="jdbc:sqlserver://h", query="SELECT 1",
                                   token="tok"))
    assert opts["accessToken"] == "tok" and opts["query"] == "SELECT 1"
    assert "user" not in opts and "dbtable" not in opts


def test_jdbc_options_validation():
    with pytest.raises(ValueError, match="dbtable/query"):
        jdbc_options(JdbcConfig(url="jdbc:x://h"))
    with pytest.raises(ValueError, match="bounds"):
        jdbc_options(JdbcConfig(url="jdbc:x://h", dbtable="t",
                                partition_column="id"))


def test_snowflake_options_reference_keys():
    cfg = SnowflakeConfig(sf_url="acct.snowflakecomputing.com", user="u",
                          role="r", warehouse="w", database="d", schema="s",
                          dbtable="events", password="pw")
    opts = snowflake_options(cfg)
    assert opts["sfURL"] == "acct.snowflakecomputing.com"
    assert (opts["sfUser"], opts["sfRole"], opts["sfWarehouse"]) == ("u", "r", "w")
    assert (opts["sfDatabase"], opts["sfSchema"]) == ("d", "s")
    assert opts["sfPassword"] == "pw" and opts["dbtable"] == "events"
    assert SNOWFLAKE_FORMAT == "net.snowflake.spark.snowflake"


def test_snowflake_config_from_url_merges_query_params():
    cfg = snowflake_config_from_url(
        "snowflake://acct.snowflakecomputing.com?sfDatabase=D&sfSchema=S"
        "&dbtable=T&sfTimezone=UTC", user="u", role="r", warehouse="w")
    opts = snowflake_options(cfg)
    assert opts["sfDatabase"] == "D" and opts["sfSchema"] == "S"
    assert opts["dbtable"] == "T"
    assert opts["sfTimezone"] == "UTC"  # passthrough param preserved


def test_prepare_online_frame_null_guard(spark):
    df = spark.createDataFrame(
        [("u1", 7, 1.5), (None, 8, 2.5), ("u3", None, 3.5)],
        "uid string, k int, score double")
    out = prepare_online_frame(df, ["uid", "k"]).collect()
    keys = sorted(r[KEY_COLUMN] for r in out)
    # rows with ANY null key element are dropped (guard string marks them)
    assert keys == ["u1#7"]
    assert NULL_KEY_GUARD == "_null_"
    row = out[0]
    assert decode_online_value(row["score"]) == 1.5


def test_redis_write_spec_options(spark):
    df = spark.createDataFrame([("u1", 1.0)], "uid string, f double")
    frame, fmt, opts = redis_write_spec(df, "feat_table", ["uid"],
                                        host="r.example", port=6380,
                                        auth="secret", ssl=True)
    assert fmt == "org.apache.spark.sql.redis"
    assert opts == {"table": "feat_table", "key.column": KEY_COLUMN,
                    "host": "r.example", "port": "6380", "ssl": "true",
                    "auth": "secret"}
    assert frame.columns == [KEY_COLUMN, "f"]


def test_write_online_roundtrip(spark, tmp_path):
    outdir = str(tmp_path)

    # defined inside the test: cloudpickle ships nested classes by VALUE,
    # so executor workers don't need this test module on their path
    class FileBackedPipe:
        """Mimics redis-py pipeline(): buffers hset, execute() flushes."""

        def __init__(self, outdir):
            self.outdir = outdir
            self.buf = []

        def hset(self, key, mapping):
            self.buf.append((key, mapping))

        def execute(self):
            if self.buf:
                p = os.path.join(self.outdir, uuid.uuid4().hex + ".jsonl")
                with open(p, "w") as fh:
                    for k, m in self.buf:
                        fh.write(json.dumps([k, m]) + "\n")
                self.buf = []

    class FileBackedClient:
        def __init__(self, outdir):
            self.outdir = outdir

        def pipeline(self):
            return FileBackedPipe(self.outdir)

        def close(self):
            pass

    df = spark.createDataFrame(
        [("u1", 1.25, [1, 2, 3]), ("u2", None, [4]), (None, 9.0, [5])],
        "uid string, score double, toks array<int>")
    write_online(df, "ft", ["uid"],
                 functools.partial(FileBackedClient, outdir), batch_size=2)
    got = {}
    for p in glob.glob(f"{outdir}/*.jsonl"):
        with open(p) as fh:
            for line in fh:
                k, m = json.loads(line)
                got[k] = {f: decode_online_value(v) for f, v in m.items()}
    # null-key row dropped; null feature omitted from the hash
    assert got == {"ft:u1": {"score": 1.25, "toks": [1, 2, 3]},
                   "ft:u2": {"toks": [4]}}


# ---------------------------------------------------------------------------
# Iceberg plumbing (jar-free)
# ---------------------------------------------------------------------------


def test_iceberg_catalog_conf_and_ddl():
    from feathr_spark.sources.iceberg import (
        corpus_table_ddl,
        iceberg_catalog_conf,
        incremental_read_options,
        snapshot_read_options,
    )

    conf = iceberg_catalog_conf("corpus", "s3://wh/corpus")
    assert conf["spark.sql.catalog.corpus"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.corpus.warehouse"] == "s3://wh/corpus"
    assert conf["spark.sql.sources.v2.bucketing.enabled"] == "true"

    create, alter = corpus_table_ddl("corpus.db.fact")
    assert "PARTITIONED BY (bucket(128, doc_id))" in create
    assert "USING iceberg" in create and "tokens array<int>" in create
    assert "'write.distribution-mode'='hash'" in create
    assert alter == "ALTER TABLE corpus.db.fact WRITE ORDERED BY (doc_id, event_ts)"

    assert snapshot_read_options(snapshot_id=42) == {"snapshot-id": "42"}
    assert snapshot_read_options(as_of_timestamp_ms=1700000000000) == \
        {"as-of-timestamp": "1700000000000"}
    with pytest.raises(ValueError):
        snapshot_read_options()
    assert incremental_read_options(10, 20) == \
        {"start-snapshot-id": "10", "end-snapshot-id": "20"}
