"""Iceberg table layout for the corpus store (config + DDL plumbing).

The north-star storage is an Iceberg table of pre-tokenized training
sequences, hash-partitioned by entity key and timestamp-sorted. The
Iceberg Spark runtime jar isn't in this sandbox, so — as with
Kafka/JDBC/Redis — this module produces the exact session configuration,
DDL, and read options the Iceberg runtime consumes (all public Apache
Iceberg Spark API), jar-free testable; `sources/bucketed.py` is the
functionally-equivalent native layout the tests and benches exercise
(same HashPartitioning contract, so the engine's shuffle-elision works
identically on either store).

Supply the runtime at submit time::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver> \
        --conf <each key from iceberg_catalog_conf()> ...

Scale notes (100 TB):
- ``bucket(N, key)`` keeps every write/read co-partitioned by entity —
  Iceberg's storage-partitioned joins + Spark's
  ``spark.sql.sources.v2.bucketing.enabled`` elide the fact-side
  Exchange exactly as native bucketing does locally.
- ``write.distribution-mode=hash`` clusters rows to partition-writers
  (one file per bucket per commit, no small-file explosion).
- snapshot reads (``snapshot-id`` / ``as-of-timestamp``) give the
  resumable, repeatable scans the incremental materializer needs: a
  retried run re-reads the SAME snapshot, never a moving table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

RUNTIME_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-3.5_2.13"


def iceberg_catalog_conf(
    catalog: str = "corpus",
    warehouse: str = "s3://warehouse/corpus",
    catalog_impl: str = "hadoop",
) -> dict:
    """Session conf for an Iceberg catalog (hadoop/hive/rest)."""
    base = f"spark.sql.catalog.{catalog}"
    conf = {
        base: "org.apache.iceberg.spark.SparkCatalog",
        f"{base}.warehouse": warehouse,
        # v2 bucketing: let Spark use Iceberg's bucket partitioning to
        # satisfy join/window distributions without an Exchange
        "spark.sql.sources.v2.bucketing.enabled": "true",
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    }
    if catalog_impl == "hadoop":
        conf[f"{base}.type"] = "hadoop"
    elif catalog_impl == "hive":
        conf[f"{base}.type"] = "hive"
    elif catalog_impl == "rest":
        conf[f"{base}.catalog-impl"] = "org.apache.iceberg.rest.RESTCatalog"
    else:
        raise ValueError(f"unknown catalog_impl {catalog_impl!r}")
    return conf


def corpus_table_ddl(
    table: str,
    schema_ddl: str = ("doc_id string, tokens array<int>, n_tok int, "
                       "source string, event_ts bigint"),
    bucket_key: str = "doc_id",
    num_buckets: int = 128,
    sort_cols: Sequence[str] = ("doc_id", "event_ts"),
    fmt_props: Optional[dict] = None,
) -> list[str]:
    """DDL statements for the north-star corpus table: hash-bucketed by
    entity, timestamp-sorted within files, zstd parquet, hash write
    distribution. Returns [CREATE TABLE, ALTER ... WRITE ORDERED BY]."""
    props = {
        "format-version": "2",
        "write.parquet.compression-codec": "zstd",
        "write.distribution-mode": "hash",
    }
    props.update(fmt_props or {})
    props_sql = ", ".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
    create = (
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) USING iceberg "
        f"PARTITIONED BY (bucket({num_buckets}, {bucket_key})) "
        f"TBLPROPERTIES ({props_sql})"
    )
    order = ", ".join(sort_cols)
    alter = f"ALTER TABLE {table} WRITE ORDERED BY ({order})"
    return [create, alter]


def snapshot_read_options(
    snapshot_id: Optional[int] = None,
    as_of_timestamp_ms: Optional[int] = None,
) -> dict:
    """Pin a read to one snapshot (repeatable scans for resumable jobs).

    Exactly one selector; an unpinned read of a live table is not
    retry-safe (a retry could see newer data — the same hazard the
    materializer's manifests guard against on plain parquet)."""
    if (snapshot_id is None) == (as_of_timestamp_ms is None):
        raise ValueError("exactly one of snapshot_id/as_of_timestamp_ms")
    if snapshot_id is not None:
        return {"snapshot-id": str(snapshot_id)}
    return {"as-of-timestamp": str(as_of_timestamp_ms)}


def incremental_read_options(
    start_snapshot_id: int,
    end_snapshot_id: Optional[int] = None,
) -> dict:
    """Changes-since read (the snapshot ⊕ delta input of the
    incremental aggregation path, materialize.py): rows appended after
    ``start_snapshot_id`` (exclusive) up to ``end`` (inclusive)."""
    opts = {"start-snapshot-id": str(start_snapshot_id)}
    if end_snapshot_id is not None:
        opts["end-snapshot-id"] = str(end_snapshot_id)
    return opts


def read_iceberg(
    spark: SparkSession,
    table: str,
    options: Optional[dict] = None,
) -> DataFrame:
    """Read an Iceberg table (optionally snapshot-pinned). Raises a
    clear error when the runtime jar is absent."""
    try:
        r = spark.read
        for k, v in (options or {}).items():
            r = r.option(k, v)
        return r.table(table)
    except Exception as e:  # pragma: no cover - jar-dependent
        msg = str(e)
        # only a missing-runtime failure earns the jar hint; a missing
        # table / bad snapshot id / auth error re-raises untouched
        if "ClassNotFound" in msg or "NoClassDefFoundError" in msg \
                or "Cannot find catalog plugin" in msg:
            raise RuntimeError(
                f"Iceberg read failed — is {RUNTIME_PACKAGE} on the classpath "
                f"and the catalog configured (iceberg_catalog_conf)?") from e
        raise
