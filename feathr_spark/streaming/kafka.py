"""Kafka streaming-source plumbing (spec → ``readStream`` config).

Reference: offline/source/dataloader/stream/KafkaDataLoader.scala:24-77 —
builds a ``readStream.format("kafka")`` with bootstrap servers + topic
subscription and decodes the Avro payload; the config travels as a
KafkaEndpoint(brokers, topics, schema) spec.

The sandbox ships no spark-sql-kafka jar, so this module keeps the
config construction (pure, unit-testable) separate from ``.load()``:
``kafka_options`` is the full option map the reader receives, and
``kafka_stream`` wires it + payload decode, raising a clear error when
the connector jar is absent (on a real cluster: add
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaConfig:
    """Kafka endpoint spec (reference KafkaEndpoint/KafkaConfig:
    feathr_project/feathr/definition/source.py KafkaSource)."""

    brokers: Sequence[str]
    topics: Sequence[str]
    starting_offsets: str = "latest"  # latest | earliest | JSON offsets
    fail_on_data_loss: bool = False
    max_offsets_per_trigger: Optional[int] = None
    options: dict = field(default_factory=dict)  # raw passthrough, wins


def kafka_options(cfg: KafkaConfig) -> dict:
    """The exact option map handed to ``readStream.format("kafka")``."""
    opts = {
        "kafka.bootstrap.servers": ",".join(cfg.brokers),
        "subscribe": ",".join(cfg.topics),
        "startingOffsets": cfg.starting_offsets,
        "failOnDataLoss": str(cfg.fail_on_data_loss).lower(),
    }
    if cfg.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    opts.update(cfg.options)
    return opts


def kafka_stream(
    spark: SparkSession,
    cfg: KafkaConfig,
    value_format: str = "json",
    value_schema: Optional[str] = None,
) -> DataFrame:
    """Kafka micro-batch source with payload decode.

    ``value_format``: "json" (``from_json`` with ``value_schema`` DDL),
    "avro" (``from_avro`` with an Avro schema string — the reference's
    decode path), or "binary" (raw key/value passthrough).
    Returns the decoded columns plus Kafka metadata
    (topic, partition, offset, timestamp).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(cfg).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # pragma: no cover - jar absent in sandbox
        raise RuntimeError(
            "Kafka connector not on the classpath; submit with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from e
    meta = [F.col("topic"), F.col("partition"), F.col("offset"),
            F.col("timestamp").alias("kafka_ts")]
    if value_format == "binary":
        return raw.select(F.col("key"), F.col("value"), *meta)
    if value_format == "json":
        if not value_schema:
            raise ValueError("value_schema (DDL string) required for json decode")
        parsed = F.from_json(F.col("value").cast("string"), value_schema)
        return raw.select(parsed.alias("v"), *meta).select("v.*", *[c for c in
                                                                    ("topic", "partition", "offset", "kafka_ts")])
    if value_format == "avro":
        if not value_schema:
            raise ValueError("value_schema (Avro JSON schema) required for avro decode")
        from pyspark.sql.avro.functions import from_avro
        parsed = from_avro(F.col("value"), value_schema)
        return raw.select(parsed.alias("v"), *meta).select("v.*", *[c for c in
                                                                    ("topic", "partition", "offset", "kafka_ts")])
    raise ValueError(f"unknown value_format {value_format!r}")
