"""Online feature store sink (Redis-shaped), materialization side.

Reference behavior (``offline/generation/outputProcessor/
RedisOutputUtils.scala:14-40`` + ``PushToRedisOutputProcessor.scala``):

- online key = ``concat_ws("#", key columns cast to string)``; a null
  key element becomes the guard string ``"_null_"`` and the row is
  dropped (a null entity key is unservable online);
- feature columns are encoded to strings (the reference uses
  protobuf+base64; here JSON — a public, connector-agnostic encoding
  that round-trips arrays and maps losslessly);
- the frame is handed to the spark-redis connector
  (``format("org.apache.spark.sql.redis")``) with the table name and
  key column.

The spark-redis jar isn't in this sandbox, so — like the Kafka and
JDBC modules — :func:`redis_write_spec` builds the exact frame +
options for the connector (jar-free testable), and
:func:`write_online` provides a connector-free path that pushes rows
through any injected client factory (``redis.Redis``-compatible
``hset``), per partition, batched via ``pipeline()`` when available.

Scale note (100 TB): the online push is embarrassingly parallel —
each executor partition opens one connection and pipelines its rows;
no shuffle is introduced (repartition beforehand only to match the
store's ingest parallelism). For streaming materialization call
:func:`write_online` from ``foreachBatch``.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_KEY_GUARD = "_null_"  # RedisOutputUtils.scala:16
REDIS_FORMAT = "org.apache.spark.sql.redis"
KEY_COLUMN = "feature_key"


def online_key_column(key_cols: Sequence[str]):
    """``concat_ws("#", keys)`` with the reference's null guard.

    Reference-faithful format: a key VALUE containing ``#`` is ambiguous
    in the composite (('a#b','c') == ('a','b#c')) — same as the
    reference; pre-escape the separator upstream if your keys allow it.
    """
    parts = [
        F.when(F.col(c).cast("string").isNull(), F.lit(NULL_KEY_GUARD))
        .otherwise(F.col(c).cast("string"))
        for c in key_cols
    ]
    return F.concat_ws("#", *parts)


def prepare_online_frame(
    df: DataFrame,
    key_cols: Sequence[str],
    feature_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(feature_key, <features as JSON strings>) — null-key rows dropped
    (reference drops rows whose composite key contains the guard)."""
    feature_cols = list(feature_cols or
                        [c for c in df.columns if c not in set(key_cols)])
    keyed = df.withColumn(KEY_COLUMN, online_key_column(key_cols))
    # drop rows by checking the SOURCE key columns for null, not by
    # substring-matching the guard in the composite key — a legitimate
    # key value containing "_null_" must not be dropped
    null_any = F.lit(False)
    for c in key_cols:
        null_any = null_any | F.col(c).cast("string").isNull()
    keyed = keyed.where(~null_any)
    # null feature -> SQL NULL (to_json would render "{}"): the online
    # hash simply omits the field, matching the reference's sparse write
    enc = [F.when(F.col(c).isNotNull(),
                  F.to_json(F.struct(F.col(c).alias("v")))).alias(c)
           for c in feature_cols]
    return keyed.select(KEY_COLUMN, *enc)


def redis_write_spec(
    df: DataFrame,
    table: str,
    key_cols: Sequence[str],
    host: str = "localhost",
    port: int = 6379,
    auth: Optional[str] = None,
    ssl: bool = False,
    feature_cols: Optional[Sequence[str]] = None,
) -> tuple[DataFrame, str, dict]:
    """The (frame, format, options) triple the spark-redis connector
    receives (RedisOutputUtils.scala:29-38). Caller runs
    ``frame.write.format(fmt).options(**opts).mode(...).save()`` with
    the connector jar on the classpath."""
    frame = prepare_online_frame(df, key_cols, feature_cols)
    opts = {
        "table": table,
        "key.column": KEY_COLUMN,
        "host": host,
        "port": str(port),
        "ssl": str(ssl).lower(),
    }
    if auth is not None:
        opts["auth"] = auth
    return frame, REDIS_FORMAT, opts


def write_online(
    df: DataFrame,
    table: str,
    key_cols: Sequence[str],
    client_factory: Callable[[], object],
    feature_cols: Optional[Sequence[str]] = None,
    batch_size: int = 500,
) -> None:
    """Connector-free online push: per executor partition, one client
    from ``client_factory`` (must be picklable; e.g. a zero-arg
    functools.partial over redis.Redis), rows written as
    ``HSET <table>:<feature_key> <feature> <json>``, pipelined in
    ``batch_size`` chunks when the client exposes ``pipeline()``."""
    frame = prepare_online_frame(df, key_cols, feature_cols)
    feature_names = [c for c in frame.columns if c != KEY_COLUMN]

    def _push(rows) -> None:
        client = client_factory()
        pipe = client.pipeline() if hasattr(client, "pipeline") else client
        n = 0
        for row in rows:
            mapping = {f: row[f] for f in feature_names if row[f] is not None}
            if mapping:
                pipe.hset(f"{table}:{row[KEY_COLUMN]}", mapping=mapping)
                n += 1
            if pipe is not client and n % batch_size == 0:
                pipe.execute()
        if pipe is not client and hasattr(pipe, "execute"):
            pipe.execute()
        if hasattr(client, "close"):
            client.close()

    frame.foreachPartition(_push)


def decode_online_value(payload: str):
    """Invert the JSON feature encoding (``{"v": ...}`` envelope keeps
    NULL distinguishable from the string "null")."""
    return json.loads(payload)["v"]


class LocalOnlineStore:
    """File-backed ``redis.Redis``-compatible shim (``hset``/``hget``/
    ``hgetall``): one JSON file per online key, written atomically
    (tmp + ``os.replace``), so executor partitions in any deploy mode
    can push concurrently as long as the directory is shared (local FS
    here; NFS/cloud-mount in a cluster test rig). This is the default
    store behind :class:`feathr_spark.client.FeathrClient` when no real
    client factory is injected — the production path is the same
    :func:`write_online` call with ``functools.partial(redis.Redis, ...)``.

    Instances are picklable (state = directory path), so the instance
    itself is a valid ``client_factory``.
    """

    def __init__(self, directory: str):
        import os

        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def __call__(self):  # client_factory protocol
        return self

    def _path(self, key: str) -> str:
        import hashlib
        import os

        h = hashlib.sha256(key.encode("utf-8")).hexdigest()[:32]
        return os.path.join(self.directory, h + ".json")

    def hset(self, key: str, mapping: dict) -> None:
        import json as _json
        import os
        import tempfile

        path = self._path(key)
        current = {}
        if os.path.exists(path):
            with open(path) as fh:
                current = _json.load(fh)["fields"]
        current.update(mapping)
        fd, tmp = tempfile.mkstemp(dir=self.directory)
        with os.fdopen(fd, "w") as fh:
            _json.dump({"key": key, "fields": current}, fh)
        os.replace(tmp, path)

    def hget(self, key: str, field: str):
        return self.hgetall(key).get(field)

    def hgetall(self, key: str) -> dict:
        import json as _json
        import os

        path = self._path(key)
        if not os.path.exists(path):
            return {}
        with open(path) as fh:
            return _json.load(fh)["fields"]
