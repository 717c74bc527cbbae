"""External warehouse sources: JDBC and Snowflake (config plumbing).

Reference behavior:
- ``offline/source/dataloader/jdbc/JDBCUtils.scala:13-61`` — option maps
  for the three auth modes (user/password, access token, none), driver +
  dbtable keys, ``spark.read.format("jdbc")`` loader.
- ``offline/source/dataloader/jdbc/SnowflakeDataLoader.scala:14-51`` —
  ``net.snowflake.spark.snowflake`` format, sfURL/sfUser/sfRole/
  sfWarehouse auth params merged with URL query parameters.

No JDBC driver / Snowflake connector jars ship in this sandbox, so —
exactly like the Kafka module (`streaming/kafka.py`) — these builders
produce the precise reader configuration and raise a clear error only
at ``.load()`` time when the jar is absent (supply it via
``spark-submit --packages`` / ``--jars``).

Scale note (100 TB): a JDBC scan is single-task unless partitioned —
``partition_column``/``num_partitions``/bounds map to Spark's built-in
parallel JDBC read (one executor task per bound slice). Always set them
for any table that doesn't fit one task; ``fetchsize`` controls the
per-round-trip row batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import parse_qsl, urlparse

from pyspark.sql import DataFrame, SparkSession

JDBC_FORMAT = "jdbc"
SNOWFLAKE_FORMAT = "net.snowflake.spark.snowflake"


@dataclass(frozen=True)
class JdbcConfig:
    """One JDBC source (reference JDBCUtils.scala conf keys
    ``feathr.jdbc.{driver,dbtable,user,password,token}``)."""

    url: str
    dbtable: Optional[str] = None
    query: Optional[str] = None
    driver: str = ""
    user: Optional[str] = None
    password: Optional[str] = None
    token: Optional[str] = None
    partition_column: Optional[str] = None
    num_partitions: Optional[int] = None
    lower_bound: Optional[int] = None
    upper_bound: Optional[int] = None
    fetchsize: int = 10_000


def jdbc_options(cfg: JdbcConfig) -> dict:
    """The exact option map handed to ``spark.read.format("jdbc")``.

    Mirrors the reference's three auth modes (JDBCUtils.scala:23-46):
    user/password, access token (``accessToken``), or none.
    """
    if bool(cfg.dbtable) == bool(cfg.query):
        raise ValueError("exactly one of dbtable/query is required")
    opts = {"url": cfg.url, "fetchsize": str(cfg.fetchsize)}
    if cfg.dbtable:
        opts["dbtable"] = cfg.dbtable
    else:
        opts["query"] = cfg.query
    if cfg.driver:
        opts["driver"] = cfg.driver
    if cfg.token is not None:
        opts["accessToken"] = cfg.token
    elif cfg.user is not None:
        opts["user"] = cfg.user
        opts["password"] = cfg.password or ""
    if cfg.partition_column:
        if cfg.num_partitions is None or cfg.lower_bound is None \
                or cfg.upper_bound is None:
            raise ValueError(
                "partitioned JDBC read needs num_partitions + bounds")
        opts.update({
            "partitionColumn": cfg.partition_column,
            "numPartitions": str(cfg.num_partitions),
            "lowerBound": str(cfg.lower_bound),
            "upperBound": str(cfg.upper_bound),
        })
    return opts


def _is_missing_class(e: Exception) -> bool:
    """Only a ClassNotFound-shaped failure earns the 'missing jar' hint;
    anything else (bad SQL, auth, missing table) re-raises untouched."""
    msg = str(e)
    return "ClassNotFound" in msg or "Failed to find data source" in msg \
        or "NoClassDefFoundError" in msg


def read_jdbc(spark: SparkSession, cfg: JdbcConfig) -> DataFrame:
    """Load a JDBC source. Raises a clear error when the driver jar is
    absent (add ``--jars <driver>.jar`` at submit time)."""
    opts = jdbc_options(cfg)  # config errors surface as-is, outside the try
    try:
        return spark.read.format(JDBC_FORMAT).options(**opts).load()
    except Exception as e:  # pragma: no cover - jar-dependent
        if _is_missing_class(e):
            raise RuntimeError(
                f"JDBC load failed — is the driver jar "
                f"({cfg.driver or 'for ' + cfg.url}) on the classpath? "
                f"Add it via spark-submit --jars") from e
        raise


@dataclass(frozen=True)
class SnowflakeConfig:
    """Snowflake source (reference SnowflakeDataLoader.scala:37-45).

    ``url_params`` — extra query parameters (reference merges the source
    URL's query string over the session auth params,
    SnowflakeDataLoader.scala:24-35); explicit fields win over none.
    """

    sf_url: str
    user: str
    role: str
    warehouse: str
    database: Optional[str] = None
    schema: Optional[str] = None
    dbtable: Optional[str] = None
    query: Optional[str] = None
    password: Optional[str] = None
    url_params: dict = field(default_factory=dict)


def snowflake_options(cfg: SnowflakeConfig) -> dict:
    if bool(cfg.dbtable) == bool(cfg.query):
        raise ValueError("exactly one of dbtable/query is required")
    opts = {
        "sfURL": cfg.sf_url,
        "sfUser": cfg.user,
        "sfRole": cfg.role,
        "sfWarehouse": cfg.warehouse,
    }
    if cfg.password is not None:
        opts["sfPassword"] = cfg.password
    if cfg.database:
        opts["sfDatabase"] = cfg.database
    if cfg.schema:
        opts["sfSchema"] = cfg.schema
    opts.update({k: str(v) for k, v in cfg.url_params.items()})
    opts["dbtable" if cfg.dbtable else "query"] = cfg.dbtable or cfg.query
    return opts


def snowflake_config_from_url(url: str, **kwargs) -> SnowflakeConfig:
    """Parse a ``snowflake://<account-url>?sfDatabase=..&sfSchema=..&
    dbtable=..`` location into a config (reference parses the URL query
    the same way, SnowflakeDataLoader.scala:24-35)."""
    u = urlparse(url)
    params = dict(parse_qsl(u.query))
    return SnowflakeConfig(
        sf_url=u.netloc,
        user=kwargs.get("user", params.pop("sfUser", "")),
        role=kwargs.get("role", params.pop("sfRole", "")),
        warehouse=kwargs.get("warehouse", params.pop("sfWarehouse", "")),
        database=params.pop("sfDatabase", None),
        schema=params.pop("sfSchema", None),
        dbtable=params.pop("dbtable", None),
        query=params.pop("query", None),
        password=kwargs.get("password"),
        url_params=params,
    )


def read_snowflake(spark: SparkSession, cfg: SnowflakeConfig) -> DataFrame:
    """Load via the Snowflake Spark connector (jar supplied at submit
    time: ``--packages net.snowflake:spark-snowflake_2.13:<ver>``)."""
    opts = snowflake_options(cfg)  # config errors surface as-is
    try:
        return spark.read.format(SNOWFLAKE_FORMAT).options(**opts).load()
    except Exception as e:  # pragma: no cover - jar-dependent
        if _is_missing_class(e):
            raise RuntimeError(
                "Snowflake load failed — is the spark-snowflake connector "
                "on the classpath? Add it via spark-submit --packages") from e
        raise
