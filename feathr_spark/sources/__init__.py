"""Source/sink layer: batch loaders, time-partitioned scans, sinks."""

from feathr_spark.sources.batch import load_source, read_batch  # noqa: F401
from feathr_spark.sources.sinks import write_partitioned, write_sink  # noqa: F401
from feathr_spark.sources.time_partitioned import read_time_partitioned  # noqa: F401
from feathr_spark.sources.external import (  # noqa: F401
    JdbcConfig,
    SnowflakeConfig,
    jdbc_options,
    read_jdbc,
    read_snowflake,
    snowflake_config_from_url,
    snowflake_options,
)
from feathr_spark.sources.online import redis_write_spec, write_online  # noqa: F401
from feathr_spark.sources.iceberg import (  # noqa: F401
    corpus_table_ddl,
    iceberg_catalog_conf,
    incremental_read_options,
    read_iceberg,
    snapshot_read_options,
)
