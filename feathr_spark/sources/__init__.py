"""Source/sink layer: batch loaders, time-partitioned scans, sinks."""

from feathr_spark.sources.batch import load_source, read_batch  # noqa: F401
from feathr_spark.sources.sinks import write_partitioned, write_sink  # noqa: F401
from feathr_spark.sources.time_partitioned import read_time_partitioned  # noqa: F401
