"""Structured Streaming feature ingestion + stateful windowed operators."""

from feathr_spark.streaming.dedup import (  # noqa: F401
    load_ingested,
    stream_dedup_ingest,
)
from feathr_spark.streaming.enrich import stream_asof_enrich  # noqa: F401
from feathr_spark.streaming.ingest import (  # noqa: F401
    stream_dedup,
    stream_features,
    stream_session_agg,
    stream_to_sink,
    stream_window_agg,
)
