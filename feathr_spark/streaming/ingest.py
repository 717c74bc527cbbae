"""Streaming feature ingestion.

Reference: StreamingFeatureGenerator.scala:44-129 — Kafka ``readStream``
-> Avro-decode UDF -> key extraction -> SQL anchor transforms ->
``foreachBatch`` sink, OutputMode.Update. The reference's streaming path
does row-level transforms ONLY (no streaming aggregation, no
watermarks); this module keeps that parity surface
(:func:`stream_features` + :func:`stream_to_sink`) and adds the
Spark-native stateful layer the reference lacks:

- :func:`stream_window_agg` — watermarked event-time sliding windows
  (``F.window`` groupBy) with late-data tolerance
- :func:`stream_session_agg` — gap-based ``F.session_window``
  aggregation, the streaming twin of operators.windows.sessionize
- ``dropDuplicatesWithinWatermark`` for at-least-once source dedup is a
  one-liner the caller applies directly

Any batch source/sink works through ``foreachBatch``, so the engine's
batch operators (SWA join, as-of) can run per micro-batch against the
latest feature state where full streaming semantics are not needed.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feathr_spark.definitions import Feature


def stream_features(
    stream_df: DataFrame,
    keys: Sequence[str],
    features: Sequence[Feature],
    key_names: Optional[Sequence[str]] = None,
    where: Optional[str] = None,
) -> DataFrame:
    """Row-level streaming anchor transform: key columns + one SQL
    expression per feature (the streaming analogue of the SQL anchor
    extractor, SQLConfigurableAnchorExtractor.scala:42-64)."""
    key_names = list(key_names or [f"key{i}" for i in range(len(keys))])
    out = stream_df
    if where:
        out = out.where(F.expr(where))
    cols = [F.expr(k).alias(n) for k, n in zip(keys, key_names)]
    cols += [F.expr(f.expr).alias(f.name) for f in features]
    return out.select(*cols)


def stream_window_agg(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window: str,
    agg_exprs: dict[str, str],
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding/tumbling event-time aggregation.

    ``window``/``slide`` are duration strings ("1 hour", "5 minutes");
    ``agg_exprs`` maps output name -> SQL aggregate over the batch
    columns. Late rows beyond ``watermark`` are dropped (state is
    bounded — mandatory at corpus scale).
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    out = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*[F.col(k) for k in keys], win.alias("win"))
        .agg(*[F.expr(e).alias(n) for n, e in agg_exprs.items()])
    )
    return out.select(
        *keys,
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *agg_exprs.keys(),
    )


def stream_session_agg(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str,
    agg_exprs: dict[str, str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session aggregation (``F.session_window``): a session
    closes once no event arrives within ``gap``; the watermark finalizes
    sessions and bounds state."""
    out = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*[F.col(k) for k in keys], F.session_window(F.col(ts_col), gap).alias("sess"))
        .agg(*[F.expr(e).alias(n) for n, e in agg_exprs.items()])
    )
    return out.select(
        *keys,
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        *agg_exprs.keys(),
    )


def stream_to_sink(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "update",
    trigger_available_now: bool = True,
    query_name: str = "feathr_stream",
):
    """``foreachBatch`` sink (the reference's universal sink shape:
    StreamingFeatureGenerator.scala:95-125). ``trigger_available_now``
    processes the backlog then stops — batch-incremental mode; pass
    False for a continuously running micro-batch query."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .foreachBatch(batch_fn)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
