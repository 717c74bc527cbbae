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


def stream_dedup(
    stream_df: DataFrame,
    ts_col: str,
    content_cols: Sequence[str],
    watermark: str = "1 hour",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup: drop rows whose content fingerprint was
    already seen within the watermark horizon — the streaming analogue
    of ``operators.dedup.exact_dedup``.

    The fingerprint is ``xxhash64`` over the listed content columns
    (text columns normalized first when ``normalize=True``, matching
    the batch op).  Built on ``dropDuplicatesWithinWatermark`` so the
    dedup state is BOUNDED: fingerprints older than ``watermark`` are
    evicted, the only scale-safe contract on an unbounded stream (an
    unwindowed ``dropDuplicates`` grows state forever).  Within-batch
    and cross-batch duplicates inside the horizon are both dropped;
    a duplicate arriving after the horizon passes through — pair with
    a periodic batch :func:`~feathr_spark.operators.dedup.exact_dedup`
    compaction for exactness beyond it."""
    from feathr_spark.operators.text import normalize_text

    parts = [
        normalize_text(c) if normalize else F.col(c).cast("string")
        for c in content_cols
    ]
    fp = stream_df.withColumn("__fp", F.xxhash64(*parts)).withWatermark(ts_col, watermark)
    return fp.dropDuplicatesWithinWatermark(["__fp"]).drop("__fp")


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


def stream_running_features(
    stream_df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-entity
    running feature state — (n_events, value_sum, latest_ts, latest_value)
    — updated every micro-batch and emitted for keys seen in the batch.

    This is the online-store feature-state shape the reference pushes to
    Redis per batch (PushToRedisOutputProcessor); here the state lives in
    the streaming state store (checkpointed, exactly-once across
    restarts) and the emitted rows go to any sink. State per key is four
    scalars — bounded regardless of stream length.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField("entity", StringType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("latest_ts", DoubleType()),
        StructField("latest_value", DoubleType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("lts", DoubleType()),
        StructField("lval", DoubleType()),
    ])

    def update(key_tuple, pdf_iter, state: GroupState):
        n, s, lts, lval = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdf_iter:
            vals = pd.to_numeric(pdf[value_col], errors="coerce")
            ts = pd.to_numeric(pdf[ts_col], errors="coerce")
            ok = vals.notna() & ts.notna()
            if ok.any():
                n += int(ok.sum())
                s += float(vals[ok].sum())
                # deterministic latest: ties on ts broken by max value, so
                # the result is independent of batch split / row order
                tmax = float(ts[ok].max())
                vmax = float(vals[ok][ts[ok] == tmax].max())
                if lts is None or (tmax, vmax) > (lts, lval):
                    lts, lval = tmax, vmax
        state.update((n, s, lts, lval))
        yield pd.DataFrame([{
            "entity": str(key_tuple[0]), "n_events": n, "value_sum": s,
            "latest_ts": lts, "latest_value": lval,
        }])

    proj = stream_df.select(
        F.expr(key).cast("string").alias("__entity"),
        F.col(ts_col), F.col(value_col),
    )
    return proj.groupBy("__entity").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
