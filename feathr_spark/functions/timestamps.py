"""Timestamp normalization.

The reference supports ``epoch`` / ``epoch_millis`` / SimpleDateFormat
timestamp declarations and builds a Spark SQL conversion expression
(offline/swa/SlidingWindowFeatureUtils.scala:214-246, default TZ
America/Los_Angeles). We standardize on **epoch microseconds (int64)**
internally (sub-second event data is common in training corpora) and
default to UTC.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MICROS = 1_000_000


def to_epoch_micros(col, fmt: str = "epoch", tz: str = "UTC") -> Column:
    """Return an int64 epoch-microseconds Column from ``col``.

    fmt: 'epoch' (seconds) | 'epoch_millis' | 'epoch_micros' |
         'timestamp' (native TimestampType) | a Spark datetime pattern
         (e.g. 'yyyy-MM-dd HH:mm:ss').
    """
    if isinstance(col, str):
        col = F.col(col)
    if fmt == "epoch":
        return (col.cast("double") * MICROS).cast("long")
    if fmt == "epoch_millis":
        return (col.cast("double") * 1000).cast("long")
    if fmt == "epoch_micros":
        return col.cast("long")
    if fmt == "timestamp":
        return F.unix_micros(col.cast(T.TimestampType()))
    # datetime pattern path; to_timestamp parses in session TZ (pinned UTC)
    ts = F.to_timestamp(col, fmt)
    if tz != "UTC":
        ts = F.to_utc_timestamp(ts, tz)
    return F.unix_micros(ts)
