"""Custom stateful streaming operator: per-user threshold-crossing
alerts — the ``applyInPandasWithState`` surface (SURVEY §2.8's "new
capability" tier; nothing in the reference is stateful).

Semantics: per user, accumulate ``value`` in event-time order; emit one
alert row each time the running total crosses another multiple of
``threshold`` (level = floor(cum / threshold)). A windowed aggregate
can't express "emit on crossing"; it needs per-key running state.

Two implementations with IDENTICAL output:

* :func:`threshold_alerts_batch` — native window cumsum (no Python), the
  oracle-checkable twin. The previous level is read with ``lag`` over
  the same ordering — NOT recomputed as ``cum - value``, which differs
  in floating point and can flip a floor() at a boundary.
* :func:`threshold_alerts_stream` — streaming via
  ``applyInPandasWithState``: GroupState holds the running total across
  micro-batches; rows are sorted by (ts, event_id) inside each batch.
  Cross-batch correctness requires batches to arrive in event-time
  order (the file-source test feeds time-split files with
  maxFilesPerTrigger=1); out-of-order arrival needs the upstream
  watermark + sort that sessionization uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("alert_level", T.LongType()),
        T.StructField("cum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("cum", T.DoubleType())])


def threshold_alerts_batch(events: DataFrame, threshold: float = 500.0) -> DataFrame:
    """Batch twin: window cumsum, level change -> alert row."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = F.sum("value").over(w)
    level = F.floor(cum / F.lit(threshold))
    prev_level = F.floor(F.coalesce(F.lag(cum).over(w), F.lit(0.0)) / F.lit(threshold))
    out = events.select(
        "user_id", "event_id",
        level.alias("alert_level"),
        F.round(cum, 4).alias("cum_value"),
        (level > prev_level).alias("__alert"),
    )
    return out.filter("__alert").drop("__alert")


def threshold_alerts_stream(events: DataFrame, threshold: float = 500.0) -> DataFrame:
    """Streaming twin: GroupState carries the per-user running total."""

    def emit(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cum = state.get[0] if state.exists else 0.0
        rows = {"user_id": [], "event_id": [], "alert_level": [], "cum_value": []}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                prev_level = int(cum // threshold)
                cum += float(val)
                level = int(cum // threshold)
                if level > prev_level:
                    rows["user_id"].append(user_id)
                    rows["event_id"].append(int(eid))
                    rows["alert_level"].append(level)
                    rows["cum_value"].append(round(cum, 4))
        state.update((cum,))
        if rows["user_id"]:
            yield pd.DataFrame(rows)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        emit, ALERT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
