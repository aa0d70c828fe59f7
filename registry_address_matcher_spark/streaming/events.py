"""Structured Streaming over the events table shape.

The reference is batch-only (SURVEY §2.8) — its chunk loop exists only
for progress UI. The streaming capability the Spark engine adds:

* :func:`windowed_event_counts` — tumbling-window counts per event_type
  with a watermark for late data;
* :func:`stream_dedup` — exactly-once-per-key within the watermark via
  ``dropDuplicatesWithinWatermark``;
* :func:`streaming_match_counts` — incremental EXACT_FULL matching of a
  registry stream against a static (broadcast) CAD side: stream-static
  joins need no state store for the static side.

All take a streaming DataFrame (``spark.readStream``); tests drive them
with the file source + ``Trigger.AvailableNow`` and a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.preprocess import preprocess_registry


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type."""
    # watermarks require TimestampType; parquet may surface TIMESTAMP_NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sessionized_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows via native ``session_window`` (gap-merge:
    an event extends the session while ``ts < last_ts + gap``, half-open
    end = ``last_ts + gap``). Same plan works batch AND streaming — pass
    ``watermark`` on the streaming path (session state must expire).

    Output: (user_id, session_start/end as unix micros — BIGINT sidesteps
    cross-engine timestamp-string formatting — n, value_sum round 4).
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            F.unix_micros(F.col("w.end")).alias("session_end"),
            "n",
            "value_sum",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_match_counts(spr_stream: DataFrame, cad_static: DataFrame) -> DataFrame:
    """Stream-static EXACT_FULL: each micro-batch of SPR rows equi-joins
    the static CAD side on FULL_ADDRESS; emits per-batch match rows.

    The static side is planned once (broadcast when small) — the
    streaming analogue of the reference's build-side dict.
    """
    spr = preprocess_registry(spr_stream)
    cad = preprocess_registry(cad_static).select(
        F.col("ADDRESS_ID").alias("ADDRESS_ID_CAD"), "FULL_ADDRESS"
    )
    return spr.join(cad, "FULL_ADDRESS", "inner").select(
        F.col("ADDRESS_ID").alias("ADDRESS_ID_SPR"), "ADDRESS_ID_CAD", "FULL_ADDRESS"
    )
