"""Hypertable-style rollup hierarchy: minute -> hour -> day continuous
aggregates where every coarser level RE-AGGREGATES the next finer one —
the raw table is scanned exactly once, however many resolutions exist.

The re-aggregation contract: carry decomposable state, not results —
(count, sum) here; a mean or a rate is derived at read time. The driver
oracle computes the coarsest level DIRECTLY from raw rows and must match
the chained rollup, which is precisely the correctness property a
continuous-aggregate pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_levels(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    windows: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
) -> list[DataFrame]:
    """One DataFrame per resolution, finest first. Level 0 aggregates the
    raw rows; level i > 0 aggregates level i-1 (never raw). Columns:
    (bucket_start timestamp, *keys, n, value_sum)."""
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    cur = (
        ev.groupBy(F.window(ts_col, windows[0]).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("value_sum"))
        .select(F.col("w.start").alias("bucket_start"), *keys, "n", "value_sum")
    )
    levels = [cur]
    for win in windows[1:]:
        cur = (
            cur.groupBy(F.window("bucket_start", win).alias("w"), *keys)
            .agg(F.sum("n").alias("n"), F.sum("value_sum").alias("value_sum"))
            .select(F.col("w.start").alias("bucket_start"), *keys, "n", "value_sum")
        )
        levels.append(cur)
    return levels
