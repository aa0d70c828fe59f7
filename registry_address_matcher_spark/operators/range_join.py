"""Range (point-in-interval) join without a range explosion.

Spark executes an inequality join (``start <= ts AND ts < end``) as
BroadcastNestedLoop — per-group quadratic, a scale killer. The standard
fix: **bucket bisection** — quantize time into fixed cells, explode each
interval over the cells it covers (an interval of length L costs
ceil(L / cell) + 1 rows), put each point in its single cell, equi-join on
(group, cell), then apply the exact range predicate. Every surviving
pair is found exactly once (a point lives in ONE cell), so no dedup pass
is needed. Shuffle volume is O(|points| + |intervals| x cells-per-
interval) — tune ``cell_width`` toward the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    by: list[str],
    start_col: str,
    end_col: str,
    ts_col: str,
    cell_width: int,
) -> DataFrame:
    """Inner join: interval columns + matching point columns, for every
    point with ``start <= ts < end`` (half-open) in the same ``by`` group.
    Time columns are integers (e.g. unix micros); ``cell_width`` in the
    same unit."""
    w = F.lit(cell_width)
    ib = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                # end is exclusive: the last covered cell holds end - 1
                F.floor((F.col(end_col) - 1) / w),
            )
        ),
    )
    pb = points.withColumn("__cell", F.floor(F.col(ts_col) / w))
    joined = ib.join(pb, by + ["__cell"]).filter(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__cell")
