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
    # malformed intervals (end <= start) must explode to NOTHING: Spark's
    # sequence(hi, lo) with hi > lo generates a DESCENDING sequence, not
    # an empty one — an inverted interval would fan out huge spurious cell
    # arrays (or trip the sequence-length limit) that only the final exact
    # predicate cleans up. The predicate is unsatisfiable for them anyway,
    # so dropping the rows here is semantics-preserving.
    cells = F.when(
        F.col(end_col) > F.col(start_col),
        F.sequence(
            F.floor(F.col(start_col) / w),
            # end is exclusive: the last covered cell holds end - 1
            F.floor((F.col(end_col) - 1) / w),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ib = intervals.withColumn("__cell", F.explode(cells))
    pb = points.withColumn("__cell", F.floor(F.col(ts_col) / w))
    joined = ib.join(pb, by + ["__cell"]).filter(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__cell")
