"""As-of (backward) join — an operator Spark's join zoo lacks.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same ``by`` group (DuckDB's native
``ASOF LEFT JOIN`` semantics, which the driver oracle checks against).

Physical strategy: the **union trick** — tag both sides, union, ONE
shuffle on (by) with a window ordered by (ts, side, right-ts) carrying
the right side's values forward via ``last(ignorenulls)``, then keep the
left rows. Never a range-explosion join: a naive
``l.ts >= r.ts`` theta-join is O(|L| x |R|) per group and shows up as
BroadcastNestedLoop/Cartesian at scale; this plan is a single sort-based
window over |L| + |R| rows, partitioned by the group key — the same
shape at 100 TB, with AQE handling group skew.

Right-side timestamps tie-break by themselves (latest right row wins at
equal right-ts); at equal left/right ts the right row IS visible
(inclusive, side-ordering right-before-left), matching ASOF ``>=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    value_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: left columns + ``prefix``-renamed right
    ``value_cols`` (NULL when no right row precedes)."""
    left_cols = [c for c in left.columns if c not in by]
    l2 = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r2 = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    u = l2.unionByName(r2)
    # right rows order BEFORE left rows at equal ts (inclusive >=); among
    # right rows at the same ts the later-sorted one wins last()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *by, "__ts", "__side",
        *[F.col(f"__l_{c}") for c in left_cols],
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}") for c in value_cols],
    )
    return carried.filter(F.col("__side") == 1).select(
        *by,
        F.col("__ts").alias(ts_col),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols if c != ts_col],
        *[F.col(f"{prefix}{c}") for c in value_cols],
    )
