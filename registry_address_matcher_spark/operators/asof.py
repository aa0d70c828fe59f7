"""As-of (backward) join — an operator Spark's join zoo lacks.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same ``by`` group (DuckDB's native
``ASOF LEFT JOIN`` semantics, which the driver oracle checks against).

Physical strategy: the **union trick** — tag both sides, union, ONE
shuffle on (by) with a window ordered by (ts, side, tie) carrying the
right row forward as a SINGLE struct via ``last(ignorenulls)``, then keep
the left rows. Never a range-explosion join: a naive ``l.ts >= r.ts``
theta-join is O(|L| x |R|) per group and shows up as
BroadcastNestedLoop/Cartesian at scale; this plan is a single sort-based
window over |L| + |R| rows.

Two semantics points the struct carry nails down:

* **NULLs in right value columns survive.** The matched right row is
  attached wholesale: a NULL in its value column stays NULL in the
  output. (Carrying each column independently with its own
  ``last(ignorenulls)`` would silently substitute a stale non-null from
  an EARLIER right row and could assemble output columns from different
  right rows.)
* **Duplicate right timestamps break ties deterministically.** Among
  right rows sharing (by, ts), the row with the greatest
  ``tie_cols`` tuple wins (default: the value columns themselves — any
  total order works, it just has to be row-content-derived so the result
  is stable under repartitioning; ``monotonically_increasing_id`` would
  NOT be).

Skew: ``Window.partitionBy(by)`` sorts each group in ONE task — AQE does
not split window partitions. For fine-grained keys (users, devices,
symbols) that is the right plan. When one group holds billions of rows,
pass ``coarse_cell_micros`` (timestamps) / ``coarse_cell`` (numeric ts):
the **two-pass segmented carry** — rows are windowed per (group,
time-cell), per-cell "last right row" summaries (one row per non-empty
cell) are carried across cells with a second, tiny window, and the
carry-in is joined back. The big sort is then partitioned by
(group, cell), i.e. as many tasks per group as there are cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    value_cols: list[str],
    tie_cols: list[str],
) -> tuple[DataFrame, list[str]]:
    """Union with side tags; the right row rides as one struct ``__r``;
    ``__tie`` orders duplicate-(by, ts) right rows (greatest wins)."""
    left_cols = [c for c in left.columns if c not in by]
    r_struct_t = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    ) + ">"
    tie_t = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in tie_cols
    ) + ">"
    l2 = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.lit(None).cast(tie_t).alias("__tie"),
    )
    r2 = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
        F.struct(*[F.col(c) for c in tie_cols]).alias("__tie"),
    )
    return l2.unionByName(r2), left_cols


def _unpack(
    carried: DataFrame,
    by: list[str],
    ts_col: str,
    left_cols: list[str],
    value_cols: list[str],
    prefix: str,
    r_col: str,
) -> DataFrame:
    return carried.filter(F.col("__side") == 1).select(
        *by,
        F.col("__ts").alias(ts_col),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols if c != ts_col],
        *[F.col(r_col).getField(c).alias(f"{prefix}{c}") for c in value_cols],
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    value_cols: list[str],
    prefix: str = "r_",
    tie_cols: list[str] | None = None,
    coarse_cell_micros: int | None = None,
) -> DataFrame:
    """Left as-of join: left columns + ``prefix``-renamed right
    ``value_cols`` (all NULL when no right row precedes).

    ``tie_cols`` (default ``value_cols``) breaks duplicate-(by, ts) right
    rows: the greatest tuple wins, deterministically. Pass a unique right
    id column when value columns can collide.

    ``coarse_cell_micros`` switches to the segmented two-pass plan for
    coarse ``by`` keys (see module docstring); ``ts_col`` must be a
    timestamp (cells are ``floor(unix_micros(ts) / cell)``). Results are
    identical to the single-window plan.
    """
    tie_cols = tie_cols or value_cols
    u, left_cols = _tagged_union(left, right, by, ts_col, value_cols, tie_cols)

    # right rows order BEFORE left rows at equal ts (inclusive >=); among
    # right rows at equal ts the greatest __tie sorts last and wins last()
    order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]

    if coarse_cell_micros is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = u.withColumn("__rc", F.last("__r", ignorenulls=True).over(w))
        return _unpack(carried, by, ts_col, left_cols, value_cols, prefix, "__rc")

    # ---- segmented two-pass: window per (by, cell), carry across cells
    cell = F.floor(F.unix_micros(F.col("__ts")) / F.lit(coarse_cell_micros))
    u = u.withColumn("__cell", cell)
    w_in = (
        Window.partitionBy(*by, "__cell")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = u.withColumn("__r_in", F.last("__r", ignorenulls=True).over(w_in))

    # one summary row per (by, cell) PRESENT IN THE DATA (cells holding
    # only left rows must still receive a carry-in), with the cell's last
    # right struct where one exists (max_by over (ts, tie), right rows).
    # Both carry joins below are NULL-SAFE on (by, __cell): a NULL by key
    # is a real group (Window.partitionBy groups NULLs together in the
    # single-window plan) and a NULL ts floors to a NULL __cell — plain
    # equality would silently drop their carry-in and break the
    # "identical to the single-window plan" contract (ADVICE r3).
    def ns_cond(lhs: DataFrame, rhs: DataFrame) -> Column:
        cond = lhs["__cell"].eqNullSafe(rhs["__cell"])
        for c in by:
            cond = cond & lhs[c].eqNullSafe(rhs[c])
        return cond

    r_cells = (
        u.filter(F.col("__side") == 0)
        .groupBy(*by, "__cell")
        .agg(F.max_by("__r", F.struct("__ts", "__tie")).alias("__r_cell"))
    )
    dcells = u.select(*by, "__cell").distinct()
    cells = dcells.join(r_cells, ns_cond(dcells, r_cells), "left").select(
        *[dcells[c] for c in by], dcells["__cell"], r_cells["__r_cell"]
    )
    # carry-in for each cell = last summary of any STRICTLY EARLIER cell;
    # this window runs over cell summaries (one row per distinct cell),
    # orders of magnitude smaller than the data
    w_carry = (
        Window.partitionBy(*by)
        .orderBy(F.col("__cell").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = cells.withColumn(
        "__carry_in", F.last("__r_cell", ignorenulls=True).over(w_carry)
    ).select(*by, "__cell", "__carry_in")

    joined = seg.join(carry, ns_cond(seg, carry), "left").select(
        *[seg[c] for c in seg.columns], carry["__carry_in"]
    )
    carried = joined.withColumn("__rc", F.coalesce(F.col("__r_in"), F.col("__carry_in")))
    return _unpack(carried, by, ts_col, left_cols, value_cols, prefix, "__rc")
