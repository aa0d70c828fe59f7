"""Quality/analytics aggregate suite — the reference's A1-A13 family
(``/root/reference/src/quality/analyzer.py:1-13``, ``main.py:456-786``,
``src/utils/export.py:34-40``) as single-pass Spark aggregations.

Everything lands in the long-format metrics schema (FIXTURES.md F5):
``(run_id, stage, key, value double, recorded_at timestamp)`` so the
whole suite appends to one sidecar table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def registry_quality(df: DataFrame) -> DataFrame:
    """A1-A5: one aggregate pass over a preprocessed registry."""
    return df.agg(
        F.count(F.lit(1)).cast("double").alias("total_records"),
        F.avg(F.col("STREET_NAME").isNotNull().cast("int")).alias("street_completeness"),
        F.avg(F.col("HOUSE").isNotNull().cast("int")).alias("house_completeness"),
        F.avg(F.col("BUILDING").isNotNull().cast("int")).alias("building_completeness"),
        F.countDistinct("STREET_NORM").cast("double").alias("unique_streets"),
        F.avg("COMPLETENESS_SCORE").alias("avg_completeness"),
        (F.count(F.lit(1)) - F.countDistinct("FULL_ADDRESS")).cast("double").alias("duplicates"),
    )


def match_quality(matches: DataFrame) -> DataFrame:
    """A6 + A11 + A12: score stats and threshold buckets, one pass."""
    s = F.col("MATCH_SCORE")
    return matches.agg(
        F.count(F.lit(1)).cast("double").alias("total_matches"),
        F.avg(s).alias("score_mean"),
        F.median(s).alias("score_median"),
        F.coalesce(F.stddev(s), F.lit(0.0)).alias("score_std"),
        F.min(s).alias("score_min"),
        F.max(s).alias("score_max"),
        F.sum((s >= 95).cast("int")).cast("double").alias("n_95_plus"),
        F.sum(((s >= 85) & (s < 95)).cast("int")).cast("double").alias("n_85_94"),
        F.sum(((s >= 75) & (s < 85)).cast("int")).cast("double").alias("n_75_84"),
        F.sum((s < 75).cast("int")).cast("double").alias("n_below_75"),
        F.avg("CANDIDATES_COUNT").alias("avg_candidates"),
    )


def match_type_counts(matches: DataFrame) -> DataFrame:
    """A7/A13: value_counts on MATCH_TYPE."""
    return matches.groupBy("MATCH_TYPE").agg(F.count(F.lit(1)).alias("n")).orderBy(
        F.desc("n"), F.asc("MATCH_TYPE")
    )


def score_histogram(matches: DataFrame, bucket_width: int = 5) -> DataFrame:
    """A9: score histogram in ``bucket_width``-point buckets."""
    return (
        matches.withColumn(
            "bucket", F.floor(F.col("MATCH_SCORE") / bucket_width).cast("long")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def hourly_counts(matches: DataFrame, ts_col: str = "MATCH_TIMESTAMP") -> DataFrame:
    """A10: group-by-hour counts."""
    return (
        matches.groupBy(F.hour(F.col(ts_col)).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hour")
    )


def completeness_correlation(matches: DataFrame) -> DataFrame:
    """A8: Pearson correlation of the two completeness columns.

    Spelled covar/(σσ) with try_divide: under ANSI mode ``corr`` raises
    DIVIDE_BY_ZERO when either column is constant; NULL is the right
    answer for undefined correlation."""
    a, b = F.col("COMPLETENESS_SPR"), F.col("COMPLETENESS_CAD")
    return matches.agg(
        F.try_divide(F.covar_samp(a, b), F.stddev(a) * F.stddev(b)).alias(
            "completeness_corr"
        )
    )


def to_metrics_rows(agg_df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Unpivot a one-row aggregate into the (run_id, stage, key, value)
    sidecar schema."""
    cols = agg_df.columns
    stacked = agg_df.select(
        F.expr(
            "stack({n}, {pairs}) as (key, value)".format(
                n=len(cols),
                pairs=", ".join(f"'{c}', cast(`{c}` as double)" for c in cols),
            )
        )
    )
    return stacked.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        "key",
        "value",
        F.current_timestamp().alias("recorded_at"),
    )


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile of numeric columns, ONE scan: long-format rows
    ``(column, n, nulls, n_distinct, min_v, max_v, p50)``.

    The ingestion-QA primitive for a training-data pipeline: run it on
    every landed shard and diff profiles across snapshots to catch
    schema rot and distribution drift before training does. All metrics
    are counts or ORDER STATISTICS — deliberately no mean/stddev, whose
    floating-point value depends on partition-level summation order and
    therefore cannot be replayed bit-identically by another engine (the
    DuckDB oracle matches this profile exactly; a drift-diff built on it
    never false-positives on reduction order). One wide aggregate then
    an unpivot: the scan reads only ``cols``.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__n_{c}"),
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"),
            F.countDistinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("double").alias(f"__min_{c}"),
            F.max(col).cast("double").alias(f"__max_{c}"),
            F.percentile(col, F.lit(0.5)).alias(f"__p50_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __n_{c}, __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}, __p50_{c}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column, n, nulls, n_distinct, min_v, max_v, p50)"
    )
