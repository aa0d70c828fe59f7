"""Per-block lineage rows (north rule): block key, candidate-pair count,
20-bucket score histogram — written to a sidecar table so every blocking
decision (including salting and truncation) is auditable.

Schema (FIXTURES.md F5):
``lineage(run_id, stage, block_key, candidate_pair_count long,
score_histogram array<long>, completed_at timestamp)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 20  # 5-point buckets over 0..100 (reference address.py:759-762)


def block_lineage(
    scored_pairs: DataFrame,
    block_cols: list[str],
    score_col: str,
    run_id: str,
    stage: str,
) -> DataFrame:
    """One row per block: pair count + score histogram.

    One shuffle (groupBy block); the histogram is built as 20 conditional
    sums — no second pass, no UDF.
    """
    bucket = F.least(
        F.floor(F.col(score_col) / 5).cast("int"), F.lit(N_BUCKETS - 1)
    )
    hist_cols = [
        F.sum((bucket == i).cast("long")).alias(f"__b{i}") for i in range(N_BUCKETS)
    ]
    agg = scored_pairs.groupBy(*block_cols).agg(
        F.count(F.lit(1)).alias("candidate_pair_count"), *hist_cols
    )
    return agg.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.concat_ws("\x1f", *[F.col(c) for c in block_cols]).alias("block_key"),
        "candidate_pair_count",
        F.array(*[F.col(f"__b{i}") for i in range(N_BUCKETS)]).alias("score_histogram"),
        F.current_timestamp().alias("completed_at"),
    )


def truncation_lineage(report: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Lineage rows for capped blocks (from blocking.cap_block) — dropped
    pairs are never silent."""
    block_cols = [c for c in report.columns if c not in ("total_pairs", "kept_pairs", "dropped_pairs")]
    return report.select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage + ":truncated").alias("stage"),
        F.concat_ws("\x1f", *[F.col(c) for c in block_cols]).alias("block_key"),
        F.col("dropped_pairs").cast("long").alias("candidate_pair_count"),
        F.array(*[F.lit(0).cast("long")] * N_BUCKETS).alias("score_histogram"),
        F.current_timestamp().alias("completed_at"),
    )
