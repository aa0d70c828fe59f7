"""Chart-shaped data series (reference ``src/visualization/charts.py``).

The reference renders plotly figures from pandas frames; the engine's job
is the DATA SERIES behind each panel — rendering stays client-side. Each
builder returns a small aggregated DataFrame, never raw rows: at 100 TB a
dashboard pulls bounded aggregates, not a scatter dump of the match table.

Panels re-expressed (charts.py:6-49 match-quality dashboard,
charts.py:53-93 data-quality radar):

* score histogram       -> :func:`score_hist_series` (fixed-width bins)
* match-type pie        -> ``plans.quality.match_type_counts`` (exists)
* completeness scatter  -> :func:`completeness_scatter_series` (grid-
  rounded density: the raw per-pair scatter is unbounded; a 0.01-grid
  count is the scalable equivalent a renderer heat-maps)
* hourly matches        -> ``hour(MATCH_TIMESTAMP)`` counts (exists as
  events_hourly's shape; MATCH_TIMESTAMP is query-constant by design)
* quality radar         -> :func:`quality_radar_series` (long-form
  (registry, metric, value) — the radar's axes)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RADAR_METRICS = [
    "street_completeness",
    "house_completeness",
    "building_completeness",
    "avg_completeness",
]


def score_hist_series(matches: DataFrame, bin_width: float = 5.0) -> DataFrame:
    """Fixed-width score histogram: (bin_lo, bin_hi, n). Deterministic
    bins (unlike plotly's data-range nbinsx) so two runs are comparable."""
    lo = (F.floor(F.col("MATCH_SCORE") / bin_width) * bin_width).cast("double")
    return (
        matches.groupBy(lo.alias("bin_lo"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_hi", (F.col("bin_lo") + bin_width).cast("double"))
        .select("bin_lo", "bin_hi", "n")
    )


def completeness_scatter_series(matches: DataFrame, grid: int = 2) -> DataFrame:
    """Completeness-correlation panel as a density grid:
    (c_spr, c_cad, n) with coordinates rounded to ``grid`` decimals."""
    return (
        matches.groupBy(
            F.round("COMPLETENESS_SPR", grid).alias("c_spr"),
            F.round("COMPLETENESS_CAD", grid).alias("c_cad"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quality_radar_series(spr: DataFrame, cad: DataFrame) -> DataFrame:
    """Radar axes, long form: (registry, metric, value) with value in
    [0, 100] percent — charts.py:56-62's metric list verbatim.

    Inputs must be PREPROCESSED registries (preprocess_registry output:
    the metrics read STREET_NORM / COMPLETENESS_SCORE / FULL_ADDRESS)."""
    from .quality import registry_quality

    def side(df: DataFrame, name: str) -> DataFrame:
        q = registry_quality(df)
        stack = ", ".join(f"'{m}', {m}" for m in RADAR_METRICS)
        return q.select(
            F.lit(name).alias("registry"),
            F.expr(f"stack({len(RADAR_METRICS)}, {stack}) AS (metric, value)"),
        ).select("registry", "metric", F.round(F.col("value") * 100.0, 6).alias("pct"))

    return side(spr, "SPR").unionByName(side(cad, "CAD"))
