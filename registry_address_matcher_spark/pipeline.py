"""End-to-end match pipeline: the reference's E2 lifecycle, set-oriented.

Reference orchestration (``/root/reference/main.py:366-418``): preprocess
both registries -> exact phase (J1 then J2) -> collect matched SPR ids ->
fuzzy phase on the remainder -> concat. Here each phase is a lazy
DataFrame; stage materialization (persist or checkpoint parquet) replaces
the reference's chunk loop and Streamlit session state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import EngineConfig, DEFAULT
from .operators.cluster import cluster_matches
from .operators.exact import (
    exact_full_matches,
    exact_key_matches,
    exclude_matched,
    unmatched,
)
from .operators.fuzzy import fuzzy_matches
from .operators.preprocess import preprocess_registry


@dataclass
class MatchResult:
    matches: DataFrame          # 16-column match table (union of all phases)
    unmatched_spr: DataFrame    # J7 anti-join
    clusters: DataFrame | None  # transitive components (None if skipped)
    #: every DataFrame run_match_pipeline persisted — a one-shot batch
    #: driver can ignore these (executor exit reclaims them), but a
    #: long-lived driver (streaming foreachBatch, a service looping over
    #: registries) must release them or block-manager memory grows with
    #: every pipeline run
    persisted: list[DataFrame] = field(default_factory=list)

    def release(self) -> None:
        """Unpersist every frame this run cached (idempotent)."""
        for df in self.persisted:
            df.unpersist()
        self.persisted = []


def run_match_pipeline(
    spr_raw: DataFrame,
    cad_raw: DataFrame,
    cfg: EngineConfig = DEFAULT,
    with_clusters: bool = True,
    persist: bool = True,
    cad_preprocessed: bool = False,
) -> MatchResult:
    """preprocess -> EXACT_FULL -> EXACT_KEY -> fuzzy(remainder) -> union.

    ``cad_preprocessed=True`` means ``cad_raw`` already went through
    :func:`preprocess_registry` AND the caller owns its caching — the
    pipeline will neither re-normalize nor persist/unpersist it. This is
    the repeated-probe-batch path (streaming incremental_match, services
    looping over probe feeds): normalize the static build side once,
    persist it once, reuse it across every call.
    """
    spr = preprocess_registry(spr_raw)
    cad = cad_raw if cad_preprocessed else preprocess_registry(cad_raw)
    handles: list[DataFrame] = []
    if persist:
        # both sides are scanned by multiple phases — materialize once,
        # the Spark analogue of the reference's @st.cache_data memoization
        spr = spr.persist()
        handles.append(spr)
        if not cad_preprocessed:
            cad = cad.persist()
            handles.append(cad)

    m1 = exact_full_matches(spr, cad, cfg.match)
    pairs1 = m1.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD")
    m2 = exact_key_matches(spr, cad, exclude_pairs=pairs1, cfg=cfg.match)
    exact = m1.unionByName(m2)
    if persist:
        exact = exact.persist()
        handles.append(exact)

    remainder = exclude_matched(spr, exact)
    m3 = fuzzy_matches(remainder, cad, cfg.match, cfg.scale)

    matches = exact.unionByName(m3)
    if persist:
        matches = matches.persist()
        handles.append(matches)

    result = MatchResult(
        matches=matches,
        unmatched_spr=unmatched(spr, matches),
        clusters=cluster_matches(matches, cfg.scale) if with_clusters else None,
        persisted=handles,
    )
    return result


def quality_buckets(matches: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """P9 (engine.py:106-115): score -> quality label."""
    m = cfg.match
    return matches.withColumn(
        "match_quality",
        F.when(F.col("MATCH_SCORE") >= m.quality_excellent, "Excellent")
        .when(F.col("MATCH_SCORE") >= m.quality_good, "Good")
        .when(F.col("MATCH_SCORE") >= m.quality_poor, "Poor")
        .otherwise("No Match"),
    )
