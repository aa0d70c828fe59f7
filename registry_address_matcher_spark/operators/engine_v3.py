"""The reference's v3 engine variant (``src/matching/engine.py``) —
alternate blocking and scoring semantics, set-oriented.

Differences from the main matcher (advanced_matcher):

* **J6 multi-blocking** (engine.py:147-173, indexes :66-83): candidates
  are the UNION of four blocks — exact ``STREET_NORM``, exact
  ``HOUSE_NORM``, prefix ``HOUSE_NORM[:2]``, prefix ``STREET_NORM[:3]``.
* **weighted blend scoring** (engine.py:85-104, settings.py:23-26):
  0.4*ratio + 0.3*partial + 0.2*token_sort + 0.1*token_set over the
  SEARCH_KEYs.
* **per-probe top-k** (engine.py:204-206): up to ``max_results`` (100)
  candidates above threshold, best first.
* **J8 exact-first fallback** (engine.py:219-234): fuzzy runs only for
  probe rows where the exact search-key phase produced nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import MatchConfig, ScaleConfig
from ..functions.similarity import fuzzy_scores
from ..operators.blocking import salted_join


def multi_block_candidates(
    spr: DataFrame,
    cad: DataFrame,
    scale: ScaleConfig | None = None,
    truncation_reports: list | None = None,
) -> DataFrame:
    """J6: union of four equi-join blocks, deduped on the id pair.

    Each block is an equi-join on a derived key column; the union is
    deduplicated on (spr_id, cad_id). Prefix keys use ``F.substring`` —
    all JVM-side.

    Each block family is capped at ``scale.max_pairs_per_block`` pairs
    per key (default on — the 2-char house / 3-char street prefix blocks
    grow quadratically in block size; VERDICT r3 #4). Truncation is
    deterministic and skew-safe (blocking.cap_block) and reported via
    ``truncation_reports`` (pass a list to collect one report DataFrame
    per block family, keyed (block_family, __bk)) for the lineage
    sidecar."""
    scale = scale or ScaleConfig()

    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("ADDRESS_ID").alias(f"id_{side}"),
            F.col("SEARCH_KEY").alias(f"key_{side}"),
            F.col("STREET_NORM").alias(f"street_{side}"),
            F.col("HOUSE_NORM").alias(f"house_{side}"),
            F.col("BUILDING_NORM").alias(f"bld_{side}"),
        )

    s, c = keyed(spr, "s"), keyed(cad, "c")
    blocks = []
    for family, expr_s, expr_c, guard in [
        ("street", F.col("street_s"), F.col("street_c"), F.col("street_s") != ""),
        ("house", F.col("house_s"), F.col("house_c"), F.col("house_s") != ""),
        ("house2", F.substring("house_s", 1, 2), F.substring("house_c", 1, 2), F.col("house_s") != ""),
        ("street3", F.substring("street_s", 1, 3), F.substring("street_c", 1, 3), F.col("street_s") != ""),
    ]:
        # ids + block key ONLY ride the join/cap/dedup shuffles (guide
        # §2.3: project before the exchange) — the street/house/building
        # strings are never needed downstream (match_v3 re-attaches
        # SEARCH_KEY by id), and carrying them multiplied every pair-set
        # shuffle's bytes ~5x
        l = s.filter(guard).withColumn("__bk", expr_s).select("id_s", "__bk")
        r = c.withColumn("__bk", expr_c).filter(F.col("__bk") != "").select("id_c", "__bk")
        joined = salted_join(l, r, ["__bk"], scale, probe_salt_cols=["id_s"])
        if scale.max_pairs_per_block is not None:
            from .blocking import cap_block

            joined, report = cap_block(
                joined, ["__bk"], "id_s", "id_c",
                scale.max_pairs_per_block, scale.salt_buckets,
            )
            if truncation_reports is not None:
                truncation_reports.append(
                    report.select(F.lit(family).alias("block_family"), "*")
                )
        blocks.append(joined.drop("__bk"))
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionByName(b)
    return out.dropDuplicates(["id_s", "id_c"])


def blended_score(scores_col: str = "scores"):
    """engine.py:95-102 weighted blend over the four scorers."""
    s = F.col(scores_col)
    return (
        0.4 * s["ratio"]
        + 0.3 * s["partial_ratio"]
        + 0.2 * s["token_sort_ratio"]
        + 0.1 * s["token_set_ratio"]
    )


def match_v3(
    spr: DataFrame,
    cad: DataFrame,
    cfg: MatchConfig | None = None,
    scale: ScaleConfig | None = None,
    scorer: str = "blend4",
) -> DataFrame:
    """Full v3 flow: exact SEARCH_KEY phase, then weighted fuzzy over the
    multi-block union for probe rows the exact phase missed (J8).

    Returns [id_s, id_c, score, match_type, rank] with per-probe top-k.
    Scoring runs on SEARCH_KEY pairs (engine.py:181: the v3 engine fuzzes
    the composite key, not the bare street). scorer="jw" swaps the
    weighted blend for a single Jaro-Winkler kernel (0-100, round 4) so
    the whole flow is reproducible by the driver's DuckDB oracle; the
    blend stays pytest-oracled."""
    cfg = cfg or MatchConfig()
    exact = (
        spr.select(F.col("ADDRESS_ID").alias("id_s"), "SEARCH_KEY")
        .join(
            cad.select(F.col("ADDRESS_ID").alias("id_c"), "SEARCH_KEY"),
            "SEARCH_KEY",
        )
        .select(
            "id_s", "id_c",
            F.lit(100.0).alias("score"),
            F.lit("exact").alias("match_type"),
            F.lit(1).alias("rank"),
        )
    )
    remainder = spr.join(
        exact.select(F.col("id_s").alias("ADDRESS_ID")).distinct(), "ADDRESS_ID", "left_anti"
    )
    cand = multi_block_candidates(remainder, cad, scale)
    keys = (
        cand.join(
            remainder.select(F.col("ADDRESS_ID").alias("id_s"), F.col("SEARCH_KEY").alias("sk_s")),
            "id_s",
        )
        .join(cad.select(F.col("ADDRESS_ID").alias("id_c"), F.col("SEARCH_KEY").alias("sk_c")), "id_c")
    )
    if scorer == "jw":
        from ..functions.similarity import jaro_winkler_udf

        scored = keys.withColumn(
            "score", F.round(100.0 * jaro_winkler_udf(F.col("sk_s"), F.col("sk_c")), 4)
        )
    else:
        scored = keys.withColumn("scores", fuzzy_scores(F.col("sk_s"), F.col("sk_c")))
        scored = scored.withColumn("score", F.round(blended_score(), 6))
    scored = scored.filter(F.col("score") >= F.lit(cfg.fuzzy_threshold))
    w = Window.partitionBy("id_s").orderBy(F.col("score").desc(), F.col("id_c").asc())
    fuzzy = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.max_results_per_record)
        .select("id_s", "id_c", "score", F.lit("fuzzy").alias("match_type"), "rank")
    )
    return exact.unionByName(fuzzy)
