"""Exact matching phases (reference J1/J2/J3/J7) as declarative joins.

The reference probes in-memory dicts row by row
(``/root/reference/src/matching/advanced_matcher.py:57-179``); here each
phase is an equi-join Catalyst can execute as broadcast / shuffled-hash /
sort-merge as sizes dictate, with AQE handling runtime skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import MatchConfig

#: 16-column match-record schema (advanced_matcher.py:432-451)
MATCH_COLUMNS = [
    "ADDRESS_ID_SPR", "STREET_NAME_SPR", "HOUSE_SPR", "BUILDING_SPR", "FULL_ADDRESS_SPR",
    "ADDRESS_ID_CAD", "STREET_NAME_CAD", "HOUSE_CAD", "BUILDING_CAD", "FULL_ADDRESS_CAD",
    "MATCH_SCORE", "MATCH_TYPE", "CANDIDATES_COUNT",
    "COMPLETENESS_SPR", "COMPLETENESS_CAD", "MATCH_TIMESTAMP",
]

_SIDE_COLS = ["ADDRESS_ID", "STREET_NAME", "HOUSE", "BUILDING", "FULL_ADDRESS", "COMPLETENESS_SCORE"]


def tag_side(df: DataFrame, side: str) -> DataFrame:
    """Suffix every column with _SPR/_CAD so the pair join is unambiguous."""
    return df.select(*[F.col(c).alias(f"{c}_{side}") for c in df.columns])


def as_match_records(
    pairs: DataFrame,
    score,
    match_type,
    candidates_count,
) -> DataFrame:
    """Project a joined pair table into the 16-column match schema.

    MATCH_TIMESTAMP uses ``current_timestamp()`` (constant per query) —
    an intentional improvement over the reference's per-row
    ``datetime.now()`` (advanced_matcher.py:450): at cluster scale a
    per-row wall clock is non-deterministic noise.
    """
    def as_col(x):
        return x if isinstance(x, Column) else F.lit(x)

    src_of = {
        "COMPLETENESS_SPR": "COMPLETENESS_SCORE_SPR",
        "COMPLETENESS_CAD": "COMPLETENESS_SCORE_CAD",
    }
    cols = []
    for name in MATCH_COLUMNS:
        if name == "MATCH_SCORE":
            cols.append(as_col(score).cast("double").alias(name))
        elif name == "MATCH_TYPE":
            cols.append(as_col(match_type).alias(name))
        elif name == "CANDIDATES_COUNT":
            cols.append(as_col(candidates_count).cast("int").alias(name))
        elif name == "MATCH_TIMESTAMP":
            cols.append(F.current_timestamp().alias(name))
        else:
            cols.append(F.col(src_of.get(name, name)).alias(name))
    return pairs.select(*cols)


def dedupe_last_wins(cad: DataFrame, key: str = "FULL_ADDRESS", order: str = "ADDRESS_ID") -> DataFrame:
    """Reproduce the reference's last-wins build dict
    (``cad_full_lookup = {row[FULL_ADDRESS]: idx ...}``,
    advanced_matcher.py:83): at most one CAD row per FULL_ADDRESS.

    "Last row wins" is row-order-dependent, which has no meaning under a
    shuffle — the deterministic stand-in is max ADDRESS_ID (documented
    deviation; stable across partitionings and runs).
    """
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    return cad.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def exact_full_matches(spr: DataFrame, cad: DataFrame, cfg: MatchConfig | None = None) -> DataFrame:
    """J1 — EXACT_FULL: inner equi-join on FULL_ADDRESS against the
    last-wins-deduped CAD side; score 100 (advanced_matcher.py:81-101)."""
    cfg = cfg or MatchConfig()
    cad1 = tag_side(dedupe_last_wins(cad).select(*_SIDE_COLS), "CAD")
    sprt = tag_side(spr.select(*_SIDE_COLS), "SPR")
    pairs = sprt.join(
        cad1, sprt.FULL_ADDRESS_SPR == cad1.FULL_ADDRESS_CAD, "inner"
    )
    return as_match_records(pairs, cfg.exact_score, "EXACT_FULL", 1)


def exact_key_matches(
    spr: DataFrame,
    cad: DataFrame,
    exclude_pairs: DataFrame | None = None,
    cfg: MatchConfig | None = None,
) -> DataFrame:
    """J2 — EXACT_KEY: equi-join on (SEARCH_KEY, BUILDING_NORM), ALL CAD
    matches per SPR row, minus pairs already produced by phase 1
    (advanced_matcher.py:129-151).

    ``exclude_pairs``: DataFrame[ADDRESS_ID_SPR, ADDRESS_ID_CAD].
    """
    cfg = cfg or MatchConfig()
    cad_cols = _SIDE_COLS + ["SEARCH_KEY", "BUILDING_NORM"]
    cadt = tag_side(cad.select(*cad_cols), "CAD")
    sprt = tag_side(spr.select(*cad_cols), "SPR")
    pairs = sprt.join(
        cadt,
        (sprt.SEARCH_KEY_SPR == cadt.SEARCH_KEY_CAD)
        & (sprt.BUILDING_NORM_SPR == cadt.BUILDING_NORM_CAD),
        "inner",
    )
    if exclude_pairs is not None:
        # shuffle_hash, not sort-merge: the anti probe only needs a hash
        # set of the exclude pairs per partition — SMJ would sort BOTH
        # sides for an existence check (guide §3.1); build side is the
        # phase-1 match set, bounded per partition by the shuffle width
        pairs = pairs.join(
            exclude_pairs.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD").hint("shuffle_hash"),
            ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"],
            "left_anti",
        )
    return as_match_records(pairs, cfg.exact_score, "EXACT_KEY", 1)


def exclude_matched(spr: DataFrame, matches: DataFrame) -> DataFrame:
    """J3 — drop SPR rows that already matched (advanced_matcher.py:183-187).
    shuffle_hash-hinted anti: no sort for an existence probe (guide §3.1)."""
    ids = matches.select(F.col("ADDRESS_ID_SPR").alias("ADDRESS_ID")).distinct()
    return spr.join(ids.hint("shuffle_hash"), "ADDRESS_ID", "left_anti")


def unmatched(spr: DataFrame, matches: DataFrame) -> DataFrame:
    """J7 — unmatched SPR rows for reports/export (main.py:791-792)."""
    return exclude_matched(spr, matches)
