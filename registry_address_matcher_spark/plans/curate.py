"""Training-data curation pass: one composed plan a pipeline user runs
before tokenization — exact dedup + quality floor + language gate, each
doc tagged with a single deterministic verdict.

All-native (JVM expressions only): the quality score and language ID
come from :mod:`..functions.text`, the duplicate representative is the
skew-safe ``groupBy+min`` + join-back used everywhere else in this repo
(no window over the hash — a viral duplicate at 100 TB would funnel one
hash's rows through a single task).

Verdict precedence is fixed so re-runs and engines agree:
``empty`` > ``duplicate`` > ``low_quality`` > ``unknown_lang`` >
``keep``. A duplicate of a low-quality doc is reported as ``duplicate``
— the dedup decision is content-identity, independent of the quality
knobs, so the audit table stays stable when thresholds move. NULL and
zero-length content are both ``empty`` (crawl shards contain both; a
NULL must not vanish from the ledger via a NULL join key), and empty
docs are never each other's "duplicates".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id_col, quality_score_col


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-document curation audit table.

    Returns one row per input doc: ``(id, lang_pred, quality, verdict)``
    with verdict ∈ {keep, duplicate, low_quality, unknown_lang}.
    Downstream keeps ``verdict = 'keep'``; the rest of the table is the
    drop ledger (what was removed and why — the lineage a 100 TB
    curation run must leave behind).

    Scale shape: one shuffle for the dedup groupBy (partial-agg
    map-side combine on the sha256 key), one equi-join back on the same
    key (AQE turns it into a broadcast when the duplicate-group table is
    small). Everything else is a projection.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    scored = docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        F.sha2(t, 256).alias("h"),
        lang_id_col(t).alias("lang_pred"),
        quality_score_col(t).alias("quality"),
    )
    reps = scored.groupBy("h").agg(F.min(id_col).alias("rep_id"))
    return (
        scored.join(reps, "h")
        .select(
            id_col,
            "lang_pred",
            "quality",
            F.when(F.col("n_chars") == 0, F.lit("empty"))
            .when(F.col(id_col) != F.col("rep_id"), F.lit("duplicate"))
            .when(F.col("quality") < F.lit(min_quality), F.lit("low_quality"))
            .when(F.col("lang_pred") == "und", F.lit("unknown_lang"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )
