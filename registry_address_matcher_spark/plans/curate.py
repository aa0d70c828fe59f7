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


def neardup_ledger(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    hash_mode: str = "xxhash",
) -> DataFrame:
    """Composed NEAR-dup curation: the full pre-tokenization dedup
    pipeline as one plan — MinHash signatures -> banded LSH pair
    generation -> Jaccard verify -> connected components -> one canonical
    survivor per duplicate cluster -> per-doc verdict ledger.

    Returns one row per input doc: ``(id, rep_id, verdict)`` with
    verdict ∈ {keep, near_duplicate}; downstream keeps ``verdict =
    'keep'`` and the rest is the drop ledger. Complements
    :func:`curate_documents` (exact/sha256 dedup) — run both for a full
    curation pass; this one catches boilerplate-shifted and
    lightly-edited copies exact hashing misses.

    Scale shape: every stage is the scale-shaped operator it reuses —
    the banded signature shuffle and capped LSH buckets from
    :mod:`..operators.dedup`, the star-round connected components from
    :mod:`..operators.cluster` — composed with no collect and no new
    shuffle beyond the stages' own. ``hash_mode='md5'`` makes the chain
    engine-portable (the DuckDB oracle in ``__spark_entry__`` reproduces
    it hash-for-hash); the default xxhash mode is the fast production
    path. CC is string-keyed (component = lexicographic min node id), so
    ids are cast once on the way in and the ledger's id column comes
    back as string — stable across engines and id dtypes.
    """
    from ..operators.cluster import connected_components
    from ..operators.dedup import minhash_lsh_pairs, minhash_signatures

    sigs = minhash_signatures(
        docs, id_col, text_col,
        shingle_n=shingle_n, num_perm=num_perm, hash_mode=hash_mode,
    )
    pairs = minhash_lsh_pairs(
        sigs, bands=bands, threshold=threshold,
        hash_buckets=hash_mode != "md5",
    )
    edges = pairs.select(
        F.col("id_l").cast("string").alias("src"),
        F.col("id_r").cast("string").alias("dst"),
    )
    comp = connected_components(edges)
    rep = comp.groupBy("component").agg(F.min("node").alias("rep_id"))
    member = comp.join(rep, "component").select(
        F.col("node").alias("__doc_key"), "rep_id"
    )
    return (
        docs.select(F.col(id_col).cast("string").alias("__doc_key"))
        .join(member, "__doc_key", "left")
        .select(
            F.col("__doc_key").alias(id_col),
            F.coalesce("rep_id", F.col("__doc_key")).alias("rep_id"),
            F.when(
                F.col("rep_id").isNotNull()
                & (F.col("rep_id") != F.col("__doc_key")),
                F.lit("near_duplicate"),
            )
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )
