"""Blocking: candidate-pair generation with explicit skew handling.

The reference's hash indexes (``advanced_matcher.py:30-55``) are blocking
in disguise: a candidate pair exists iff both rows share a block key. In
Spark the block is an equi-join; at 10^12-row scale the failure mode is a
**hot block** (the reference's ubiquitous empty ``BUILDING_NORM``; in the
repos domain a ubiquitous ``lang``): one key with k build rows and q probe
rows emits k*q pairs into a single shuffle partition.

Two mitigations, both explicit:

* **salting** (:func:`salted_join`) — the probe side gets a random-but-
  deterministic salt in [0, S); the build side is exploded S ways. Each hot
  key's pairs are spread over S reducers. Cost: build-side duplication for
  hot keys only (salting is applied selectively via a broadcast hot-key
  list).
* **pair caps** (:func:`cap_block`) — deterministic truncation of blocks
  beyond a quota, recorded in lineage so truncation is auditable, never
  silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ScaleConfig


def block_sizes(df: DataFrame, keys: list[str]) -> DataFrame:
    """Per-block row counts — feeds hot-key detection and lineage."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("block_rows"))


def hot_keys(df: DataFrame, keys: list[str], threshold: int) -> DataFrame:
    """Keys whose block exceeds ``threshold`` rows (candidates for salting)."""
    return block_sizes(df, keys).filter(F.col("block_rows") > threshold).select(*keys)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    scale: ScaleConfig | None = None,
    salt_col: str = "__salt",
    probe_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join on ``keys`` with hot keys salted ``scale.salt_buckets`` ways.

    Hot keys are detected on the build side with one cheap aggregate; the
    hot-key list is broadcast (it is small by construction — keys above
    threshold). Probe rows on hot keys get ``salt = pmod(hash(probe salt
    cols), S)``; build rows on hot keys are exploded across all S salts.
    Cold keys join with salt 0 on both sides — no duplication.

    ``probe_salt_cols`` names the column(s) the probe salt hashes —
    callers should pass their unique probe-id column explicitly. Within
    a hot block every probe row shares the KEY columns, so a salt hashed
    over all columns draws its entropy only from the non-key payload; a
    duplicate-heavy probe (many rows with identical payload — think
    repeated address text) would then collapse onto one salt bucket and
    re-create the very hot partition the salt exists to break. Hashing
    the id column makes the spread uniform regardless of payload
    duplication. Default (None) falls back to all probe columns, which
    is only safe when they include a unique id.
    """
    scale = scale or ScaleConfig()
    s = scale.salt_buckets
    hot = hot_keys(build, keys, scale.hot_block_threshold).withColumn("__is_hot", F.lit(True))

    probe_h = probe.join(F.broadcast(hot), keys, "left")
    salt_src = probe_salt_cols or probe.columns
    probe_salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(s))
    probe_h = probe_h.withColumn(
        salt_col, F.when(F.col("__is_hot").isNotNull(), probe_salt).otherwise(F.lit(0))
    ).drop("__is_hot")

    build_h = build.join(F.broadcast(hot), keys, "left")
    # explode cannot nest inside CASE WHEN — build the salt array first
    build_h = (
        build_h.withColumn(
            "__salts",
            F.when(
                F.col("__is_hot").isNotNull(), F.sequence(F.lit(0), F.lit(s - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn(salt_col, F.explode("__salts"))
        .drop("__salts", "__is_hot")
    )

    # shuffle_hash, not sort-merge: SMJ sorts BOTH exploded sides per
    # reducer, and the sort buffers divide the executor's execution-memory
    # pool by the number of CONCURRENT tasks — measured on the repos band
    # join (216k files, 7M band rows, 8 shuffle partitions), the join
    # stage burned 35.9 cpu-s at 2 concurrent tasks but 61.2 at 8 (+70%
    # width inflation, spill churn); the same stage hash-joined costs
    # 39.0 cpu-s at 8 tasks (+8%). The hash build is memory-safe by
    # construction here: hot keys are salted S ways and shuffle
    # partitioning scales with the cluster, so a build partition is
    # bounded (~block_rows/S per hot key) — and AQE's skew-join splitter
    # still applies to shuffled-hash joins. Falls back to SMJ if the
    # planner rejects the hint.
    return (
        probe_h.join(build_h.hint("shuffle_hash"), keys + [salt_col], "inner")
        .drop(salt_col)
    )


def cap_block(
    pairs: DataFrame,
    block_keys: list[str],
    probe_id: str,
    build_id: str,
    max_pairs: int,
    salt_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Deterministically truncate blocks that exceed ``max_pairs`` pairs.

    Skew-safe by construction: a single window over the block key would
    put the very mega-block this guard exists for into ONE task, so the
    quota is instead split over ``salt_buckets`` deterministic hash salts
    — the window partitions by (block, salt) and each salt keeps
    ``max_pairs // S`` pairs (+1 for the first ``max_pairs %% S`` salts).
    Kept count is therefore NEVER above ``max_pairs``; it can fall
    slightly short when some salt buckets run dry — kept is exactly
    ``sum(min(bucket_rows, quota))`` over the block's salts, so a block
    within the hash spread of the cap (even slightly BELOW it) may be
    trimmed. The shortfall is bounded by the binomial spread of a
    uniform hash: negligible at production quotas (1M pairs / 32 salts
    = 31250 per salt), material only when ``max_pairs`` is within a few
    multiples of ``salt_buckets`` — acceptable for a guard, not an
    exact-quota primitive (pinned by
    ``tests/test_blocking_cap.py::test_cap_block_quota_smaller_than_salt_buckets``). Ordering is by pair hash with the id pair as
    tie-break, so truncation is stable across runs and cluster sizes.
    Returns (kept_pairs, truncation_report); report rows
    (block key, total_pairs, kept_pairs, dropped_pairs) feed
    :func:`..plans.lineage.truncation_lineage` — truncation is never
    silent.
    """
    from pyspark.sql import Window

    s = max(1, min(salt_buckets, max_pairs))
    h = F.xxhash64(F.col(probe_id), F.col(build_id))
    ranked = pairs.withColumn("__cap_h", h).withColumn(
        "__cap_salt", F.pmod(F.col("__cap_h"), F.lit(s)).cast("int")
    )
    quota = F.lit(max_pairs // s) + (F.col("__cap_salt") < F.lit(max_pairs % s)).cast("int")
    w = Window.partitionBy(*block_keys, "__cap_salt").orderBy(
        F.col("__cap_h"), F.col(probe_id), F.col(build_id)
    )
    ranked = ranked.withColumn("__cap_keep", F.row_number().over(w) <= quota)
    kept = ranked.filter(F.col("__cap_keep")).drop("__cap_h", "__cap_salt", "__cap_keep")
    report = (
        ranked.groupBy(*block_keys)
        .agg(
            F.count(F.lit(1)).alias("total_pairs"),
            F.sum(F.col("__cap_keep").cast("long")).alias("kept_pairs"),
        )
        .filter(F.col("total_pairs") > F.col("kept_pairs"))
        .withColumn("dropped_pairs", F.col("total_pairs") - F.col("kept_pairs"))
    )
    return kept, report
