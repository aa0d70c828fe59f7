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


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    partitions: int | None = None,
    release_handle: list | None = None,
) -> DataFrame:
    """Global 1-based rank over a total order, scalably.

    The naive ``row_number() OVER (ORDER BY ...)`` plans an Exchange
    SinglePartition — every row through ONE task, the same landmine the
    CC/star rewrite removed from clustering. Instead:

    1. ``repartitionByRange`` on the order columns — partitions become
       non-overlapping key ranges, so a LOCAL rank plus the number of
       rows in all earlier ranges IS the global rank.
    2. local ``row_number`` windowed by ``spark_partition_id()`` — each
       window partition is one bounded Spark partition (one extra
       uniform-key exchange, never a single task).
    3. per-partition counts (``partitions`` rows — cluster-sized, not
       data-sized) become broadcast cumulative offsets.

    ``order_cols`` must define a TOTAL order (include a unique id as the
    final tie-break) — otherwise ranks of ties depend on partition
    boundaries. The rank values themselves are boundary-invariant: the
    sampled range splits move WHERE rows sit, not their position in the
    total order.

    The range-shuffled input is persisted (it feeds two jobs: the
    offsets count and the ranked output). A caller that loops (a
    ranking service) should pass ``release_handle=[]`` and
    ``unpersist()`` the appended frame once the ranked output is
    consumed, the same contract as ``MatchResult.persisted``; otherwise
    the cache lives until session end / LRU eviction.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    spark = df.sparkSession
    p = partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    parted = (
        df.repartitionByRange(p, *cols)
        .withColumn("__gr_pid", F.spark_partition_id())
        # cache at the barrier: the range shuffle feeds two jobs (the
        # offsets count below and the ranked output) — without it the
        # second job re-runs the range sampling + shuffle from scratch.
        # persist (not localCheckpoint) so release_handle.unpersist()
        # actually frees the blocks; partition ids are stable under
        # eviction+recompute because the shuffle dependency pins the
        # range boundaries.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if release_handle is not None:
        release_handle.append(parted)
    w = Window.partitionBy("__gr_pid").orderBy(*cols)
    local = parted.withColumn("__gr_lrank", F.row_number().over(w))
    counts = sorted(
        (r["__gr_pid"], r["n"])
        for r in parted.groupBy("__gr_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # NOTE (round-6): an internal `parted.unpersist()` here when the
    # caller passes no release handle was tried for the round-5 leak
    # advice and REVERTED — under AQE the ranked output's later actions
    # replan and re-execute the range shuffle instead of re-reading the
    # first execution's exchange, so the re-sampled boundaries (and
    # spark_partition_id assignments) can drift from the ones the
    # offsets were computed against, corrupting global ranks (caught by
    # the snm_pairs oracle at sf0.01). The cache is load-bearing for
    # correctness, not just speed; callers that loop must pass
    # ``release_handle`` and unpersist once the output is consumed.
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off = spark.createDataFrame(offsets, schema="__gr_pid int, __gr_off long")
    return (
        local.join(F.broadcast(off), "__gr_pid")
        .withColumn(rank_col, F.col("__gr_off") + F.col("__gr_lrank"))
        .drop("__gr_pid", "__gr_lrank", "__gr_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    window: int,
    release_handle: list | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): order the
    records by a sorting key, slide a window of ``window`` rows, and emit
    every pair of records that co-occur in some window — i.e. all pairs
    within rank distance 1..window-1. Complements key-equality blocking
    (``salted_join``): SNM catches near-misses that share a PREFIX of the
    key but not its exact value, and its candidate count is strictly
    O(n * window) regardless of key-frequency skew — there is no hot
    block by construction.

    Scale shape: a :func:`global_rank` (range shuffle + uniform local
    windows), then pairs via ONE bucket equi-join — records at rank r
    fall in bucket ``(r-1) div window``; any pair closer than ``window``
    sits in the same or adjacent buckets, so the left side explodes to
    ``[b, b+1]`` (2x duplication, uniform) and joins on bucket equality.
    Buckets have EXACTLY ``window`` rows each, so the join is
    perfectly balanced: no salting needed.

    Returns (id_l, id_r, rank_dist) with id_l ranked before id_r.
    Reference analogue: none — the reference only hash-blocks
    (``advanced_matcher.py:30-55``); SNM is the standard complement in
    the ER literature.
    """
    if window < 2:
        raise ValueError(f"sorted_neighborhood_pairs: window must be >= 2, got {window}")
    ranked = global_rank(df, [*order_cols, id_col], release_handle=release_handle)
    slim = ranked.select(
        F.col(id_col), F.col("rank"), ((F.col("rank") - 1) / window).cast("long").alias("__bkt")
    )
    left = (
        slim.select(
            F.col(id_col).alias("id_l"),
            F.col("rank").alias("__r_l"),
            F.explode(F.array(F.col("__bkt"), F.col("__bkt") + 1)).alias("__bkt"),
        )
    )
    right = slim.select(
        F.col(id_col).alias("id_r"), F.col("rank").alias("__r_r"), "__bkt"
    )
    dist = F.col("__r_r") - F.col("__r_l")
    return (
        left.join(right.hint("shuffle_hash"), "__bkt")
        .filter((dist >= 1) & (dist <= window - 1))
        .select("id_l", "id_r", dist.alias("rank_dist"))
    )


def blocking_quality(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    true_pairs: DataFrame | None = None,
    probe_id: str | None = None,
    build_id: str | None = None,
) -> DataFrame:
    """Blocking-scheme evaluation (Christen's ER survey metrics): how much
    does a blocking key shrink the comparison space (reduction ratio) and
    how many TRUE matches survive it (pairs completeness)?

    * ``reduction_ratio`` = 1 - candidate_pairs / (|probe| * |build|)
    * ``pairs_completeness`` = co-blocked true pairs / |true pairs|
      (only when ``true_pairs`` with columns (probe_id, build_id) is given)

    candidate_pairs is computed WITHOUT materializing a single pair:
    per-key counts on each side, one equi-join of the two count tables
    (block-key cardinality, not row cardinality), sum of products. Every
    intermediate is an aggregate; the result is ONE row assembled by
    1-row cross-joins — no driver-side collect in the plan.
    """
    p_cnt = probe.groupBy(*keys).agg(F.count(F.lit(1)).alias("__pn"))
    b_cnt = build.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn"))
    # products and their sum in DOUBLE: at the 10^12-row scale this
    # evaluates, |probe|*|build| and even one hot block's pn*bn overflow
    # int64 (and wrap silently under non-ANSI arithmetic). Doubles are
    # exact through 2^53 — far past any count a human reads off this
    # report — and never wrap.
    per_block = p_cnt.join(b_cnt, keys).select(
        (F.col("__pn").cast("double") * F.col("__bn")).alias("__pairs")
    )
    blocks = per_block.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.coalesce(F.sum("__pairs"), F.lit(0.0)).alias("candidate_pairs"),
        F.coalesce(F.max("__pairs"), F.lit(0.0)).alias("largest_block_pairs"),
    )
    totals = (
        probe.agg(F.count(F.lit(1)).alias("__np"))
        .crossJoin(build.agg(F.count(F.lit(1)).alias("__nb")))
    )
    out = blocks.crossJoin(totals).withColumn(
        "reduction_ratio",
        F.round(
            F.lit(1.0)
            - F.col("candidate_pairs")
            / (F.col("__np").cast("double") * F.col("__nb")),
            6,
        ),
    )
    if true_pairs is not None:
        if not (probe_id and build_id):
            raise ValueError("blocking_quality: true_pairs requires probe_id and build_id")
        bk = [f"__bk_{c}" for c in keys]
        co = (
            true_pairs.join(probe.select(F.col(probe_id), *keys), probe_id)
            .join(
                build.select(
                    F.col(build_id), *[F.col(c).alias(a) for c, a in zip(keys, bk)]
                ),
                build_id,
            )
            .filter(
                # a true pair is co-blocked iff it agrees on EVERY key column
                F.lit(True)
                if not keys
                else F.expr(" AND ".join(f"{c} = __bk_{c}" for c in keys))
            )
            .select(probe_id, build_id)
            .distinct()
        )
        pc = (
            co.agg(F.count(F.lit(1)).alias("__co"))
            .crossJoin(true_pairs.agg(F.count(F.lit(1)).alias("__nt")))
            .select(
                F.round(F.col("__co") / F.col("__nt"), 6).alias("pairs_completeness")
            )
        )
        out = out.crossJoin(pc)
    return out.drop("__np", "__nb")
