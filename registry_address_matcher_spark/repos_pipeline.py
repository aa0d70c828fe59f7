"""North-rule pipeline: record linkage over a source-code repository table
``(repo, path, commit, lang, content)`` at 10^12-file design scale.

Re-realizes the reference's blocking -> pairwise-scoring -> (new)
transitive-clustering flow on the repos domain:

| reference concept                  | repos realization                     |
|------------------------------------|----------------------------------------|
| STREET/HOUSE/BUILDING normalize    | content whitespace-normalization + path-stem tokenization |
| FULL_ADDRESS exact phase (J1)      | sha256(content_norm) equality          |
| SEARCH_KEY blocking (J2/J4)        | (lang, MinHash band bucket) keys, salted |
| rapidfuzz street scoring (J5)      | batched Jaro-Winkler on path stems + shingle-Jaccard on content |
| one-best-match                     | pairwise edges -> large-star/small-star components |

Stages are checkpointed through :mod:`.plans.resume`; per-block lineage
and run metrics land in sidecar tables; the per-row ``sha256(content)``
invariant column rides through every stage untouched and is verified at
the end (BASELINE.json input_hint).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import ScaleConfig
from .functions.similarity import jaro_winkler_similarity
from .operators.blocking import salted_join
from .operators.cluster import connected_components
from .operators.dedup import minhash_signatures


@dataclass(frozen=True)
class ReposMatchConfig:
    shingle_n: int = 7
    num_perm: int = 64
    bands: int = 16
    # blended acceptance: w_content * shingle-jaccard + w_path * path-stem JW
    w_content: float = 0.8
    w_path: float = 0.2
    threshold: float = 0.7
    seed: int = 42
    # second candidate source: (lang, phonetic key of path stem) blocks —
    # catches renamed near-dups whose content drifted past the MinHash
    # bands; blocks above the cap are skipped (ubiquitous stems like
    # "index"/"main" are quadratic and carry no signal)
    phonetic_blocking: bool = True
    phonetic_block_cap: int = 100
    # "metaphone" (default, north-star phonetic code, Arrow kernel) or
    # "skeleton" (coarser consonant-skeleton, pure native + reproducible
    # in external SQL — the oracle-checked configuration)
    phonetic_kind: str = "metaphone"
    # "xxhash64" (default, cheapest) or "md5" (cross-engine reproducible:
    # shingle hashes, MinHash params, and band buckets all have DuckDB
    # twins — used by the driver-oracle configuration)
    hash_mode: str = "xxhash64"

    def __post_init__(self) -> None:
        # banding slices the signature into bands of num_perm // bands
        # rows; a non-dividing bands value would silently DROP the
        # trailing permutations from every band key (weaker LSH than
        # configured) — reject it instead
        if self.num_perm < 1 or self.bands < 1:
            raise ValueError(
                f"num_perm ({self.num_perm}) and bands ({self.bands}) must "
                "both be >= 1"
            )
        if self.num_perm % self.bands:
            raise ValueError(
                f"bands ({self.bands}) must divide num_perm ({self.num_perm})"
            )
        if self.hash_mode not in ("xxhash64", "md5"):
            raise ValueError(f"unknown hash_mode: {self.hash_mode!r}")
        if self.phonetic_kind not in ("metaphone", "skeleton"):
            raise ValueError(f"unknown phonetic_kind: {self.phonetic_kind!r}")


#: NULL sentinel for the surrogate key: concat_ws SKIPS null arguments in
#: both Spark and DuckDB, so ('a', NULL, 'b') and ('a', 'b', NULL) would
#: otherwise hash identically. chr(1) cannot occur in repo/path/commit.
_NULL_SENTINEL = "\x01"


def file_id_col() -> "F.Column":
    """Surrogate file identity: sha256(repo|path|commit). ``commit`` alone
    is NOT unique — one commit contains many files (round-1 defect: using
    it as file_id merged unrelated files through the cluster stage).
    NULL components are coalesced to a sentinel so NULL-bearing keys
    cannot collide (concat_ws silently drops nulls)."""
    parts = [F.coalesce(F.col(c), F.lit(_NULL_SENTINEL)) for c in ("repo", "path", "commit")]
    return F.sha2(F.concat_ws("|", *parts), 256)


def normalize_repos(df: DataFrame) -> DataFrame:
    """Derive the match-relevant columns; keep the invariant sha256.

    content_sha is over the RAW content (the invariant); matching uses
    content_norm (whitespace-collapsed) so formatting churn doesn't split
    clusters — mirroring the reference's normalize-before-match.
    """
    stem = F.regexp_replace(
        F.element_at(F.split(F.col("path"), "/"), -1), r"\.[^.]*$", ""
    )
    return df.select(
        file_id_col().alias("file_id"),
        "repo",
        "path",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.trim(F.regexp_replace(F.col("content"), r"\s+", " ")).alias("content_norm"),
        stem.alias("path_stem"),
    )


def assert_unique_file_ids(norm: DataFrame) -> int:
    """(repo, path, commit) is the input's primary key — enforce it, since
    every downstream join fans out on collisions. One aggregate action.
    Returns the row count (callers reuse it as the ``n_docs`` partition
    hint instead of paying a second action)."""
    row = norm.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("file_id").alias("d")
    ).collect()[0]
    if row["n"] != row["d"]:
        raise ValueError(
            f"duplicate (repo, path, commit) rows: {row['n']} rows, "
            f"{row['d']} distinct file_ids"
        )
    return int(row["n"])


def exact_content_pairs(norm: DataFrame) -> DataFrame:
    """EXACT_FULL analogue: identical normalized content. Pairs emitted
    star-shaped against the group minimum — O(group) edges instead of
    O(group^2), which is all connected components needs for correctness.

    The group representative is computed with ``groupBy(h).agg(min)`` +
    join-back, NOT a ``Window.partitionBy(h)``: a window puts every row
    of one content group in ONE task, and at 10^12 files the ubiquitous-
    content groups (empty files, license boilerplate — the classic
    code-corpus skew) are hundred-million-row groups, i.e. one straggler
    task holding the stage. The aggregate path is skew-safe (map-side
    partial aggregation shrinks each hot group to one row per input
    partition before the shuffle) and the join-back is a plain equi-join
    AQE can skew-split. Plan shape pinned by
    ``tests/test_repos_job.py::test_exact_content_pairs_skew_safe``."""
    h = norm.select(
        "file_id", F.sha2("content_norm", 256).alias("h")
    )
    reps = h.groupBy("h").agg(F.min("file_id").alias("rep"))
    stars = h.join(reps, "h").filter(
        F.col("file_id") != F.col("rep")
    )
    return stars.select(
        F.col("rep").alias("id_l"),
        F.col("file_id").alias("id_r"),
        F.lit(1.0).alias("score"),
        F.lit("EXACT_CONTENT").alias("match_type"),
    )


def banded_ids(sigs: DataFrame, cfg: ReposMatchConfig) -> DataFrame:
    """(id, lang, band, bucket) — one row per (doc, band). Ids ONLY: the
    shingle arrays (KBs per doc) must not ride through the 16x band
    explode and its shuffle; scoring re-attaches per-doc data afterwards
    (two narrow joins instead of a 16x-duplicated wide shuffle).

    Two spellings of the bucket key:

    * md5 mode — the raw comma-joined slice string via higher-order
      ``transform``/``slice``: cross-engine reproducible (the DuckDB
      oracle builds the identical string), correctness path only.
    * xxhash64 mode (scale default) — ``xxhash64(band, sig[i]...)`` over
      ``element_at`` projections: every expression whole-stage-codegens,
      where the higher-order form is INTERPRETED and allocation-heavy
      (an r5 profile had the band evaluation as the top CPU inflater at
      width — interpreted eval allocates per row, and G1 pressure grows
      superlinearly with concurrent task threads).
    """
    r = cfg.num_perm // cfg.bands
    if cfg.hash_mode == "md5":
        def band_key(b):
            return F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), b * r + 1, r), lambda v: v.cast("string")
                ),
            )
    else:
        def band_key(b):
            # raw bigint, not string: the bucket rides the 16x band
            # explode's shuffle and keys the salted self-join, so a
            # fixed 8-byte long beats a ~20-char decimal string on both
            # shuffle bytes and join-key compares (UTF8String equality
            # vs primitive). md5 mode keeps strings for oracle parity.
            return F.xxhash64(
                F.lit(b), *[F.element_at("sig", b * r + i) for i in range(1, r + 1)]
            )

    entries = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_key(b).alias("bucket"))
            for b in range(cfg.bands)
        ]
    )
    # xxhash64 (scale) mode also narrows the id itself for the ride
    # through the band explode and the downstream pair shuffles:
    # unhex() turns the 64-char sha256 hex into its 32-byte binary —
    # half the wire bytes, and unlike text the nibbles don't compress
    # (random hex has no lz4 matches, so the string form ships at full
    # width). Binary comparison is unsigned-lexicographic, which orders
    # identically to the lowercase-hex form, so id_l < id_r orientation
    # is unchanged. candidate_block_pairs restores the public hex form
    # at its boundary. md5 mode keeps strings end-to-end for the
    # cross-engine oracle.
    id_col = F.unhex("id").alias("id") if cfg.hash_mode == "xxhash64" else F.col("id")
    return sigs.select(id_col, "lang", F.inline(entries))


def candidate_block_pairs(
    norm: DataFrame,
    cfg: ReposMatchConfig,
    scale: ScaleConfig | None = None,
    n_docs: int | None = None,
    truncation_reports: list | None = None,
    side_out: list | None = None,
    cache_out: list | None = None,
) -> DataFrame:
    """Blocking: (lang, MinHash band bucket) — skew-salted equi-self-join.

    ``lang`` rides along as an explicit block key: it is the deliberately
    skewed column (half the corpus is one language), so the salting path
    is exercised on every real run.

    Band blocks are capped at ``scale.max_pairs_per_block`` pairs
    (default on — quadratic-block guard, VERDICT r3 #4); pass a list as
    ``truncation_reports`` to receive the per-block truncation report
    DataFrame for the lineage sidecar. The phonetic path needs no cap:
    it drops blocks above ``cfg.phonetic_block_cap`` rows entirely.

    Pass a list as ``side_out`` to ALSO receive the per-doc scoring side
    table (file_id, path_stem, sh) carried through the same checkpoint —
    the hashed shingle sets here are the very arrays the MinHash kernel
    hashed, so handing them to :func:`score_pairs` (its ``side`` param)
    removes the scoring stage's own shingle re-hash + second
    materialization barrier (round-5 profile: an entire ~40 s /
    ~50 cpu-s stage at 108k files / 2 cores).

    Pass a list as ``cache_out`` to receive the internally ``persist()``ed
    derivative DataFrames (band table, phonetic key table): they must stay
    cached until the caller's action over the returned pairs completes,
    after which a long-lived session should ``unpersist()`` each — there
    is no other handle, and without it repeated calls accumulate
    MEMORY_AND_DISK blocks for the life of the session. (The eager
    ``localCheckpoint`` RDDs are reclaimed by the ContextCleaner once the
    returned DataFrame is garbage-collected.)
    """
    scale = scale or ScaleConfig()
    # ONE eager localCheckpoint covers BOTH candidate sources: the
    # signature output is scanned twice below (banding + hot-key
    # detection) and the phonetic key twice more (block-size agg +
    # join-back), and a downstream single-action write would otherwise
    # re-run the Arrow kernels once per plan branch — a lazy persist()
    # does not help when the branches run inside the same first action.
    # The phonetic key rides the signature projection (computed in the
    # same job, via the same join with norm) instead of its own
    # checkpoint: each localCheckpoint is a full job with a serial
    # schedule/collect tail, and at small widths two barriers were a
    # measurable Amdahl fraction of pairgen (round-4 profile: pairgen
    # scaled 2.7x of a 4x core budget with two barriers). History of the
    # barrier count: round 3 ran two checkpoints CONCURRENTLY from
    # driver threads — 2x CPU from per-executor oversubscription
    # (measured 1168 vs 564 cpu-s at 216k files / 8 cores); round 4 made
    # them sequential; round 5 folds them into one.
    sig_key_cols = [F.col("file_id").alias("id"), F.col("lang")]
    if cfg.phonetic_blocking:
        from .functions.phonetic import phonetic_block_key, skeleton_key

        pkey = (
            skeleton_key(F.col("path_stem"))
            if cfg.phonetic_kind == "skeleton"
            else phonetic_block_key(F.col("path_stem"))
        )
        sig_key_cols.append(pkey.alias("pkey"))
    if side_out is not None:
        sig_key_cols.append(F.col("path_stem"))
    extra = (["pkey"] if cfg.phonetic_blocking else []) + (
        ["path_stem", "sh"] if side_out is not None else []
    )
    sigs_plan = minhash_signatures(
        norm.select(F.col("file_id").alias("id"), "lang", "content_norm"),
        "id",
        "content_norm",
        shingle_n=cfg.shingle_n,
        num_perm=cfg.num_perm,
        seed=cfg.seed,
        hash_mode=cfg.hash_mode,
        n_docs=n_docs,
        keep_hashed_shingles=side_out is not None,
        # no string shingles needed here — in xxhash64 mode this also
        # routes shingling+hashing into the fused Arrow kernel (raw text
        # crosses the kernel shuffle, not per-shingle hash arrays)
        keep_shingles=False,
    ).join(norm.select(*sig_key_cols), "id")
    sigs = sigs_plan.select("id", "lang", "sig", *extra).localCheckpoint()
    if side_out is not None:
        side_out.append(
            sigs.select(F.col("id").alias("file_id"), "path_stem", "sh")
        )
    # Slim derivatives of the fat checkpoint, persisted: the checkpoint
    # rows carry the KB-sized `sh`/`sig` arrays, and the band+phonetic
    # join below otherwise scans them SIX times inside one action (band
    # probe/build + hot-key agg, phonetic sizes/left/right). Each fat
    # scan re-materializes every array row; at 8 concurrent tasks the 4x
    # allocation rate inflated band_join user-CPU ~45% vs 2 tasks
    # (round-5 split profile: 90.5 -> 131.7 user cpu-s at 216k files)
    # plus kernel page-commit sys time. The lazy persist is populated
    # race-free: both consumers' BROADCAST sub-jobs (hot-key list,
    # phonetic block sizes) run before the main join stages and warm the
    # cache, so the fat checkpoint is scanned once per derivative.
    # same binary-id narrowing as banded_ids (see there): the phonetic
    # pairs union into the band pairs' dedup shuffle, so both branches
    # must carry the same id representation
    _id = F.unhex("id").alias("id") if cfg.hash_mode == "xxhash64" else F.col("id")
    keyed = (
        sigs.select(_id, "lang", "pkey").filter(F.col("pkey") != "").persist()
        if cfg.phonetic_blocking
        else None
    )
    banded = banded_ids(sigs, cfg).persist()
    if cache_out is not None:
        cache_out.extend([banded] if keyed is None else [banded, keyed])
    probe = banded.select("lang", "band", "bucket", F.col("id").alias("id_l"))
    build = banded.select("lang", "band", "bucket", F.col("id").alias("id_r"))
    # output is id pairs only — shingles are re-derived natively by the
    # scoring stage; checkpointing KB-sized arrays per pair would dominate
    # the stage's write cost for nothing
    pairs = (
        salted_join(probe, build, ["lang", "band", "bucket"], scale,
                    probe_salt_cols=["id_l"])
        .filter(F.col("id_l") < F.col("id_r"))
    )
    # Dedup BEFORE the cap, not after: a pair matching in k of the 16
    # bands leaves the join k times (measured 9x at bench scale), and the
    # old order pushed that full volume through the cap's per-(block,
    # salt) SORT window and then again through a dropDuplicates shuffle —
    # two full-volume passes, and the sort was the band_join stage's top
    # CPU inflater at width. A hash aggregate on (lang, id_l, id_r) —
    # uniform sha256-derived keys, skew-free at any scale — collapses the
    # duplication in the one unavoidable full-volume shuffle; the cap
    # then ranks only unique pairs. min(struct(band, bucket)) attributes
    # each pair to its first band deterministically, so cap quotas and
    # truncation lineage now count UNIQUE pairs per block (a strictly
    # tighter guard than the old duplicated count — and a mega-block
    # sheds to earlier bands whatever pairs it shares with them).
    pairs = (
        pairs.groupBy("lang", "id_l", "id_r")
        .agg(F.min(F.struct("band", "bucket")).alias("__bb"))
        .select(
            "lang",
            F.col("__bb.band").alias("band"),
            F.col("__bb.bucket").alias("bucket"),
            "id_l",
            "id_r",
        )
    )
    if scale.max_pairs_per_block is not None:
        from .operators.blocking import cap_block

        pairs, report = cap_block(
            pairs, ["lang", "band", "bucket"], "id_l", "id_r",
            scale.max_pairs_per_block, scale.salt_buckets,
        )
        if truncation_reports is not None:
            truncation_reports.append(report)
    pairs = pairs.select("lang", "id_l", "id_r")
    if keyed is not None:
        # both branches carry binary ids in xxhash64 mode, so the union's
        # dedup shuffle still ships 32-byte ids
        pairs = pairs.unionByName(
            _phonetic_pairs_from_keyed(keyed, cfg)
        ).dropDuplicates(["id_l", "id_r"])
    # else: band pairs are already unique on (id_l, id_r) — each id
    # carries exactly one lang (both derive from the same file row)
    if cfg.hash_mode == "xxhash64":
        # boundary: restore the public sha256-hex surrogate (lower() —
        # hex() emits uppercase, sha2() lowercase) so callers and the
        # scoring side table join on the unchanged id form
        pairs = pairs.select(
            "lang",
            F.lower(F.hex("id_l")).alias("id_l"),
            F.lower(F.hex("id_r")).alias("id_r"),
        )
    return pairs


def _phonetic_keyed(norm: DataFrame, cfg: ReposMatchConfig) -> DataFrame:
    """(id, lang, pkey) plan for the phonetic blocking path. Callers must
    materialize it (localCheckpoint) before the double reference below:
    the tiny table is referenced twice (block-size agg + join-back) and
    metaphone's Arrow kernel re-running per branch over the full corpus
    measurably ANTI-scales in local mode (concurrent Python workers
    saturate the loopback; observed 8-core runs 2x slower than 2-core
    before this materialization)."""
    from .functions.phonetic import phonetic_block_key, skeleton_key

    pkey = (
        skeleton_key(F.col("path_stem"))
        if cfg.phonetic_kind == "skeleton"
        else phonetic_block_key(F.col("path_stem"))
    )
    return (
        norm.select(F.col("file_id").alias("id"), "lang", pkey.alias("pkey"))
        .filter(F.col("pkey") != "")
    )


def _phonetic_pairs_from_keyed(keyed: DataFrame, cfg: ReposMatchConfig) -> DataFrame:
    sizes = keyed.groupBy("lang", "pkey").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(F.col("n") <= cfg.phonetic_block_cap).select("lang", "pkey")
    keyed = keyed.join(F.broadcast(ok), ["lang", "pkey"])
    left = keyed.select("lang", "pkey", F.col("id").alias("id_l"))
    right = keyed.select("lang", "pkey", F.col("id").alias("id_r"))
    return (
        left.join(right, ["lang", "pkey"])
        .filter(F.col("id_l") < F.col("id_r"))
        .select("lang", "id_l", "id_r")
    )


def phonetic_stem_pairs(norm: DataFrame, cfg: ReposMatchConfig) -> DataFrame:
    """Candidates from (lang, phonetic key of the path stem) blocks — the
    north star's soundex/metaphone name-token keys (kind="metaphone"), or
    the SQL-portable consonant skeleton (kind="skeleton"). Blocks above
    ``phonetic_block_cap`` files are dropped entirely (deterministically):
    ubiquitous stems are quadratic noise."""
    return _phonetic_pairs_from_keyed(
        _phonetic_keyed(norm, cfg).localCheckpoint(), cfg
    )


def shingle_side(norm: DataFrame, cfg: ReposMatchConfig) -> DataFrame:
    """Per-doc scoring side table: (file_id, path_stem, hashed shingle
    set). Callers that reference it more than once (score_pairs does,
    twice) should localCheckpoint it — the higher-order shingle
    expression is interpreted and re-evaluating it per plan branch
    dominated the stage before the checkpoint (see score_pairs)."""
    from .operators.dedup import _MERSENNE, cross_hash60, ngram_shingles

    # Jaccard runs over HASHED shingle sets (array<long>), not strings:
    # primitive long arrays allocate ~7x less than 500-element string
    # arrays (string-shingle GC inflated the stage's CPU ~50% under
    # 8-way concurrency in one JVM) and intersect faster. md5 mode hashes
    # with the cross-engine 60-bit md5 (mod p) so the DuckDB twin sees
    # the IDENTICAL sets — collisions (~1e-4/doc at 2^31) shrink both
    # sides' sets identically, so jaccard still matches exactly.
    sh_raw = ngram_shingles(F.col("content_norm"), cfg.shingle_n)
    if cfg.hash_mode == "md5":
        sh_h = F.array_distinct(
            F.transform(sh_raw, lambda s: cross_hash60(s) % F.lit(_MERSENNE))
        )
    else:
        sh_h = F.array_distinct(F.transform(sh_raw, lambda s: F.xxhash64(s)))
    return norm.select(
        F.col("file_id"),
        F.col("path_stem"),
        sh_h.alias("sh"),
    )


#: Up to this many candidate pairs, score_pairs broadcast-HINTS the pair
#: table into join 1 (pairs ⋈ side on id_l): the wide side then streams
#: shuffle- and sort-free — strictly better, and ~110 MB of in-memory id
#: triples at the bound is routine broadcast freight. Above it, both
#: inputs are explicitly co-partitioned instead. The bound is pinned
#: (not left to the planner) because the planner's own size estimate
#: sits near spark.sql.autoBroadcastJoinThreshold right in this regime:
#: measured at 440k pairs it broadcast (scoring 6.5 s / 8 cores / 216k
#: files) but at 1.27M pairs it chose sort-merge at the session shuffle
#: count and spill-stormed (92 s scoring; see the join-shape comment) —
#: an estimate-drift cliff no caller should be exposed to. This is the
#: DEFAULT of score_pairs' ``broadcast_pairs_max`` parameter — callers
#: with smaller driver heaps tune it per call, not by editing this.
_BROADCAST_PAIRS_MAX = 600_000


def score_pairs(
    pairs: DataFrame,
    norm: DataFrame,
    cfg: ReposMatchConfig,
    n_pairs: int | None = None,
    pairs_per_partition: int = 4_000,
    checkpoint_side: bool = True,
    side: DataFrame | None = None,
    side_distinct: bool = True,
    broadcast_pairs_max: int = _BROADCAST_PAIRS_MAX,
) -> DataFrame:
    """Pairwise scoring: native shingle-Jaccard (token-set similarity) +
    one Arrow pass of Jaro-Winkler on path stems. Returns scored pairs
    with block context for lineage.

    ``pairs`` carries ids only; shingles and stems are attached here by
    joining ``norm``. The per-doc shingle table is localCheckpointed
    first (``checkpoint_side``, default True): it is referenced by BOTH
    pair-side joins, and Spark's higher-order shingle expression is
    evaluated INTERPRETED (no codegen) — recomputing it per branch
    measurably dominated the stage (8-core: 128 s / 706 cpu-s before,
    ~34 s / ~220 cpu-s with the checkpoint, at 108k docs / 143k pairs).
    Checkpointing per-DOC arrays is cheap; per-PAIR would not be.

    The Jaccard/JW compute is the job's CPU core; its input is explicitly
    repartitioned because AQE sizes post-shuffle partitions by COMPRESSED
    bytes and shingle arrays of similar code compress so well that the
    heavy array-intersection stage would otherwise collapse onto a few
    tasks (the round-2 repos job scaled at 0.59 for exactly this reason).
    ``n_pairs`` (caller-known, e.g. from a persisted pair count) keeps the
    partition SIZE constant across cluster sizes; unknown count falls
    back to 4 x cores. Pass a pre-materialized ``side`` (from
    :func:`shingle_side` or :func:`candidate_block_pairs`'s ``side_out``)
    to skip the build here.

    CONTRACT: the ``sh`` arrays of a caller-supplied ``side`` must be
    duplicate-free — the kernel counts |A ∩ B| as the duplicate count of
    the sorted concatenation, which over-counts (jaccard can exceed 1.0)
    if either array repeats a hash. Every in-repo producer guarantees
    this (``array_distinct`` in :func:`shingle_side` / the MinHash
    kernel's ``np.unique``); for a side of unknown provenance pass
    ``side_distinct=False`` and the arrays are normalized here."""
    if side is None:
        side = shingle_side(norm, cfg)
        if checkpoint_side:
            side = side.localCheckpoint()
    elif not side_distinct:
        side = side.withColumn("sh", F.array_distinct("sh"))
    cores = pairs.sparkSession.sparkContext.defaultParallelism
    if n_pairs is not None:
        from .partitioning import cpu_stage_partitions

        n_part = cpu_stage_partitions(n_pairs, pairs_per_partition, cores)
    else:
        n_part = max(cores * 4, 8)
    # Join shape matters — the rows get WIDE (two KB-sized shingle arrays
    # per pair) the moment the side attaches, so every downstream
    # exchange/sort of them is priced in GBs:
    #   * join 1 (id_l): broadcast-hinted up to _BROADCAST_PAIRS_MAX
    #     pairs — the wide side then STREAMS (zero wide shuffle, zero
    #     sort). Above the bound it is explicitly co-partitioned to
    #     ``n_part`` like join 2: left to the planner there, it became a
    #     sort-merge join at the SESSION shuffle count (= cores
    #     locally), sorting the full wide side over W tasks whose
    #     execution memory shrinks as W grows — measured at 432k files /
    #     1.27M pairs as a spill storm (8-core scoring 92 s wall / 904
    #     total cpu-s vs 2-core 133 s / 392; efficiency 0.49).
    #     Co-partitioned, every sort is ~pairs_per_partition rows at any
    #     width. See _BROADCAST_PAIRS_MAX for why the bound is pinned
    #     rather than left to the planner's size estimate.
    #   * join 2 (id_r): both inputs are explicitly co-partitioned to
    #     ``n_part`` BEFORE the join. Left at the session shuffle count
    #     (= cores locally), each sort-merge task sorted ~pairs/cores
    #     wide rows; per-task execution memory SHRINKS as concurrency
    #     grows, so the 8-core run sort-SPILLED where the 2-core run ran
    #     in memory — measured as an anti-scaling kernel-time storm
    #     (scoring 41 s at 2 cores vs 78-118 s at 8, sys-time bound).
    #     Co-partitioning bounds every sort at ~pairs_per_partition rows
    #     regardless of cluster width.
    #   * the kernel consumes join 2's partitioning directly — the old
    #     extra repartition(id_l, id_r) re-shuffled the full wide table
    #     once more for nothing (ids are sha256-uniform, and per-block
    #     pair caps bound how often one doc can appear on the build
    #     side; AQE skew-join splits any residual hot partition).
    side_l = side.select(
        F.col("file_id").alias("id_l"),
        F.col("path_stem").alias("stem_l"),
        F.col("sh").alias("sh_l"),
    )
    if n_pairs is None:
        p = pairs.join(side_l, "id_l")  # unknown size: planner's call
    elif n_pairs <= broadcast_pairs_max:
        p = F.broadcast(pairs).join(side_l, "id_l")
    else:
        p = (
            pairs.repartition(n_part, "id_l")
            .join(side_l.repartition(n_part, "id_l"), "id_l")
        )
    p = (
        p.repartition(n_part, "id_r")
        .join(
            side.select(
                F.col("file_id").alias("id_r"),
                F.col("path_stem").alias("stem_r"),
                F.col("sh").alias("sh_r"),
            ).repartition(n_part, "id_r"),
            "id_r",
        )
        .select("lang", "id_l", "id_r", "stem_l", "stem_r", "sh_l", "sh_r")
    )
    # BOTH scorers run in ONE mapInPandas kernel. Two rejected designs,
    # both measured at 354k pairs / 216k files / 8 cores:
    #   1. native array_intersect jaccard + Arrow JW udf fused in one
    #      projection — ExtractPythonUDFs evaluates the python UDF FIRST,
    #      so ArrowEvalPython's HybridRowQueue buffers the full rows
    #      (both KB-sized shingle arrays per pair, multi-GB) while
    #      awaiting python results: 146 s / 670 cpu-s, degrading to
    #      kernel-side storms (disk spill + allocation pressure).
    #   2. native jaccard behind a localCheckpoint barrier, then slim
    #      JW — the barrier materialization itself storms (996 cpu-s):
    #      interpreted ArrayIntersect/ArrayUnion allocate a hash set per
    #      row under W-way concurrency.
    # mapInPandas has NO JVM-side row queue — batches stream to python,
    # only the slim result rows come back — and the set math is one numpy
    # sort per pair: both arrays are DISTINCT by construction
    # (array_distinct at build), so |A ∩ B| = the duplicate count of the
    # sorted concatenation — measured 2.2x faster than np.intersect1d,
    # which cannot be told the inputs are unique and re-uniques both. A
    # third design — fully vectorized batch formulation (one
    # lexsort((vals, pair_ids)) over the whole batch + masked bincount,
    # no python loop) — measured 13x SLOWER (125.6 vs 9.6 us/pair at
    # 4k pairs x 50-400 shingles): each per-pair sort is L1/L2-resident
    # while the batch-wide two-key lexsort walks a multi-MB working set
    # from DRAM, the same cache-residency effect that drove the MinHash
    # kernel's permutation blocking. On NON-NULL inputs
    # the jaccard is the exact set intersection over the hashed shingle
    # sets (identical to array_intersect semantics on distinct arrays),
    # so the md5-mode DuckDB oracle still matches hash-for-hash. NULL
    # semantics are DELIBERATELY stricter than the old native jaccard_col
    # (which let a one-sided NULL fall through to 1.0): NULL is treated
    # as the empty set, so no-shingles-vs-no-shingles -> 1.0 but
    # no-shingles-vs-some -> 0.0 — a file with no content cannot
    # fuzzy-match one that has some. Pinned by
    # tests/test_repos_job.py::test_score_pairs_matches_native_kernels.
    # JW reuses the same scalar (jaro_winkler_similarity) the Arrow udf
    # wrapped, with the same per-batch pair memo (path stems repeat
    # heavily).
    import numpy as np
    import pandas as pd

    w_content, w_path = cfg.w_content, cfg.w_path

    def _score(batches):
        for pdf in batches:
            n = len(pdf)
            jac = np.empty(n, dtype="float64")
            jw = np.empty(n, dtype="float64")
            cache: dict = {}
            stems_l = pdf["stem_l"].fillna("").tolist()
            stems_r = pdf["stem_r"].fillna("").tolist()
            sh_l = pdf["sh_l"].tolist()
            sh_r = pdf["sh_r"].tolist()
            for i in range(n):
                a, b = sh_l[i], sh_r[i]
                la = 0 if a is None else len(a)
                lb = 0 if b is None else len(b)
                if la == 0 and lb == 0:
                    jac[i] = 1.0
                elif la == 0 or lb == 0:
                    jac[i] = 0.0
                else:
                    c = np.concatenate([a, b])
                    c.sort()
                    inter = int((c[1:] == c[:-1]).sum())
                    jac[i] = inter / (la + lb - inter)
                key = (stems_l[i], stems_r[i])
                v = cache.get(key)
                if v is None:
                    v = jaro_winkler_similarity(*key)
                    cache[key] = v
                jw[i] = v
            yield pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "id_l": pdf["id_l"],
                    "id_r": pdf["id_r"],
                    "jaccard": jac,
                    "jw": jw,
                }
            )

    scored = p.mapInPandas(
        _score, "lang string, id_l string, id_r string, jaccard double, jw double"
    )
    scored = scored.withColumn(
        "score",
        F.round(w_content * F.col("jaccard") + w_path * F.col("jw"), 6),
    )
    return scored.select("lang", "id_l", "id_r", "jaccard", "jw", "score")


def accepted_pairs(scored: DataFrame, cfg: ReposMatchConfig) -> DataFrame:
    return scored.filter(F.col("score") >= cfg.threshold).select(
        "id_l", "id_r", "score", F.lit("FUZZY_MINHASH").alias("match_type")
    )


def cluster_pairs(all_pairs: DataFrame, norm: DataFrame, scale: ScaleConfig | None = None) -> DataFrame:
    """Transitive closure over accepted + exact pairs; singleton files get
    their own component. Returns (file_id, component, content_sha) — the
    sha rides through for the end-to-end invariant check."""
    edges = all_pairs.select(F.col("id_l").alias("src"), F.col("id_r").alias("dst"))
    comp = connected_components(edges, scale)
    files = norm.select(F.col("file_id"), "content_sha")
    joined = files.join(comp.withColumnRenamed("node", "file_id"), "file_id", "left")
    return joined.select(
        "file_id",
        F.coalesce(F.col("component"), F.col("file_id")).alias("component"),
        "content_sha",
    )


def pairwise_f1(clusters: DataFrame, labels: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of the transitive clustering against a
    labeled-pairs table (left_id, right_id, is_match) — two files are
    predicted matching iff they land in the same component.

    Fully distributed (two equi-joins + one aggregate): the driver-side
    pandas loop in the pytest gate is fine at 360 files but not at the
    bench's 216k, where the label table is ~432k rows."""
    comp = clusters.select("file_id", "component")
    j = (
        labels.join(
            comp.select(
                F.col("file_id").alias("left_id"), F.col("component").alias("c_l")
            ),
            "left_id",
            "left",
        ).join(
            comp.select(
                F.col("file_id").alias("right_id"), F.col("component").alias("c_r")
            ),
            "right_id",
            "left",
        )
    )
    # both-sides-non-null guard FIRST: `False & NULL` is False in SQL, so
    # every labeled pair lands in exactly one of tp/fn/fp even when one
    # side's file is missing from the clustering (a bare `c_l == c_r`
    # with one NULL side evaluates to SQL NULL and the pair would drop
    # out of the aggregate entirely, silently inflating recall)
    same = (
        F.col("c_l").isNotNull()
        & F.col("c_r").isNotNull()
        & (F.col("c_l") == F.col("c_r"))
    )
    row = j.agg(
        F.sum(F.when(F.col("is_match") & same, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("is_match") & ~same, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("is_match") & same, 1).otherwise(0)).alias("fp"),
    ).collect()[0]
    tp, fn, fp = int(row["tp"]), int(row["fn"]), int(row["fp"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fn": fn, "fp": fp,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
    }


def verify_sha_invariant(input_df: DataFrame, output_df: DataFrame) -> bool:
    """Per-row sha256(content) equality between pipeline input and output."""
    lhs = input_df.select(
        file_id_col().alias("file_id"), F.sha2("content", 256).alias("sha_in")
    )
    rhs = output_df.select("file_id", F.col("content_sha").alias("sha_out"))
    bad = lhs.join(rhs, "file_id", "full").filter(
        (F.col("sha_in").isNull())
        | (F.col("sha_out").isNull())
        | (F.col("sha_in") != F.col("sha_out"))
    )
    return bad.limit(1).count() == 0
