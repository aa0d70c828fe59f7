"""Fuzzy matching phase (reference J4+J5) — block join, batched scoring,
deterministic top-1.

Reference semantics (``advanced_matcher.py:343-409``):

* candidates = CAD rows with EXACT ``HOUSE_NORM`` **and** ``BUILDING_NORM``
  equality (house index probe :347 + building filter :350-355); CAD rows
  with empty ``HOUSE_NORM`` are never indexed (:43-45), SPR rows with
  empty street bail (:377-378), empty-street candidates are dropped from
  scoring but still counted in CANDIDATES_COUNT (:365-372 vs :406);
* 4 scorers on the street pair; per strategy take the best candidate; the
  best strategy wins with strict ``>`` — earlier strategy wins ties
  (:388-397);
* accept iff best score >= threshold (default 85).

Spark realization: one equi-join on (HOUSE_NORM, BUILDING_NORM) — salted
when skewed — then ONE Arrow-batched pandas UDF computing all 4 scores per
pair, then a native window top-1 with the tie-break encoded as an explicit
ORDER BY (score desc, strategy precedence asc, cad id asc). Never relies
on row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import MatchConfig, ScaleConfig
from ..functions.similarity import best_of_strategies, fuzzy_scores
from .blocking import salted_join
from .exact import as_match_records

_PAIR_COLS = ["ADDRESS_ID", "STREET_NAME", "HOUSE", "BUILDING",
              "FULL_ADDRESS", "COMPLETENESS_SCORE", "STREET_NORM"]
#: what the scoring stage actually needs per side — everything else is
#: joined back AFTER top-1 (the match set is <= |probe|, tiny next to the
#: candidate-pair set, so the wide columns never ride the scoring shuffle)
_SLIM_COLS = ["ADDRESS_ID", "STREET_NORM"]
_ATTR_COLS = ["STREET_NAME", "HOUSE", "BUILDING", "FULL_ADDRESS", "COMPLETENESS_SCORE"]


def candidate_pairs(
    spr: DataFrame,
    cad: DataFrame,
    scale: ScaleConfig | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """J4 — block join on (HOUSE_NORM, BUILDING_NORM) with skew salting.

    Keeps empty-street CAD candidates at this stage: the reference counts
    them in CANDIDATES_COUNT even though it never scores them.
    ``columns`` selects which per-side columns ride the join (default:
    the full pair schema; the scoring path passes the slim id+street set).
    """
    scale = scale or ScaleConfig()
    cols = columns or _PAIR_COLS
    keys = ["HOUSE_NORM", "BUILDING_NORM"]
    probe = spr.filter(F.col("HOUSE_NORM") != "").select(*keys, *[
        F.col(c).alias(f"{c}_SPR") for c in cols
    ])
    build = cad.filter(F.col("HOUSE_NORM") != "").select(*keys, *[
        F.col(c).alias(f"{c}_CAD") for c in cols
    ])
    # salt on the probe id explicitly: within a hot block a payload-
    # duplicate-heavy probe would otherwise collapse onto one salt.
    # Custom column sets without the id fall back to whole-row salting
    # (salted_join's default) rather than failing analysis.
    salt_cols = ["ADDRESS_ID_SPR"] if "ADDRESS_ID" in cols else None
    return salted_join(probe, build, keys, scale, probe_salt_cols=salt_cols)


def _attach_side_attrs(matched: DataFrame, spr: DataFrame, cad: DataFrame) -> DataFrame:
    """Re-attach the non-scoring columns to an id-keyed match table.
    ADDRESS_ID is unique per registry — two no-fanout hash joins whose
    left side is the (small) match set, not the candidate-pair set."""
    spr_attrs = spr.select(
        F.col("ADDRESS_ID").alias("ADDRESS_ID_SPR"),
        *[F.col(c).alias(f"{c}_SPR") for c in _ATTR_COLS],
    )
    cad_attrs = cad.select(
        F.col("ADDRESS_ID").alias("ADDRESS_ID_CAD"),
        *[F.col(c).alias(f"{c}_CAD") for c in _ATTR_COLS],
    )
    return matched.join(spr_attrs, "ADDRESS_ID_SPR").join(cad_attrs, "ADDRESS_ID_CAD")


def estimate_block_pairs(spr: DataFrame, cad: DataFrame, keys: list[str]) -> int:
    """Expected candidate-pair count = sum over blocks of |probe| x |build|.
    Aggregates per-key COUNTS (tiny next to the data) and joins them — one
    small action, no pair materialization."""
    pa = (
        spr.filter(F.col("HOUSE_NORM") != "")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__np"))
    )
    pb = (
        cad.filter(F.col("HOUSE_NORM") != "")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__nb"))
    )
    row = (
        pa.join(pb, keys)
        .agg(F.sum(F.col("__np") * F.col("__nb")).alias("pairs"))
        .collect()[0]
    )
    return int(row["pairs"] or 0)


def _scoring_partitions(spr: DataFrame, cad: DataFrame, scale: ScaleConfig | None) -> int:
    """Partition count for the CPU-bound Arrow scoring stage.

    Adaptive (default): ceil(pairs / pairs_per_partition) rounded up to a
    whole number of scheduling waves, from a cheap block-key-count
    estimate (~1-2 s at 600k probe rows, exact — it is the same
    sum-of-products the join performs). Keeping the PARTITION SIZE
    constant (~250k pairs) across cluster sizes is what makes throughput
    scale with cores — a cores-derived count changes the Arrow batch size
    under the measurement (round-2 regression: 4 x cores gave 128
    undersized partitions at 32 cores and 3.14 s -> 4.61 s on the
    identical sf0.1 input); wave rounding avoids a ragged last wave
    (see partitioning.cpu_stage_partitions). Fallback when adaptation is
    disabled or the estimate fails: 4 x cores. ``RAM_SPARK_SCORE_PARTS``
    overrides both.
    """
    import os

    from ..partitioning import cpu_stage_partitions

    scale = scale or ScaleConfig()
    override = int(os.environ.get("RAM_SPARK_SCORE_PARTS", "0"))
    if override:
        return override
    sc = spr.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if scale.adaptive_scoring_partitions:
        try:
            est = estimate_block_pairs(spr, cad, ["HOUSE_NORM", "BUILDING_NORM"])
            return cpu_stage_partitions(est, scale.pairs_per_partition, cores)
        except Exception as exc:  # estimate is an optimization, never a failure mode
            # ...but a silently non-adaptive run must be visible
            # (VERDICT r3 #5): record to the metrics sidecar + WARN log
            from ..plans.events import record_event

            record_event(
                "scoring", "adaptive_partition_estimate_failed",
                f"{type(exc).__name__}; fell back to 4 x cores",
            )
    return max(cores * 4, 8)


#: vocabulary-product ceiling for DRIVER-side distinct-pair scoring:
#: below it the whole vocabulary is collected in one bounded action
#: (<= this many strings per side) and scored in-process — ~0.4 s of
#: single-thread kernel work worst-case — replacing the distinct-
#: aggregate + Python-worker broadcast subtree with a LocalTableScan.
#: Between this and scoring_dedup_max_pairs, the distinct pairs are
#: built and scored distributedly instead.
_DRIVER_SCORE_MAX_PAIRS = 50_000


def _vocab_union(spr: DataFrame, cad: DataFrame) -> DataFrame:
    """Side-tagged union of the two filtered street projections (the
    vocabulary carrier both guard actions aggregate over)."""
    return (
        spr.filter((F.col("HOUSE_NORM") != "") & (F.col("STREET_NORM") != ""))
        .select(F.lit(0).alias("__side"), "STREET_NORM")
        .unionAll(
            cad.filter((F.col("HOUSE_NORM") != "") & (F.col("STREET_NORM") != ""))
            .select(F.lit(1).alias("__side"), "STREET_NORM")
        )
    )


def _scoring_dedup_mode(spr: DataFrame, cad: DataFrame, scale: ScaleConfig):
    """Pick the distinct-pair memoization tier from the vocabulary sizes.

    Returns one of:
      ("driver", va, vb) — vocabulary product <= _DRIVER_SCORE_MAX_PAIRS:
        both (bounded) street lists are collected and the score table is
        built in-process (a LocalTableScan broadcast — no distinct
        aggregates or Python-worker stage in the plan);
      ("spark", None, None) — product fits scale.scoring_dedup_max_pairs:
        distinct pairs are built and scored distributedly;
      ("direct", None, None) — vocabulary too large (or estimate
        failed): the kernel runs over the pair set as before.
    One countDistinct action for both sides; the driver tier adds one
    collect bounded by the product bound (so at most
    _DRIVER_SCORE_MAX_PAIRS strings per side, typically far fewer)."""
    bound = scale.scoring_dedup_max_pairs
    if not bound:
        return ("direct", None, None)
    try:
        # ONE bounded action in the common case: pull the distinct
        # side-tagged vocabulary up to a row cap. Under the cap the lists
        # themselves are in hand, so every tier decision is exact with no
        # second job; over the cap (collect returned the cap+ rows but
        # never more — a few MB worst case) fall back to one
        # countDistinct action to choose spark-vs-direct.
        row_cap = 20_000
        vocab = _vocab_union(spr, cad).distinct().limit(row_cap + 1).collect()
        if len(vocab) <= row_cap:
            va = sorted(r["STREET_NORM"] for r in vocab if r["__side"] == 0)
            vb = sorted(r["STREET_NORM"] for r in vocab if r["__side"] == 1)
            prod = len(va) * len(vb)
            if prod > bound:
                return ("direct", None, None)
            if prod > _DRIVER_SCORE_MAX_PAIRS:
                return ("spark", None, None)
            return ("driver", va, vb)
        rows = (
            _vocab_union(spr, cad)
            .groupBy("__side")
            .agg(F.countDistinct("STREET_NORM").alias("n"))
            .collect()
        )
        counts = {int(r["__side"]): int(r["n"]) for r in rows}
        prod = counts.get(0, 0) * counts.get(1, 0)
        if prod > bound:
            return ("direct", None, None)
        return ("spark", None, None)
    except Exception as exc:
        from ..plans.events import record_event

        record_event(
            "scoring", "dedup_estimate_failed",
            f"{type(exc).__name__}; scoring pairs directly",
        )
        return ("direct", None, None)


def _driver_scored_pairs(spark, va: list[str], vb: list[str], scorer: str) -> DataFrame:
    """Score the vocabulary cross in-process with the SAME kernel
    functions the UDFs use (similarity.blend4_scores /
    jaro_winkler_similarity — identical floats by construction) and
    return a local score table. Kernel work is bounded by
    _DRIVER_SCORE_MAX_PAIRS (~0.4 s single-thread worst case); any
    scaling/rounding stays in Spark expressions so both paths share
    them."""
    from ..functions.similarity import blend4_scores, jaro_winkler_similarity

    if scorer == "jw":
        data = [
            (a, b, jaro_winkler_similarity(a, b)) for a in va for b in vb
        ]
        return spark.createDataFrame(
            data, "__street_spr string, __street_cad string, __jw_raw double"
        )
    mask_cache: dict = {}
    data = [(a, b, blend4_scores(a, b, mask_cache)) for a in va for b in vb]
    return spark.createDataFrame(
        data,
        "__street_spr string, __street_cad string, "
        "scores struct<token_sort_ratio:double,token_set_ratio:double,"
        "partial_ratio:double,ratio:double>",
    )


def _distinct_street_pairs(spr: DataFrame, cad: DataFrame) -> DataFrame:
    """Cross of the per-side DISTINCT street vocabularies — a covering
    superset of the street pairs the scoring stage will see. A plain
    cross (not a co-block join) keeps the subtree at two map-side
    distinct aggregates plus one nested-loop join of vocabulary-sized
    inputs; the guard has already bounded |a| x |b|, so the extra
    never-co-blocked pairs cost at most the bound's worth of kernel
    work, spread by the repartition."""
    pa = (
        spr.filter((F.col("HOUSE_NORM") != "") & (F.col("STREET_NORM") != ""))
        .select(F.col("STREET_NORM").alias("__street_spr")).distinct()
    )
    pb = (
        cad.filter((F.col("HOUSE_NORM") != "") & (F.col("STREET_NORM") != ""))
        .select(F.col("STREET_NORM").alias("__street_cad")).distinct()
    )
    return pa.repartition(spr.sparkSession.sparkContext.defaultParallelism).crossJoin(
        F.broadcast(pb)
    )


def _attach_pair_scores(to_score: DataFrame, uniq_scored: DataFrame) -> DataFrame:
    """Broadcast the per-distinct-pair score table back onto the pair
    set. Inner equi-join on the two street columns: every scoring row's
    street pair is present in the co-blocked distinct table by
    construction, and the table is distinct, so the join neither drops
    nor duplicates rows."""
    return to_score.join(
        F.broadcast(uniq_scored),
        (F.col("STREET_NORM_SPR") == F.col("__street_spr"))
        & (F.col("STREET_NORM_CAD") == F.col("__street_cad")),
    ).drop("__street_spr", "__street_cad")


def score_candidates(
    spr: DataFrame,
    cad: DataFrame,
    scale: ScaleConfig | None = None,
    scorer: str = "blend4",
) -> DataFrame:
    """J4 + the scoring half of J5: blocked candidate pairs with the
    per-pair best (score, strategy, rank) attached.

    scorer="blend4" (default, reference-faithful): ONE Arrow pass
    computing all four rapidfuzz-semantics scorers, best-of per pair.
    scorer="jw": single Jaro-Winkler kernel scaled to 0-100 and rounded
    to 4 decimals — same operator graph, but every value (and therefore
    the top-1 choice) is reproducible by an external SQL engine with a
    native jaro_winkler (the driver's DuckDB oracle); the blend4 kernels
    stay oracle-checked in pytest (DuckDB JW / DP-LCS property tests).

    Output is SLIM — (ids, streets, count, best_*) only; fuzzy_matches /
    fuzzy_topk join the report columns back after top-1. At scale the
    candidate-pair set is orders of magnitude larger than the match set,
    so wide columns must not ride the scoring shuffle.

    Shared by fuzzy_matches / fuzzy_topk / the bench scaling job so the
    block join is planned exactly once per caller."""
    scale = scale or ScaleConfig()
    pairs = candidate_pairs(spr, cad, scale, columns=_SLIM_COLS)

    # score distinct pairs once when the vocabulary is small (guide §8:
    # decide on the lightweight proxy, attach back to the heavy rows) —
    # the pair set then never crosses the JVM<->Python boundary
    mode, va, vb = _scoring_dedup_mode(spr, cad, scale)
    use_dedup = mode != "direct"
    if not use_dedup:
        # explicit repartition before the Arrow kernel: AQE sizes partitions
        # by COMPRESSED shuffle bytes, and candidate pairs compress extremely
        # well (repeated block strings) — left alone, the CPU-bound Python
        # stage collapses onto 1-2 partitions and runs serially. A
        # user-specified partition count is exempt from AQE coalescing.
        # Placed BEFORE the CANDIDATES_COUNT window: hash partitioning on
        # ADDRESS_ID_SPR at any partition count satisfies the window's
        # clustering requirement, so the window costs one local sort instead
        # of its own full exchange of the candidate-pair set (guide §2.4).
        # In dedup mode there is no kernel over the pairs to spread, so the
        # explicit exchange is skipped — a caller that needs the window
        # gets one implicit session-width exchange, and a pure aggregate
        # over the scores (the bench's throughput stage) runs with NO
        # exchange of the pair set at all.
        n_part = _scoring_partitions(spr, cad, scale)
        pairs = pairs.repartition(n_part, "ADDRESS_ID_SPR")

    # CANDIDATES_COUNT counts ALL house+building candidates per SPR row,
    # including empty-street ones (advanced_matcher.py:406 uses
    # len(exact_candidates) from :350-355, before the street filter).
    w_cnt = Window.partitionBy("ADDRESS_ID_SPR")
    pairs = pairs.withColumn("CANDIDATES_COUNT", F.count(F.lit(1)).over(w_cnt))

    # scoring set: drop empty streets on both sides (:365-372, :377-378)
    to_score = pairs.filter(
        (F.col("STREET_NORM_SPR") != "") & (F.col("STREET_NORM_CAD") != "")
    )
    if scorer == "jw":
        from ..functions.similarity import jaro_winkler_udf

        def jw_col(a, b):
            return F.round(100.0 * jaro_winkler_udf(a, b), 4)

        if mode == "driver":
            uniq = _driver_scored_pairs(spr.sparkSession, va, vb, "jw").withColumn(
                "best_score", F.round(100.0 * F.col("__jw_raw"), 4)
            ).drop("__jw_raw")
            scored = _attach_pair_scores(to_score, uniq)
        elif mode == "spark":
            uniq = _distinct_street_pairs(spr, cad).withColumn(
                "best_score", jw_col(F.col("__street_spr"), F.col("__street_cad"))
            )
            scored = _attach_pair_scores(to_score, uniq)
        else:
            scored = to_score.withColumn(
                "best_score", jw_col(F.col("STREET_NORM_SPR"), F.col("STREET_NORM_CAD"))
            )
        return (
            scored.withColumn("best_strategy", F.lit("jw"))
            .withColumn("strategy_rank", F.lit(0))
        )
    # (equal-string pairs short-circuit INSIDE the kernel — a JVM-side
    # filter+union split would recompute the block join once per branch)
    if mode == "driver":
        uniq = _driver_scored_pairs(spr.sparkSession, va, vb, "blend4")
        scored = _attach_pair_scores(to_score, uniq)
    elif mode == "spark":
        uniq = _distinct_street_pairs(spr, cad).withColumn(
            "scores", fuzzy_scores(F.col("__street_spr"), F.col("__street_cad"))
        )
        scored = _attach_pair_scores(to_score, uniq)
    else:
        scored = to_score.withColumn(
            "scores", fuzzy_scores(F.col("STREET_NORM_SPR"), F.col("STREET_NORM_CAD"))
        )

    best_score, best_strategy, strategy_rank = best_of_strategies("scores")
    return (
        scored.withColumn("best_score", best_score)
        .withColumn("best_strategy", best_strategy)
        .withColumn("strategy_rank", strategy_rank)
    )


def fuzzy_matches(
    spr: DataFrame,
    cad: DataFrame,
    cfg: MatchConfig | None = None,
    scale: ScaleConfig | None = None,
    scorer: str = "blend4",
) -> DataFrame:
    """J4+J5 end-to-end: candidates -> batched scores -> top-1 -> threshold."""
    cfg = cfg or MatchConfig()
    scored = score_candidates(spr, cad, scale, scorer=scorer)

    # deterministic top-1 per SPR row: the reference's strict-`>` strategy
    # precedence + first-candidate tie-break, encoded as an explicit order
    w_top = Window.partitionBy("ADDRESS_ID_SPR").orderBy(
        F.col("best_score").desc(),
        F.col("strategy_rank").asc(),
        F.col("ADDRESS_ID_CAD").asc(),
    )
    top1 = (
        scored.withColumn("__rn", F.row_number().over(w_top))
        .filter(F.col("__rn") == 1)
        .filter(F.col("best_score") >= F.lit(cfg.fuzzy_threshold))
    )
    top1 = _attach_side_attrs(top1, spr, cad)

    rec = as_match_records(
        top1,
        F.col("best_score"),
        F.concat(F.lit("FUZZY_STREET_"), F.upper(F.col("best_strategy"))),
        F.col("CANDIDATES_COUNT"),
    )
    return rec


def fuzzy_topk(
    spr: DataFrame,
    cad: DataFrame,
    k: int = 100,
    cfg: MatchConfig | None = None,
    scale: ScaleConfig | None = None,
    scorer: str = "blend4",
) -> DataFrame:
    """T3 variant (engine.py:204-206): per-probe top-k candidates above
    threshold, deterministic order."""
    cfg = cfg or MatchConfig()
    scored = score_candidates(spr, cad, scale, scorer=scorer).filter(
        F.col("best_score") >= F.lit(cfg.fuzzy_threshold)
    )
    w_top = Window.partitionBy("ADDRESS_ID_SPR").orderBy(
        F.col("best_score").desc(),
        F.col("strategy_rank").asc(),
        F.col("ADDRESS_ID_CAD").asc(),
    )
    topk = (
        scored.withColumn("__rn", F.row_number().over(w_top))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    topk = _attach_side_attrs(topk, spr, cad)
    return as_match_records(
        topk,
        F.col("best_score"),
        F.concat(F.lit("FUZZY_STREET_"), F.upper(F.col("best_strategy"))),
        F.col("CANDIDATES_COUNT"),
    )
