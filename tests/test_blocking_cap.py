"""Quadratic-block guard (VERDICT r3 #4): cap_block semantics, default-on
wiring into the v3 multi-block and repos band paths, truncation lineage."""

import pandas as pd
from pyspark.sql import functions as F

from registry_address_matcher_spark.config import ScaleConfig
from registry_address_matcher_spark.operators.blocking import cap_block


def _pairs(spark):
    rows = [("hot", f"p{i:03d}", f"b{j:03d}") for i in range(20) for j in range(10)]
    rows += [("cold", f"p{i}", f"b{i}") for i in range(5)]
    return spark.createDataFrame(rows, "bk string, id_l string, id_r string")


def test_cap_block_truncates_deterministically(spark):
    pairs = _pairs(spark)
    kept, report = cap_block(pairs, ["bk"], "id_l", "id_r", 50, salt_buckets=8)
    k = kept.toPandas()
    # hot block (200 pairs) capped at <= 50, cold block (5 pairs) untouched
    assert len(k[k.bk == "hot"]) <= 50
    assert len(k[k.bk == "cold"]) == 5
    r = report.toPandas()
    assert set(r.bk) == {"hot"}
    row = r.iloc[0]
    assert row.total_pairs == 200
    assert row.kept_pairs == len(k[k.bk == "hot"])
    assert row.dropped_pairs == 200 - row.kept_pairs
    # deterministic: identical kept set on a rerun
    k2 = cap_block(pairs, ["bk"], "id_l", "id_r", 50, salt_buckets=8)[0].toPandas()
    key = ["bk", "id_l", "id_r"]
    assert k.sort_values(key).reset_index(drop=True).equals(
        k2.sort_values(key).reset_index(drop=True)
    )


def test_cap_block_window_is_salted_not_per_block(spark):
    """The guard must not itself create the single-task mega-block it
    exists to prevent: the ranking window partitions by (block, salt)."""
    pairs = _pairs(spark)
    kept, _ = cap_block(pairs, ["bk"], "id_l", "id_r", 50, salt_buckets=8)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "__cap_salt" in plan.split("Window")[1].split("\n")[0], plan


def test_cap_noop_below_threshold(spark):
    pairs = _pairs(spark)
    kept, report = cap_block(pairs, ["bk"], "id_l", "id_r", 10**6)
    assert kept.count() == pairs.count()
    assert report.count() == 0


def test_repos_band_path_cap_and_lineage(spark):
    from registry_address_matcher_spark.plans.lineage import truncation_lineage
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        candidate_block_pairs,
        normalize_repos,
    )
    from registry_address_matcher_spark.synth import make_repos

    repos, _ = make_repos(spark, n_base=60, dups_per_base=2, seed=7)
    norm = normalize_repos(repos).persist()
    cfg = ReposMatchConfig(phonetic_blocking=False)

    # default config: cap present but not hit at this scale
    reports: list = []
    pairs_default = candidate_block_pairs(
        norm, cfg, ScaleConfig(), truncation_reports=reports
    ).toPandas()
    assert len(reports) == 1 and reports[0].count() == 0

    # tiny cap: triggers, fewer pairs, lineage rows appear
    reports2: list = []
    tiny = ScaleConfig(max_pairs_per_block=1, salt_buckets=4)
    pairs_tiny = candidate_block_pairs(
        norm, cfg, tiny, truncation_reports=reports2
    ).toPandas()
    assert len(pairs_tiny) < len(pairs_default)
    rep = reports2[0]
    assert rep.count() > 0
    lin = truncation_lineage(rep, "run-x", "blocking").toPandas()
    assert len(lin) == rep.count()
    assert set(lin.stage) == {"blocking:truncated"}
    assert (lin.candidate_pair_count > 0).all()


def test_v3_multiblock_cap_and_default_equivalence(spark):
    from registry_address_matcher_spark.operators.engine_v3 import (
        multi_block_candidates,
    )
    from registry_address_matcher_spark.operators.preprocess import (
        preprocess_registry,
    )

    def reg(rows):
        return preprocess_registry(
            spark.createDataFrame(
                pd.DataFrame(
                    rows, columns=["ADDRESS_ID", "STREET_NAME", "HOUSE", "BUILDING"]
                )
            )
        )

    spr = reg([(f"S{i}", "ABOVYAN ST", str(i % 3 + 1), "") for i in range(12)])
    cad = reg([(f"C{i}", "ABOVYAN STR", str(i % 3 + 1), "") for i in range(12)])

    capped_off = multi_block_candidates(
        spr, cad, ScaleConfig(max_pairs_per_block=None)
    ).toPandas()
    default = multi_block_candidates(spr, cad, ScaleConfig()).toPandas()
    key = ["id_s", "id_c"]
    assert capped_off[key].sort_values(key).reset_index(drop=True).equals(
        default[key].sort_values(key).reset_index(drop=True)
    )

    reports: list = []
    tiny = multi_block_candidates(
        spr, cad, ScaleConfig(max_pairs_per_block=2, salt_buckets=2),
        truncation_reports=reports,
    ).toPandas()
    assert len(tiny) < len(default)
    assert len(reports) == 4  # one per block family
    rep = reports[0].toPandas()
    assert "block_family" in rep.columns
    total_dropped = sum(r.toPandas().dropped_pairs.sum() for r in reports)
    assert total_dropped > 0


def test_salted_join_duplicate_probe_payload_spreads_salt(spark):
    """VERDICT r4 #7: the probe salt must hash the caller-named id
    column, not the whole row — within a hot block every probe row
    shares the key columns, so a payload-duplicate-heavy probe (here 400
    rows with identical text but distinct ids) would collapse onto ONE
    salt bucket and re-create the hot partition. With probe_salt_cols
    the output is correct AND the salt distribution over the ids is
    near-uniform."""
    from registry_address_matcher_spark.operators.blocking import salted_join

    n = 400
    probe = spark.createDataFrame(
        [("k", f"p{i:03d}", "duplicate payload") for i in range(n)],
        "bk string, pid string, payload string",
    )
    build = spark.createDataFrame(
        [("k", f"b{i:02d}") for i in range(20)], "bk string, bid string"
    )
    scale = ScaleConfig(hot_block_threshold=5, salt_buckets=8)

    out = salted_join(probe, build, ["bk"], scale, probe_salt_cols=["pid"])
    assert out.count() == n * 20  # salting never changes join semantics

    # measure the salt spread exactly as salted_join derives it
    salts = (
        probe.select(
            F.pmod(F.xxhash64(F.col("pid")), F.lit(scale.salt_buckets)).alias("s")
        )
        .groupBy("s")
        .count()
        .toPandas()
    )
    assert len(salts) == scale.salt_buckets
    assert salts["count"].max() <= 2 * n / scale.salt_buckets

    # the old whole-row hash on (bk, payload)-only columns is the
    # documented hazard: identical payloads -> one bucket
    collapsed = (
        probe.select(
            F.pmod(F.xxhash64("bk", "payload"), F.lit(scale.salt_buckets)).alias("s")
        )
        .distinct()
        .count()
    )
    assert collapsed == 1


def test_salted_join_pair_set_equals_plain_join(spark):
    """Salting is a physical rewrite only: over a mix of hot keys (above
    threshold, salted), cold keys (salt 0), probe-only and build-only
    keys, the salted join's PAIR SET — not just its count — must equal a
    plain inner join's. Count equality alone could mask a swapped or
    duplicated pair (e.g. a build row exploded across salts matching a
    probe row twice, offset by a dropped cold pair)."""
    from registry_address_matcher_spark.operators.blocking import salted_join

    probe_rows = (
        [("hot1", f"p{i:02d}") for i in range(30)]
        + [("hot2", f"q{i:02d}") for i in range(12)]
        + [("cold", f"c{i}") for i in range(3)]
        + [("probe_only", "x0")]
    )
    build_rows = (
        [("hot1", f"B{i:02d}") for i in range(25)]
        + [("hot2", f"D{i:02d}") for i in range(9)]
        + [("cold", f"E{i}") for i in range(2)]
        + [("build_only", "Z0")]
    )
    probe = spark.createDataFrame(probe_rows, "bk string, pid string")
    build = spark.createDataFrame(build_rows, "bk string, bid string")
    scale = ScaleConfig(hot_block_threshold=5, salt_buckets=4)

    got = (
        salted_join(probe, build, ["bk"], scale, probe_salt_cols=["pid"])
        .select("bk", "pid", "bid")
        .toPandas()
    )
    want = probe.join(build, "bk").select("bk", "pid", "bid").toPandas()

    key = ["bk", "pid", "bid"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(got_s.drop_duplicates())  # no pair duplicated
    assert got_s.equals(want_s)


def test_cap_block_quota_smaller_than_salt_buckets(spark):
    """The salt count is clamped to min(salt_buckets, max_pairs): with
    max_pairs below the bucket count a naive per-salt quota of
    max_pairs // S == 0 would keep nothing (or the +1 remainder spread
    would keep up to S pairs, over the cap). The guard contract at tight
    quotas: per block the kept count is ALWAYS in [1, max_pairs] — never
    zero, never over — it may fall short of max_pairs when salt buckets
    run dry (kept = sum(min(bucket_rows, quota)); a small block can even
    be trimmed below the cap — documented guard semantics, not an exact
    quota), the truncation report accounts for every dropped pair, and
    the kept set is deterministic across invocations."""
    pairs = _pairs(spark)  # hot block: 200 pairs, cold block: 5 pairs
    for max_pairs in (1, 3, 7):
        kept, report = cap_block(
            pairs, ["bk"], "id_l", "id_r", max_pairs, salt_buckets=8
        )
        per_block = kept.groupBy("bk").count().toPandas().set_index("bk")["count"]
        assert 1 <= per_block["hot"] <= max_pairs
        assert 1 <= per_block["cold"] <= min(5, max_pairs)
        rep = report.toPandas().set_index("bk")
        assert rep.loc["hot", "dropped_pairs"] == 200 - per_block["hot"]
        if per_block["cold"] < 5:
            assert rep.loc["cold", "dropped_pairs"] == 5 - per_block["cold"]
        # deterministic across invocations
        again = (
            cap_block(pairs, ["bk"], "id_l", "id_r", max_pairs, salt_buckets=8)[0]
            .toPandas()
            .sort_values(["bk", "id_l", "id_r"])
            .reset_index(drop=True)
        )
        k = kept.toPandas().sort_values(["bk", "id_l", "id_r"]).reset_index(drop=True)
        assert k.equals(again)
