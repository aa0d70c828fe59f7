"""North-rule repos pipeline: F1 on labeled pairs, sha invariant, resume."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def repos_fixture(spark):
    from registry_address_matcher_spark.synth import make_repos

    return make_repos(spark, n_base=120, dups_per_base=2, seed=42)


def _run_pipeline(spark, repos):
    from registry_address_matcher_spark.config import ScaleConfig
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        accepted_pairs,
        candidate_block_pairs,
        cluster_pairs,
        exact_content_pairs,
        normalize_repos,
        score_pairs,
    )

    cfg = ReposMatchConfig()
    norm = normalize_repos(repos).persist()
    exact = exact_content_pairs(norm)
    cand = candidate_block_pairs(norm, cfg, ScaleConfig(hot_block_threshold=50, salt_buckets=4))
    scored = score_pairs(cand, norm, cfg)
    acc = accepted_pairs(scored, cfg)
    pairs = acc.unionByName(
        exact.select("id_l", "id_r", "score", "match_type")
    ).dropDuplicates(["id_l", "id_r"])
    clusters = cluster_pairs(pairs, norm)
    return norm, pairs, clusters


def test_repos_pairwise_f1(spark, repos_fixture):
    repos, labels = repos_fixture
    norm, pairs, clusters = _run_pipeline(spark, repos)

    # transitive closure of predictions: two files match iff same component
    comp = clusters.select("file_id", "component")
    lab = labels.toPandas()
    cp = comp.toPandas().set_index("file_id")["component"]
    tp = fn = fp = 0
    for _, row in lab.iterrows():
        same = cp.get(row.left_id) == cp.get(row.right_id)
        if row.is_match and same:
            tp += 1
        elif row.is_match:
            fn += 1
        elif same:
            fp += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"repos F1={f1:.4f} (P={precision:.4f} R={recall:.4f} tp={tp} fn={fn} fp={fp})"


def test_sha_invariant(spark, repos_fixture):
    from registry_address_matcher_spark.repos_pipeline import verify_sha_invariant

    repos, _ = repos_fixture
    _, _, clusters = _run_pipeline(spark, repos)
    assert verify_sha_invariant(repos, clusters)


def test_job_cli_with_resume(spark, tmp_path):
    """Run the CLI twice on the same run dir: second run must reuse every
    stage snapshot (resume), produce identical clusters, and pass the
    invariant."""
    import jobs.match_job as job

    run_dir = str(tmp_path / "run1")
    rc = job.main(["--synth", "60", "--run-dir", run_dir, "--resume"])
    assert rc == 0
    manifest = json.load(open(os.path.join(run_dir, "run.json")))
    assert set(manifest["stages"]) >= {"normalize", "exact", "blocking", "scoring", "accepted", "clustering"}
    snaps_before = {
        s: manifest["stages"][s]["snapshot"] for s in manifest["stages"]
    }

    rc2 = job.main(["--synth", "60", "--run-dir", run_dir, "--resume"])
    assert rc2 == 0
    manifest2 = json.load(open(os.path.join(run_dir, "run.json")))
    snaps_after = {
        s: manifest2["stages"][s]["snapshot"] for s in manifest2["stages"]
    }
    # resume: no stage recomputed -> same snapshot ids
    assert snaps_before == snaps_after


def test_stage_resume_skips_builder(spark, tmp_path):
    from registry_address_matcher_spark.plans.resume import run_stage

    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return spark.range(5).withColumnRenamed("id", "x")

    d = str(tmp_path / "r")
    a = run_stage(spark, d, "s1", builder)
    assert calls["n"] == 1 and a.count() == 5
    b = run_stage(spark, d, "s1", builder)
    assert calls["n"] == 1  # not re-invoked
    assert b.count() == 5
    c = run_stage(spark, d, "s1", builder, force=True)
    assert calls["n"] == 2 and c.count() == 5


def test_file_id_null_components_do_not_collide(spark):
    """concat_ws drops NULLs: without the sentinel, ('a', NULL, 'b') and
    ('a', 'b', NULL) hash to the same surrogate file_id."""
    from registry_address_matcher_spark.repos_pipeline import file_id_col

    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None), ("a", "b", "")],
        "repo string, path string, commit string",
    )
    ids = [r[0] for r in df.select(file_id_col().alias("fid")).collect()]
    assert len(set(ids)) == 3


def test_exact_content_pairs_skew_safe(spark):
    """VERDICT r3 #2: the group representative must come from
    groupBy(h).agg(min) + join-back, not a per-group window — one
    ubiquitous content group (here 50% of rows: think empty files or
    license boilerplate) must not collapse onto a single window task.
    Asserts the plan partial-aggregates with no Window node, and that the
    star edges are exactly (group-min -> every other member)."""
    from registry_address_matcher_spark.repos_pipeline import (
        exact_content_pairs,
        normalize_repos,
    )

    rows = [(f"r{i}", f"a/b{i}.py", f"c{i}", "py", "same content") for i in range(50)]
    rows += [(f"r{i}", f"x/y{i}.py", f"d{i}", "py", f"unique {i}") for i in range(50)]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    norm = normalize_repos(repos)
    pairs = exact_content_pairs(norm)

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "HashAggregate" in plan, plan

    got = pairs.toPandas()
    ids = sorted(
        r.file_id for r in norm.filter(norm.content == "same content")
        .select("file_id").collect()
    )
    assert len(got) == 49
    assert set(got.id_l) == {ids[0]}
    assert sorted(got.id_r) == ids[1:]
    assert set(got.match_type) == {"EXACT_CONTENT"}


def test_pairwise_f1_matches_driver_loop(spark, repos_fixture):
    """The distributed F1 (used by the bench-scale gate) must agree with
    the reference driver-side loop on identical clusters/labels."""
    from registry_address_matcher_spark.repos_pipeline import pairwise_f1

    repos, labels = repos_fixture
    _, _, clusters = _run_pipeline(spark, repos)

    got = pairwise_f1(clusters, labels)

    cp = clusters.select("file_id", "component").toPandas().set_index("file_id")["component"]
    tp = fn = fp = 0
    for _, row in labels.toPandas().iterrows():
        same = cp.get(row.left_id) == cp.get(row.right_id)
        if row.is_match and same:
            tp += 1
        elif row.is_match:
            fn += 1
        elif same:
            fp += 1
    assert (got["tp"], got["fn"], got["fp"]) == (tp, fn, fp)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert abs(got["f1"] - f1) < 1e-9


def test_score_pairs_matches_native_kernels(spark):
    """ADVICE r4: pin the mapInPandas scoring kernel against the native
    jaccard_col + jaro_winkler_udf pair it replaced, including the
    deliberate NULL-semantics difference: NULL ≡ empty shingle set, so two
    no-shingle files score jaccard 1.0 and no-shingles-vs-some 0.0 (the old
    native column let a one-sided NULL fall through to 1.0 — a file with
    no content must not fuzzy-match one that has some)."""
    from registry_address_matcher_spark.operators.dedup import jaccard_col
    from registry_address_matcher_spark.functions.similarity import jaro_winkler_udf
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        normalize_repos,
        score_pairs,
        shingle_side,
    )

    cfg = ReposMatchConfig()
    rows = [
        ("r1", "a/handler.py", "c1", "py", "def handle(request): return dispatch(request, ROUTES)"),
        ("r2", "b/handlers.py", "c2", "py", "def handle(request): return dispatch(request, ROUTES)  # fork"),
        ("r3", "c/unrelated.py", "c3", "py", "class Widget:\n    pass"),
        ("r4", "d/tiny.py", "c4", "py", "x=1"),  # shorter than shingle_n -> empty set
        ("r5", "e/tiny2.py", "c5", "py", "y=2"),  # empty set too
    ]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    norm = normalize_repos(repos)
    side = shingle_side(norm, cfg)
    ids = {r.path_stem: r.file_id for r in norm.select("file_id", "path_stem").collect()}
    pair_rows = [
        (ids["handler"], ids["handlers"]),
        (ids["handler"], ids["unrelated"]),
        (ids["handler"], ids["tiny"]),   # one-side-empty -> jaccard 0.0
        (ids["tiny"], ids["tiny2"]),      # both-empty -> jaccard 1.0
    ]
    pairs = spark.createDataFrame(
        [("py", a, b) for a, b in pair_rows], "lang string, id_l string, id_r string"
    )

    got = {
        (r.id_l, r.id_r): r
        for r in score_pairs(pairs, norm, cfg, checkpoint_side=False).collect()
    }
    native = (
        pairs.join(side.select(F.col("file_id").alias("id_l"),
                               F.col("path_stem").alias("stem_l"),
                               F.col("sh").alias("sh_l")), "id_l")
        .join(side.select(F.col("file_id").alias("id_r"),
                          F.col("path_stem").alias("stem_r"),
                          F.col("sh").alias("sh_r")), "id_r")
        .select(
            "id_l", "id_r",
            jaccard_col(F.col("sh_l"), F.col("sh_r")).alias("jac"),
            jaro_winkler_udf(F.col("stem_l"), F.col("stem_r")).alias("jw"),
        )
    )
    for r in native.collect():
        g = got[(r.id_l, r.id_r)]
        assert abs(g.jaccard - r.jac) < 1e-12, (r.id_l, r.id_r, g.jaccard, r.jac)
        assert abs(g.jw - r.jw) < 1e-12

    # NULL shingle sets: only reachable via a caller-supplied side table
    # (shingle_side maps NULL content to an EMPTY array) — pin the
    # kernel's semantics directly
    null_side = side.withColumn(
        "sh",
        F.when(F.col("path_stem").isin("handler", "tiny"), F.lit(None)).otherwise(
            F.col("sh")
        ),
    )
    got_null = {
        (r.id_l, r.id_r): r
        for r in score_pairs(
            pairs, norm, cfg, checkpoint_side=False, side=null_side
        ).collect()
    }
    assert got_null[(ids["handler"], ids["handlers"])].jaccard == 0.0  # NULL vs non-empty
    assert got_null[(ids["handler"], ids["tiny"])].jaccard == 1.0  # both NULL
    assert got_null[(ids["tiny"], ids["tiny2"])].jaccard == 1.0  # NULL ≡ empty


def test_pairwise_f1_counts_null_components(spark):
    """ADVICE r4: a labeled pair whose right side is missing from the
    clustering must land in exactly one bucket (fn for a true pair), not
    silently drop out of the aggregate — and two missing files are NOT
    'the same cluster' (the pandas None == None trap)."""
    from registry_address_matcher_spark.repos_pipeline import pairwise_f1

    clusters = spark.createDataFrame(
        [("a", "A", "s"), ("b", "A", "s"), ("c", "C", "s")],
        "file_id string, component string, content_sha string",
    )
    labels = spark.createDataFrame(
        [
            ("a", "b", True),   # tp
            ("a", "c", True),   # fn (different components)
            ("a", "zz", True),  # fn (right side unclustered)
            ("zz", "ww", True), # fn (both unclustered -> NOT same)
            ("a", "c", False),  # true negative, no bucket
            ("b", "zz", False), # true negative (null side, same=False)
        ],
        "left_id string, right_id string, is_match boolean",
    )
    got = pairwise_f1(clusters, labels)
    assert (got["tp"], got["fn"], got["fp"]) == (1, 3, 0)
    assert got["precision"] == 1.0
    assert abs(got["recall"] - 0.25) < 1e-9


def test_candidate_block_pairs_side_out_matches_shingle_side(spark):
    """r5 side reuse: the hashed shingle sets carried through the
    blocking checkpoint must be value-identical (as sets) to what
    shingle_side builds independently — in md5 mode both are
    cross_hash60 % p, which is what keeps the DuckDB repos oracle exact
    after the scoring stage switched to the carried side table."""
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        candidate_block_pairs,
        normalize_repos,
        shingle_side,
    )
    from registry_address_matcher_spark.synth import make_repos

    repos, _ = make_repos(spark, n_base=40, seed=3)
    cfg = ReposMatchConfig(hash_mode="md5", phonetic_kind="skeleton")
    norm = normalize_repos(repos)
    side_out: list = []
    pairs = candidate_block_pairs(norm, cfg, side_out=side_out)
    assert pairs.count() > 0
    assert len(side_out) == 1

    def as_map(df):
        rows = df.select(
            "file_id", "path_stem", F.array_sort("sh").alias("sh")
        ).collect()
        return {r.file_id: (r.path_stem, list(r.sh)) for r in rows}

    got = as_map(side_out[0])
    want = as_map(shingle_side(norm, cfg))
    assert got == want


def test_score_pairs_side_distinct_false_normalizes_duplicate_hashes(spark):
    """Kernel contract (round-5 review): the duplicate-count jaccard
    requires duplicate-free ``sh`` arrays — a side of unknown provenance
    with repeated hashes over-counts the sorted-concat intersection. Pin
    that ``side_distinct=False`` normalizes such a side to the exact
    scores of the clean one."""
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        normalize_repos,
        score_pairs,
        shingle_side,
    )

    cfg = ReposMatchConfig()
    rows = [
        ("r1", "a/handler.py", "c1", "py", "def handle(request): return dispatch(request, ROUTES)"),
        ("r2", "b/handlers.py", "c2", "py", "def handle(request): return dispatch(request, ROUTES)  # fork"),
        ("r3", "c/unrelated.py", "c3", "py", "class Widget:\n    pass"),
    ]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    norm = normalize_repos(repos)
    side = shingle_side(norm, cfg)
    ids = {r.path_stem: r.file_id for r in norm.select("file_id", "path_stem").collect()}
    pairs = spark.createDataFrame(
        [("py", ids["handler"], ids["handlers"]), ("py", ids["handler"], ids["unrelated"])],
        "lang string, id_l string, id_r string",
    )
    # every hash appears twice — violates the contract by construction
    dup_side = side.withColumn("sh", F.concat(F.col("sh"), F.col("sh")))

    clean = {
        (r.id_l, r.id_r): r.jaccard
        for r in score_pairs(pairs, norm, cfg, checkpoint_side=False, side=side).collect()
    }
    normalized = {
        (r.id_l, r.id_r): r.jaccard
        for r in score_pairs(
            pairs, norm, cfg, checkpoint_side=False, side=dup_side, side_distinct=False
        ).collect()
    }
    assert normalized == clean
    assert clean[(ids["handler"], ids["handlers"])] > 0.5  # non-trivial overlap


def test_candidate_block_pairs_cache_out_returns_unpersistable_handles(spark):
    """Round-5 review: the blocking stage persists internal derivative
    frames for the life of the session unless the caller releases them;
    ``cache_out`` hands the persisted frames back so a long-lived session
    can unpersist after its action completes."""
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        candidate_block_pairs,
        normalize_repos,
    )
    from registry_address_matcher_spark.synth import make_repos

    repos, _ = make_repos(spark, n_base=40, seed=5)
    cfg = ReposMatchConfig()
    norm = normalize_repos(repos)
    handles: list = []
    pairs = candidate_block_pairs(norm, cfg, cache_out=handles)
    assert pairs.count() >= 0  # materialize while the caches are live
    assert len(handles) == (2 if cfg.phonetic_blocking else 1)
    assert all(h.is_cached for h in handles)
    for h in handles:
        h.unpersist(True)
    assert not any(h.is_cached for h in handles)


def test_no_content_files_cluster_together_not_with_content(spark):
    """NULL and empty content both reduce to the empty shingle set (the
    fused MinHash kernel emits the same empty-set signature for either),
    so all no-content files co-band and fuzzy-score jaccard 1.0 against
    each other — the empty-__init__.py corpus case — while
    no-content-vs-some scores 0.0 and cannot cross the threshold. The
    exact path differs by design: "" has a valid content sha (empty
    files ARE exact duplicates) but sha2(NULL) is NULL and a NULL join
    key never matches, so NULL-content files reach the cluster only via
    fuzzy. End result pinned here: one component holding exactly the
    no-content files, disjoint from every content-bearing file."""
    from registry_address_matcher_spark.repos_pipeline import (
        exact_content_pairs,
        normalize_repos,
    )
    from registry_address_matcher_spark.synth import make_repos

    repos, _ = make_repos(spark, n_base=30, dups_per_base=1, seed=9)
    extra = spark.createDataFrame(
        [
            ("r_e1", "a/empty_one.py", "c1", "py", ""),
            ("r_e2", "b/empty_two.py", "c2", "py", ""),
            ("r_n1", "c/null_one.py", "c3", "py", None),
            ("r_n2", "d/null_two.py", "c4", "py", None),
        ],
        repos.select("repo", "path", "commit", "lang", "content").schema,
    )
    repos_all = repos.select(*extra.columns).unionByName(extra)
    norm, pairs, clusters = _run_pipeline(spark, repos_all)

    nc_ids = set(
        norm.filter(F.col("repo").isin("r_e1", "r_e2", "r_n1", "r_n2"))
        .select("file_id")
        .toPandas()["file_id"]
    )
    assert len(nc_ids) == 4

    comp = clusters.toPandas().set_index("file_id")["component"]
    nc_comps = {comp[i] for i in nc_ids}
    assert len(nc_comps) == 1  # all four no-content files in ONE cluster
    content_comps = {c for i, c in comp.items() if i not in nc_ids}
    assert nc_comps.isdisjoint(content_comps)

    # exact path: the two ""-content files pair (valid sha over ""), the
    # NULL-content files are absent (NULL key joins nothing)
    ex = exact_content_pairs(normalize_repos(repos_all)).toPandas()
    ex_ids = set(ex.id_l) | set(ex.id_r)
    e_ids = {i for i in nc_ids} & ex_ids
    null_ids = set(
        norm.filter(F.col("repo").isin("r_n1", "r_n2"))
        .select("file_id")
        .toPandas()["file_id"]
    )
    assert null_ids.isdisjoint(ex_ids)
    assert len(e_ids) == 2


def test_config_validation_fails_fast():
    """Bad knobs must name themselves at construction, not surface as an
    ANSI pmod error deep in a job (ScaleConfig) or silently weaken the
    LSH by dropping trailing permutations (non-dividing bands)."""
    from registry_address_matcher_spark.config import ScaleConfig
    from registry_address_matcher_spark.repos_pipeline import ReposMatchConfig

    with pytest.raises(ValueError, match="salt_buckets"):
        ScaleConfig(salt_buckets=0)
    with pytest.raises(ValueError, match="max_pairs_per_block"):
        ScaleConfig(max_pairs_per_block=0)
    ScaleConfig(max_pairs_per_block=None)  # explicit off stays legal
    with pytest.raises(ValueError, match="must divide"):
        ReposMatchConfig(num_perm=64, bands=15)
    # < 1 values name the REAL defect, not the divisibility rule (1
    # divides 0, so num_perm=0 used to raise the misleading "must
    # divide" message)
    with pytest.raises(ValueError, match="must\\s+both be >= 1"):
        ReposMatchConfig(num_perm=0, bands=1)
    with pytest.raises(ValueError, match="must\\s+both be >= 1"):
        ReposMatchConfig(num_perm=64, bands=0)
    with pytest.raises(ValueError, match="hash_mode"):
        ReposMatchConfig(hash_mode="sha1")
    with pytest.raises(ValueError, match="phonetic_kind"):
        ReposMatchConfig(phonetic_kind="soundex")
