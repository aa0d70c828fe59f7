#!/usr/bin/env python
"""spark-submit entry for the north-rule repos match pipeline.

Usage (cluster)::

    spark-submit --py-files registry_address_matcher_spark.zip \
        jobs/match_job.py --input parquet:/data/repos --run-dir /runs/r1 \
        [--resume] [--threshold 0.7]

Local smoke::

    python jobs/match_job.py --synth 200 --run-dir /tmp/run1

Stages (each checkpointed; --resume skips completed ones):
  1. normalize   — derive match columns + sha256 invariant
  2. exact       — identical-normalized-content star edges
  3. blocking    — (lang, MinHash band) candidate pairs, skew-salted
  4. scoring     — shingle-Jaccard + path-stem Jaro-Winkler, threshold
  5. clustering  — large-star/small-star connected components
Sidecars: lineage (per-block pair counts + score histograms), metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="source spec, e.g. parquet:/data/repos")
    ap.add_argument("--synth", type=int, default=0, help="use N synthetic base files")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--resume", action="store_true", help="skip completed stages")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from registry_address_matcher_spark.config import ScaleConfig
    from registry_address_matcher_spark.plans.lineage import block_lineage
    from registry_address_matcher_spark.plans.quality import to_metrics_rows
    from registry_address_matcher_spark.plans.resume import run_stage
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        accepted_pairs,
        assert_unique_file_ids,
        candidate_block_pairs,
        cluster_pairs,
        exact_content_pairs,
        normalize_repos,
        score_pairs,
        verify_sha_invariant,
    )
    from registry_address_matcher_spark.session import get_spark
    from registry_address_matcher_spark.sources.io import SnapshotCatalog, read_registry

    spark = get_spark("repos-match-job", master=args.master)
    cfg = ReposMatchConfig(threshold=args.threshold)
    scale = ScaleConfig()
    run_dir = args.run_dir
    force = not args.resume

    if args.synth:
        from registry_address_matcher_spark.synth import make_repos

        repos, _labels = make_repos(spark, n_base=args.synth)
    else:
        if not args.input:
            ap.error("--input or --synth required")
        repos = read_registry(spark, args.input)

    t_start = time.time()
    stage_times: dict[str, float] = {}

    def timed(stage, builder):
        t0 = time.time()
        out = run_stage(spark, run_dir, stage, builder, force=force)
        stage_times[stage] = round(time.time() - t0, 3)
        return out

    norm = timed("normalize", lambda: normalize_repos(repos))
    n_files = assert_unique_file_ids(norm)  # (repo, path, commit) must be a key
    exact = timed("exact", lambda: exact_content_pairs(norm))
    trunc_reports: list = []
    side_out: list = []
    cand = timed(
        "blocking",
        lambda: candidate_block_pairs(
            norm, cfg, scale, n_docs=n_files,
            truncation_reports=trunc_reports, side_out=side_out,
        ),
    )
    # the blocking stage is snapshot-materialized by run_stage, so this
    # count reads the checkpoint — it sizes the scoring partitions at a
    # constant pairs-per-partition across cluster sizes
    n_cand = cand.count()
    # side_out is only populated when the blocking builder actually ran
    # (a --resume run snapshots past it); empty -> score_pairs builds its
    # own shingle side table
    scored = timed(
        "scoring",
        lambda: score_pairs(
            cand, norm, cfg, n_pairs=n_cand,
            side=side_out[0] if side_out else None,
        ),
    )
    accepted = timed("accepted", lambda: accepted_pairs(scored, cfg))
    all_pairs = accepted.unionByName(
        exact.select("id_l", "id_r", F.col("score"), "match_type")
    ).dropDuplicates(["id_l", "id_r"])
    clusters = timed("clustering", lambda: cluster_pairs(all_pairs, norm, scale))

    # sidecars
    catalog = SnapshotCatalog(spark, run_dir)
    run_id = os.path.basename(run_dir.rstrip("/"))
    lineage = block_lineage(scored, ["lang"], "score", run_id, "scoring")
    catalog.append_snapshot(lineage, "lineage")
    # capped blocks (quadratic-block guard) are never silent: each report
    # lands in the same lineage sidecar with stage "blocking:truncated"
    from registry_address_matcher_spark.plans.lineage import truncation_lineage

    for rep in trunc_reports:
        catalog.append_snapshot(truncation_lineage(rep, run_id, "blocking"), "lineage")
    counts = {
        "files": norm.count(),
        "exact_pairs": exact.count(),
        "candidate_pairs": scored.count(),
        "accepted_pairs": accepted.count(),
        "clusters": clusters.select("component").distinct().count(),
    }
    metrics = to_metrics_rows(
        spark.createDataFrame([counts]), run_id, "run"
    )
    catalog.append_snapshot(metrics, "metrics")
    # degraded-path runtime events (estimate fallbacks etc.) — never silent
    from registry_address_matcher_spark.plans.events import drain_events_df

    ev = drain_events_df(spark, run_id)
    if ev is not None:
        catalog.append_snapshot(ev, "metrics")

    ok = verify_sha_invariant(repos, clusters)
    summary = {
        "run_dir": run_dir,
        # the EFFECTIVE master — under spark-submit this is the submit
        # conf's (get_spark defers to it), proof the job runs where the
        # operator pointed it
        "master": spark.sparkContext.master,
        "stages": stage_times,
        "counts": counts,
        "sha_invariant_ok": ok,
        "total_sec": round(time.time() - t_start, 3),
    }
    print(json.dumps(summary))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
