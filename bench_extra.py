#!/usr/bin/env python
"""Round-6 optimization harness (guide §1) — separate from the frozen
``bench.py``.

* ``--isolate NAME``: time ONE bench stage (or declared query) through the
  noop sink (``df.write.format("noop")``) so the computation is measured,
  not the sink or a prunable count. Runs in a fresh JVM per invocation.
* ``--explain NAME [--out FILE]``: dump ``.explain("formatted")`` for a
  declared query (or bench stage DataFrame) to stdout or a file — feeds
  ``plans/r06/<query>_{before,after}.txt``.
* ``--all-queries``: noop-time every declared query once (coarse sweep).

Job descriptions are set per stage (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session(cores: int | None):
    from registry_address_matcher_spark.session import get_spark

    master = f"local[{cores}]" if cores else None
    return get_spark("ram-spark-bench-extra", master=master)


def _bench_stage_dfs(spark, sf_dir: str) -> dict:
    """The seven bench.py stages as (name -> lazy DataFrame builder),
    mirroring run_bench's inputs (persisted, materialized outside timers)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from registry_address_matcher_spark.operators.cluster import connected_components
    from registry_address_matcher_spark.operators.exact import (
        exact_full_matches,
        exact_key_matches,
        exclude_matched,
    )
    from registry_address_matcher_spark.operators.fuzzy import fuzzy_matches, score_candidates
    from registry_address_matcher_spark.operators.preprocess import preprocess_registry

    spr = preprocess_registry(E._spr(spark, sf_dir)).persist()
    cad = preprocess_registry(E._cad(spark, sf_dir)).persist()
    spr.count(), cad.count()

    def exact_df():
        m1 = exact_full_matches(spr, cad)
        m2 = exact_key_matches(spr, cad, exclude_pairs=m1.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD"))
        return m1.unionByName(m2)

    def scoring_df():
        return score_candidates(spr, cad).agg(
            F.count(F.lit(1)).alias("n"), F.avg("best_score").alias("avg")
        )

    def remainder_df():
        exact = exact_df().persist()
        exact.count()
        return fuzzy_matches(exclude_matched(spr, exact), cad)

    def clustering_df():
        exact = exact_df().persist()
        exact.count()
        fuzzy = fuzzy_matches(exclude_matched(spr, exact), cad).persist()
        fuzzy.count()
        matches = exact.unionByName(fuzzy)
        edges = matches.select(
            F.concat(F.lit("S:"), F.col("ADDRESS_ID_SPR")).alias("src"),
            F.concat(F.lit("C:"), F.col("ADDRESS_ID_CAD")).alias("dst"),
        )
        return connected_components(edges)

    return {
        "exact_phases": exact_df,
        "fuzzy_scoring": scoring_df,
        "fuzzy_remainder": remainder_df,
        "clustering": clustering_df,
        "embedding_topk": lambda: E.q_embedding_topk(spark, sf_dir),
        "exact_dedup": lambda: E.q_exact_dedup(spark, sf_dir),
        "token_count": lambda: E.q_token_count(spark, sf_dir),
    }


def _resolve(spark, sf_dir: str, name: str):
    stages = _bench_stage_dfs(spark, sf_dir)
    if name in stages:
        return stages[name]()
    import __spark_entry__ as E

    qs = E.queries()
    if name in qs:
        return qs[name](spark, sf_dir)
    raise SystemExit(f"unknown stage/query: {name}; stages={list(stages)}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--isolate", default=None)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--all-queries", action="store_true")
    args = ap.parse_args()
    cores = args.cores
    if cores is None and os.environ.get("SPARK_GRAFT_CPUS"):
        cores = int(os.environ["SPARK_GRAFT_CPUS"])
    spark = _session(cores)

    if args.explain:
        import contextlib
        import io

        df = _resolve(spark, args.sf_dir, args.explain)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                f.write(plan)
            print(f"wrote {args.out} ({len(plan)} bytes)")
        else:
            print(plan)
        return

    if args.all_queries:
        import __spark_entry__ as E

        out = {}
        for name, fn in E.queries().items():
            spark.sparkContext.setJobDescription(f"r06 sweep: {name}")
            t0 = time.time()
            _noop(fn(spark, args.sf_dir))
            out[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(out))
        return

    if args.isolate:
        df = _resolve(spark, args.sf_dir, args.isolate)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"r06 isolate: {args.isolate} run{i}")
            t0 = time.time()
            _noop(df)
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"stage": args.isolate, "sf_dir": args.sf_dir,
                          "cores": cores, "runs": times, "min": min(times)}))
        return

    ap.print_help()


if __name__ == "__main__":
    main()
