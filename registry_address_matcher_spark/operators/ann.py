"""Approximate nearest neighbors over an embedding column.

* :func:`topk_bruteforce` — exact baseline: broadcast the (small) probe
  set against the corpus, native dot products, windowed top-k. One scan
  of the corpus, no shuffle of the corpus itself.
* :func:`topk_lsh` — the scale path: ``n_tables`` independent random-
  hyperplane tables. ALL table keys are computed in ONE native projection
  (array of per-table buckets + posexplode), so the corpus is scanned
  exactly once and nothing crosses into Python — the round-1 version
  scanned/unioned the corpus once per table through a pandas UDF. The
  probe side is broadcast, so the corpus never shuffles either: the join
  is a broadcast equi-join on (table, bucket). Recall < 1 by
  construction; accuracy is measured against the brute-force baseline in
  tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    cosine_col,
    dot_fold,
    hyperplane_bucket_over,
    hyperplane_planes,
    hyperplane_tables_df,
)


def _as_double_vec(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )


def topk_bruteforce(
    corpus: DataFrame, probes: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Exact top-k: DataFrame[q_id, id, cos, rank]."""
    c = _as_double_vec(corpus, id_col, vec_col)
    p = _as_double_vec(probes, id_col, vec_col).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = c.join(F.broadcast(p), F.col("id") != F.col("q_id"))
    pairs = pairs.withColumn("cos", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "cos", "rank")
    )


def _multi_table_keyed(vecs: DataFrame, planes_per_table: list, id_alias: str, v_alias: str) -> DataFrame:
    """One projection computing every table's bucket, exploded to
    (table, bucket) rows — a single pass over the input. The plane
    matrices ride as broadcast DATA (one-row cross join +
    higher-order-function folds): zero large literals in the plan, so
    analyzer cost is independent of dim x bits x tables (the round-2
    literal form cost ~10 s PER TRANSFORMATION at dim 1024); buckets are
    bit-identical to the literal form."""
    tables = hyperplane_tables_df(vecs.sparkSession, planes_per_table)
    # bucket array lands as a real column FIRST: referencing `v` both as
    # an alias target and inside the generator in one select trips
    # Spark's lateral-column-alias resolution (INTERNAL_ERROR)
    withb = vecs.crossJoin(F.broadcast(tables)).withColumn(
        "__bk", F.transform(F.col("__ts"), lambda tbl: hyperplane_bucket_over(F.col("v"), tbl))
    )
    return withb.select(
        F.col("id").alias(id_alias), F.col("v").alias(v_alias),
        F.posexplode("__bk").alias("table", "bucket"),
    )


def topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Multi-table LSH top-k: candidates are the union of bucket hits
    across tables, scored exactly, windowed top-k.

    Recall/scan tradeoff is (p^k, L)-standard: per-bit agreement
    p = 1 - theta/pi, table hit = p^n_bits, recall = 1-(1-p^n_bits)^L.
    Pick (n_bits, n_tables) from the corpus's similarity profile: tight
    near-dup corpora (cos ~0.95) afford n_bits 12-16 at small L; diffuse
    corpora need smaller n_bits.

    ``dim`` is required: inferring it would run a driver-side ``first()``
    at plan-build time (round-1 defect). Physical plan: one corpus scan,
    native bucket math (no Python), broadcast probe side, equi-join.
    """
    if dim is None:
        raise ValueError("dim is required (no plan-build-time actions)")
    planes = [hyperplane_planes(dim, n_bits, seed + t) for t in range(n_tables)]
    c = _as_double_vec(corpus, id_col, vec_col)
    p = _as_double_vec(probes, id_col, vec_col)
    c_keyed = _multi_table_keyed(c, planes, "id", "v")
    p_keyed = _multi_table_keyed(p, planes, "q_id", "qv")
    pairs = c_keyed.join(F.broadcast(p_keyed), ["table", "bucket"]).filter(
        F.col("id") != F.col("q_id")
    )
    pairs = pairs.dropDuplicates(["q_id", "id"]).withColumn(
        "cos", F.round(cosine_col(F.col("qv"), F.col("v")), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — coarse quantizer + per-list exact rerank
# ---------------------------------------------------------------------------

def train_centroids_lloyd(
    sample: np.ndarray, k: int, iters: int = 5, seed: int = 42
) -> np.ndarray:
    """Deterministic coarse quantizer: seed-hashed init rows + ``iters``
    fixed Lloyd steps in numpy over a DRIVER-SIDE SAMPLE (at 100 TB you
    sample ~100k vectors — the quantizer is a build artifact, like an
    index; it never sees the full corpus). No MLlib: KMeans|| init order
    depends on partitioning, which would break run-to-run determinism —
    the whole point here is centroids you can embed as literals in an
    external verification query."""
    sample = np.asarray(sample, dtype=np.float64)
    n = len(sample)
    rng = np.random.RandomState(seed)
    cents = sample[rng.permutation(n)[:k]].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def centroids_df(spark, centroids: np.ndarray) -> DataFrame:
    """Broadcast carrier for the coarse quantizer: ONE row,
    ``__cs array<struct<cn:double, cv:array<double>>>`` (||c||^2, vector)
    in centroid order. Data, not literals — analyzer cost O(1) at any
    k x dim (the literal form re-paid ~10 s of analysis per DataFrame
    transformation at k=64 x dim=1024)."""
    data = [([(float(c @ c), [float(x) for x in c]) for c in centroids],)]
    return spark.createDataFrame(data, "__cs array<struct<cn:double,cv:array<double>>>")


def centroid_dists_col(vec: Column) -> Column:
    """Per-centroid score array, proportional to squared L2:
    ||c||^2 - 2 v.c (||v||^2 constant across centroids, argmin unchanged)
    — folds over the ``__cs`` data column; order matches an external
    engine evaluating the same literals (dot_fold is left-to-right)."""
    return F.transform(F.col("__cs"), lambda s: s["cn"] - 2.0 * dot_fold(vec, s["cv"]))


def ivf_assign_col(dists: Column) -> Column:
    """Nearest-centroid id (1-based; first occurrence wins ties — the
    same contract as DuckDB's list_position(d, list_min(d)))."""
    return F.array_position(dists, F.array_min(dists))


def topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k: corpus rows land in their nearest-centroid list (ONE
    native projection, corpus never reshuffles — the probe side is
    broadcast); each probe scans its ``nprobe`` nearest lists and exact-
    reranks by cosine. Recall loss is only cross-list neighbors; measured
    against brute force in tests.
    """
    cdf = centroids_df(corpus.sparkSession, centroids)
    c = (
        _as_double_vec(corpus, id_col, vec_col)
        .crossJoin(F.broadcast(cdf))
        .withColumn("cid", ivf_assign_col(centroid_dists_col(F.col("v"))))
        .drop("__cs")
    )
    p = _as_double_vec(probes, id_col, vec_col).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv")
    )
    # probe-side nprobe lists: explode all centroid distances, rank
    pk = p.crossJoin(F.broadcast(cdf)).select(
        "q_id", F.col("qv"),
        F.posexplode(centroid_dists_col(F.col("qv"))).alias("cidx", "dist"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("cidx").asc())
    pk = (
        pk.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select("q_id", "qv", (F.col("cidx") + 1).alias("cid"))  # 1-based like assign
    )
    pairs = c.join(F.broadcast(pk), "cid").filter(F.col("id") != F.col("q_id"))
    pairs = pairs.dropDuplicates(["q_id", "id"]).withColumn(
        "cos", F.round(cosine_col(F.col("qv"), F.col("v")), 6)
    )
    wk = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "cos", "rank")
    )
