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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_col, hyperplane_bucket_col, hyperplane_planes


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
    (table, bucket) rows — a single pass over the input."""
    keys = F.array(*[hyperplane_bucket_col(F.col("v"), p) for p in planes_per_table])
    return vecs.select(
        F.col("id").alias(id_alias), F.col("v").alias(v_alias),
        F.posexplode(keys).alias("table", "bucket"),
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
