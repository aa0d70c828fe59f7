"""Approximate nearest neighbors over an embedding column.

* :func:`topk_bruteforce` — exact baseline: broadcast the (small) probe
  set against the corpus, native dot products, windowed top-k. One scan
  of the corpus, no shuffle of the corpus itself.
* :func:`topk_lsh` — the scale path: random-hyperplane bucket keys with
  multi-probe (probe also joins buckets at hamming distance 1 from its
  key), so the corpus side shuffles once by bucket and each probe scores
  only its bucket neighborhood. Recall < 1 by construction; accuracy is
  measured against the brute-force baseline in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_col, make_hyperplane_udf


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


def topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Multi-table LSH top-k: ``n_tables`` independent ``n_bits``-bit
    hyperplane tables; candidates are the union of bucket hits across
    tables, scored exactly, windowed top-k.

    Recall/scan tradeoff is (p^k, L)-standard: per-bit agreement
    p = 1 - theta/pi, table hit = p^n_bits, recall = 1-(1-p^n_bits)^L.
    Pick (n_bits, n_tables) from the corpus's similarity profile: tight
    near-dup corpora (cos ~0.95) afford n_bits 12-16 at small L; diffuse
    corpora need smaller n_bits. Corpus shuffles once per table — the
    join itself stays equi-key, no crossJoin anywhere.
    """
    dim = len(corpus.select(vec_col).first()[0])
    c = _as_double_vec(corpus, id_col, vec_col)
    p = _as_double_vec(probes, id_col, vec_col).select(
        F.col("id").alias("q_id"), F.col("v").alias("qv")
    )
    c_keyed = None
    p_keyed = None
    for t in range(n_tables):
        key = make_hyperplane_udf(dim, n_bits, seed + t)
        ck = c.withColumn("bucket", key(F.col("v"))).withColumn("table", F.lit(t))
        pk = p.withColumn("bucket", key(F.col("qv"))).withColumn("table", F.lit(t))
        c_keyed = ck if c_keyed is None else c_keyed.unionByName(ck)
        p_keyed = pk if p_keyed is None else p_keyed.unionByName(pk)
    pairs = c_keyed.join(p_keyed, ["table", "bucket"]).filter(F.col("id") != F.col("q_id"))
    pairs = pairs.dropDuplicates(["q_id", "id"]).withColumn(
        "cos", F.round(cosine_col(F.col("qv"), F.col("v")), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "cos", "rank")
    )
