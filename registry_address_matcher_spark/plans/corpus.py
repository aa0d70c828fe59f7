"""Corpus preparation for training pipelines: deterministic split
assignment and token-window chunking.

Both are pure projections — zero shuffles, zero Python. They run as
map-side work fused into whatever scan feeds them, so at 100 TB they
cost exactly one pass and partition like the input.

* :func:`assign_split` — train/val/test assignment from a content-free
  hash of the id. ``rand()`` is wrong for this job twice over: it
  re-rolls under task retry (a doc can land in train on attempt 1 and
  test on attempt 2), and it can't be replayed by another engine. The
  md5 bucket here is bit-identical in Spark and DuckDB (the oracle runs
  the same expression), stable under repartition/retry, and any future
  system can recompute membership from the id alone.
* :func:`chunk_documents` — fixed-size token windows (sequence-packing
  prep): one output row per ``chunk_tokens``-token window, computed
  entirely with native array expressions (split → sequence → slice →
  posexplode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import cross_hash60


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (("train", 98), ("val", 1), ("test", 1)),
    seed: int = 0,
) -> DataFrame:
    """Add a ``split`` column: deterministic weighted assignment.

    ``splits`` are (name, weight) pairs; a doc's bucket is
    ``md5_60bit(id ':' seed) mod sum(weights)`` and the buckets are
    carved in list order, so the mapping is a pure function of
    (id, seed, splits) — no data movement, no RNG state.
    """
    total = sum(w for _, w in splits)
    if total <= 0 or any(w < 0 for _, w in splits):
        raise ValueError(f"split weights must be non-negative with a positive sum: {splits!r}")
    bucket = (
        cross_hash60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
        % total
    )
    expr = None
    acc = 0
    for name, w in splits[:-1]:
        acc += w
        expr = (expr.when if expr is not None else F.when)(bucket < acc, F.lit(name))
    last = F.lit(splits[-1][0])
    return df.withColumn("split", expr.otherwise(last) if expr is not None else last)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
) -> DataFrame:
    """One row per ``chunk_tokens``-token window of each doc:
    ``(id, chunk_id, chunk_text, n_tokens)``. The final window is short
    (no padding — packing is the consumer's job); chunk_id is 0-based
    window order.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive: {chunk_tokens}")
    c = chunk_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(c)).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(F.slice(toks, i * c + 1, c), " ").alias("chunk_text"),
            F.size(F.slice(toks, i * c + 1, c)).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(windows).alias("chunk_id", "w")
    ).select(id_col, "chunk_id", F.col("w.chunk_text"), F.col("w.n_tokens"))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the training-mix primitive
    ("keep 100% of en, 30% of the rest").

    Same contract as :func:`assign_split`, for the same reasons:
    membership is a pure function of (id, seed, rate) via the cross-engine
    md5 bucket, so it survives task retry, repartition, and re-runs, and
    any engine can recompute exactly which rows were kept. ``rates`` maps
    stratum VALUES to keep-fractions in [0, 1]; strata not listed get
    ``default_rate``. A NULL stratum gets ``default_rate`` (it matches no
    key). The filter is a map-side projection — zero shuffle, prunes to
    (id, stratum) columns at the scan.
    """
    for k, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {k!r} must be in [0,1]: {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1]: {default_rate}")
    u = (
        cross_hash60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
        % 1_000_000
    )
    # integer thresholds: rate 0.3 keeps buckets [0, 300000) — exact and
    # renderable as the identical constant in the SQL oracle
    thr = None
    for k, r in rates.items():
        t = F.lit(int(round(r * 1_000_000)))
        thr = (thr.when if thr is not None else F.when)(F.col(stratum_col) == k, t)
    default_t = F.lit(int(round(default_rate * 1_000_000)))
    thr = thr.otherwise(default_t) if thr is not None else default_t
    return df.filter(u < thr)
