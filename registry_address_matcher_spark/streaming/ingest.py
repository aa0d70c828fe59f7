"""Streaming corpus ingestion with a cross-batch exact-dedup ledger.

The LLM-ingestion front door: crawl shards arrive as a stream of
``(id, text)`` rows; each micro-batch is deduplicated (a) within itself
and (b) against everything already ingested, and only NOVEL content is
admitted. The accumulated ledger — one row per distinct ``sha256(text)``
with its first-arrival representative id — lives in a
:class:`~registry_address_matcher_spark.sources.io.SnapshotCatalog`
table, so every batch is a snapshot (time travel = "what had we ingested
by Tuesday") and a crashed ingest resumes from the last committed
snapshot plus the stream checkpoint.

Semantics (pinned by ``tests/test_streaming_plans.py``): after any
chunking of the same input, the ledger holds exactly one row per
distinct content hash, and each hash's representative is the min-id row
of the FIRST micro-batch that carried it (first-arrival-wins — the only
order a stream can honestly promise; a batch job over the same rows may
pick a lower id from a later chunk).

Scale shape: hashing and the in-batch rep are one partial-agg shuffle
of the batch; the novelty check is a hash-equi anti-join against the
ledger — batch-sized output, ledger-sized build. On the parquet-dir
catalog each commit rewrites the ledger (copy-on-write snapshot
semantics, same trade documented on ``merge_snapshot``); on a real
Iceberg catalog append ONLY the novel rows per batch (the engine's
snapshot log provides the union), or use MERGE INTO — at 10^12-row
ledgers also front the anti-join with a bloom/partition prune so a
batch only scans ledger partitions its hash range can touch.

Reference analogue: none — the reference is batch-only; SURVEY §2.8
names streaming as the new-capability axis.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from ..sources.io import SnapshotCatalog


def dedup_ingest(
    docs_stream: DataFrame,
    catalog: SnapshotCatalog,
    table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sink: Callable[[DataFrame, int], None] | None = None,
) -> DataStreamWriter:
    """Writer that folds each micro-batch into the dedup ledger.

    Ledger schema: ``(content_sha, <id_col>, <text_col>)`` — one row per
    distinct content hash. ``sink(novel_df, batch_id)`` (optional)
    receives each batch's ADMITTED rows (same schema), e.g. to append
    them to the corpus table proper. Caller starts the writer and owns
    ``checkpointLocation``.

    NULL text hashes to NULL and never equi-joins: such rows would leak
    through the anti-join every batch, so they are dropped here with the
    same rationale ``curate_documents`` ledgers them under 'empty'.
    """

    def _fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashed = batch_df.filter(F.col(text_col).isNotNull()).select(
            F.sha2(F.col(text_col), 256).alias("content_sha"),
            F.col(id_col),
            F.col(text_col),
        )
        # in-batch representative: min-id row per hash, as ONE partial
        # aggregate (min_by on the id order) — no join-back, no window
        reps = (
            hashed.groupBy("content_sha")
            .agg(F.min_by(F.struct(id_col, text_col), F.col(id_col)).alias("r"))
            .select("content_sha", f"r.{id_col}", f"r.{text_col}")
        )
        if catalog.exists(table):
            cur = catalog.load(table)
            # one barrier: novel feeds the snapshot write AND the sink —
            # and cur must be fully materialized BEFORE append_snapshot
            # swaps the manifest pointer, or the union job would read
            # the new snapshot's own rows through the stale plan
            novel = reps.join(
                cur.select("content_sha"), "content_sha", "left_anti"
            ).localCheckpoint()
            merged = cur.unionByName(novel).localCheckpoint()
        else:
            novel = reps.localCheckpoint()
            merged = novel
        catalog.append_snapshot(merged, table)
        if sink is not None:
            sink(novel, batch_id)

    return docs_stream.writeStream.foreachBatch(_fold_batch)
