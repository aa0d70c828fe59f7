"""Incremental entity resolution: the FULL match pipeline over a probe
stream against a static registry.

:func:`.events.streaming_match_counts` covers the exact-only stream-
static join; this module runs the complete exact -> exact-key -> fuzzy
cascade per micro-batch via ``foreachBatch``. The cascade's per-probe-row
independence makes this exactly equivalent to one batch run (pinned by
``tests/test_streaming_plans.py::test_incremental_match_equals_batch``):

* EXACT_FULL's last-wins dedup is CAD-side only — invariant to probe
  batching;
* EXACT_KEY emits every key-equal pair for a probe row — row-local;
* fuzzy top-1 ranks candidates of ONE probe row — row-local.

So ``union(matches per micro-batch) == matches(one batch over the whole
probe set)``, and the operator needs NO state store: arrived rows are
matched once, emitted once (append semantics), regardless of how the
stream is chunked. The build side is normalized and persisted ONCE, up
front — every micro-batch reuses the cached preprocessed registry
instead of re-running the normalization chain per batch; at cluster
scale point the checkpointLocation at durable storage and the sink at
an append table.

Reference analogue: none — the reference is batch-only (its chunk loop
is progress UI, ``advanced_matcher.py:280-360``); SURVEY §2.8 names
streaming as the Spark-native capability gap this module fills.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from ..config import DEFAULT, EngineConfig
from ..pipeline import run_match_pipeline


def incremental_match(
    probe_stream: DataFrame,
    cad_static: DataFrame,
    sink: Callable[[DataFrame, int], None],
    cfg: EngineConfig = DEFAULT,
) -> DataStreamWriter:
    """Writer that matches each probe micro-batch against ``cad_static``
    (RAW registry columns — normalized + persisted here, once) with the
    full pipeline, handing the 16-column match table to
    ``sink(matches_df, batch_id)``. Caller starts it (``.start()`` /
    ``.trigger(availableNow=True)``) and owns checkpointLocation. The
    cached build side lives as long as the writer; it is NOT released
    per batch — after stopping the query, call
    ``writer.release_build_side()`` (attached below) to free the cached
    registry; a long-lived driver that starts/stops many streams
    otherwise accumulates unreleasable MEMORY_AND_DISK copies (round-5
    advice)."""
    from ..operators.preprocess import preprocess_registry

    cad_prepared = preprocess_registry(cad_static).persist()

    def _match_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = run_match_pipeline(
            batch_df,
            cad_prepared,
            cfg=cfg,
            with_clusters=False,
            persist=True,
            cad_preprocessed=True,
        )
        try:
            sink(res.matches, batch_id)
        finally:
            # per-batch persists would otherwise accumulate across the
            # stream's lifetime
            res.release()

    writer = probe_stream.writeStream.foreachBatch(_match_batch).outputMode("append")
    # hand the caller the release handle: the writer object is the only
    # thing the caller holds, so the unpersist rides on it
    writer.release_build_side = lambda blocking=False: cad_prepared.unpersist(blocking)
    return writer
