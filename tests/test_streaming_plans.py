"""Streaming operators (file source -> memory sink, AvailableNow) and the
quality/lineage plan suite."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "dedup" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    from registry_address_matcher_spark.streaming.events import windowed_event_counts

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = _run_stream(spark, windowed_event_counts(stream), "wincounts")

    batch = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    got = out.select("window_start", "event_type", "n").toPandas()
    want = batch.toPandas()
    key = ["window_start", "event_type", "n"]
    assert (
        got[key].sort_values(key).reset_index(drop=True).equals(
            want[key].sort_values(key).reset_index(drop=True)
        )
    )


def test_stream_dedup(spark, tmp_path):
    from registry_address_matcher_spark.streaming.events import stream_dedup

    events = spark.read.parquet(f"{SF}/events.parquet").limit(500)
    dup = events.union(events)  # every event twice
    src = str(tmp_path / "dup_src")
    dup.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = _run_stream(spark, stream_dedup(stream), "dedup")
    assert out.count() == events.count()


def test_streaming_match_counts(spark, tmp_path):
    from registry_address_matcher_spark.streaming.events import streaming_match_counts
    from registry_address_matcher_spark.synth import make_registry_pair

    spr, cad, _ = make_registry_pair(spark, n_base=50, seed=3)
    src = str(tmp_path / "spr_src")
    spr.write.parquet(src)
    stream = spark.readStream.schema(spr.schema).parquet(src)
    matched = streaming_match_counts(stream, cad)
    q = (
        matched.writeStream.format("memory")
        .queryName("stream_matches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("stream_matches").count()

    # batch equivalent
    from registry_address_matcher_spark.operators.preprocess import preprocess_registry

    b_spr = preprocess_registry(spr)
    b_cad = preprocess_registry(cad).select(F.col("ADDRESS_ID").alias("c"), "FULL_ADDRESS")
    want = b_spr.join(b_cad, "FULL_ADDRESS").count()
    assert got == want


def test_quality_suite(spark, registry_fixture):
    from registry_address_matcher_spark.operators.preprocess import preprocess_registry
    from registry_address_matcher_spark.pipeline import run_match_pipeline
    from registry_address_matcher_spark.plans.quality import (
        completeness_correlation,
        hourly_counts,
        match_quality,
        match_type_counts,
        registry_quality,
        score_histogram,
        to_metrics_rows,
    )

    spr, cad, _ = registry_fixture
    res = run_match_pipeline(spr, cad, with_clusters=False)
    rq = registry_quality(preprocess_registry(spr)).collect()[0]
    assert rq["total_records"] == spr.count()
    assert 0 <= rq["avg_completeness"] <= 1

    mq = match_quality(res.matches).collect()[0]
    assert mq["score_min"] >= 85.0 and mq["score_max"] <= 100.0
    assert mq["n_95_plus"] + mq["n_85_94"] + mq["n_75_84"] + mq["n_below_75"] == mq["total_matches"]

    tc = match_type_counts(res.matches).toPandas()
    assert tc.n.sum() == mq["total_matches"]

    hist = score_histogram(res.matches).toPandas()
    assert hist.n.sum() == mq["total_matches"]
    assert hist.bucket.between(17, 20).all()  # scores 85..100

    hours = hourly_counts(res.matches).toPandas()
    assert hours.n.sum() == mq["total_matches"]

    corr = completeness_correlation(res.matches).collect()[0][0]
    assert corr is None or -1.0 <= corr <= 1.0

    rows = to_metrics_rows(match_quality(res.matches), "r1", "match").toPandas()
    assert set(rows.columns) == {"run_id", "stage", "key", "value", "recorded_at"}
    assert len(rows) == 11


def test_block_lineage(spark, registry_fixture):
    from registry_address_matcher_spark.operators.fuzzy import candidate_pairs
    from registry_address_matcher_spark.operators.preprocess import preprocess_registry
    from registry_address_matcher_spark.plans.lineage import block_lineage

    spr, cad, _ = registry_fixture
    p_spr, p_cad = preprocess_registry(spr), preprocess_registry(cad)
    pairs = candidate_pairs(p_spr, p_cad).withColumn(
        "score", F.lit(90.0)
    )
    lin = block_lineage(pairs, ["HOUSE_NORM", "BUILDING_NORM"], "score", "r1", "scoring")
    pdf = lin.toPandas()
    assert pdf.candidate_pair_count.sum() == pairs.count()
    assert all(len(h) == 20 for h in pdf.score_histogram)
    # every pair scored 90 -> bucket 18 holds everything
    assert all(h[18] == c for h, c in zip(pdf.score_histogram, pdf.candidate_pair_count))


def test_snapshot_catalog(spark, tmp_path):
    from registry_address_matcher_spark.sources.io import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path))
    df1 = spark.range(10).withColumnRenamed("id", "x")
    s1 = cat.append_snapshot(df1, "t")
    df2 = spark.range(20).withColumnRenamed("id", "x")
    s2 = cat.append_snapshot(df2, "t")
    assert cat.load("t").count() == 20            # current
    assert cat.load("t", s1).count() == 10        # time travel
    snaps = cat.snapshots("t")
    assert [s["id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent"] == s1


def test_sessionized_stream_matches_batch(spark, tmp_path):
    """Native session_window: streaming (watermark + AvailableNow) and
    batch produce identical per-user sessions."""
    from registry_address_matcher_spark.streaming.events import (
        sessionized_event_stats,
    )

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = _run_stream(
        spark, sessionized_event_stats(stream, watermark="4 hours"), "sessions"
    )
    batch = sessionized_event_stats(events)
    key = ["user_id", "session_start", "session_end", "n", "value_sum"]
    got = out.toPandas()[key].sort_values(key).reset_index(drop=True)
    want = batch.toPandas()[key].sort_values(key).reset_index(drop=True)
    assert got.equals(want)
    # sessions are disjoint per user and each covers >= 1 event
    assert (want.session_end > want.session_start).all()


def test_stateful_threshold_alerts_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState: GroupState must carry the running total
    ACROSS micro-batches — events are split into two time-ordered files
    processed one per trigger, so any state loss between batches shifts
    every second-half alert level."""
    import time

    from registry_address_matcher_spark.streaming.stateful import (
        threshold_alerts_batch,
        threshold_alerts_stream,
    )

    events = spark.read.parquet(f"{SF}/events.parquet")
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "alerts_src")
    # events are generated in ts order by event_id: split by event_id =
    # time-split; write first half, then second (newer mtime -> later batch)
    events.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # file-source orders by modification time
    events.filter(F.col("event_id") > mid).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        threshold_alerts_stream(stream, threshold=500.0)
        .writeStream.format("memory").queryName("alerts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("alerts").toPandas()
    want = threshold_alerts_batch(events, threshold=500.0).toPandas()
    key = ["user_id", "event_id", "alert_level", "cum_value"]
    assert len(got) == len(want) > 0
    assert (
        got[key].sort_values(key).reset_index(drop=True).equals(
            want[key].sort_values(key).reset_index(drop=True)
        )
    )


def test_incremental_match_equals_batch(spark, tmp_path):
    """Full exact->exact-key->fuzzy cascade over a CHUNKED probe stream
    must equal one batch run — the cascade is per-probe-row independent,
    so micro-batch boundaries cannot change the match set."""
    from registry_address_matcher_spark.pipeline import run_match_pipeline
    from registry_address_matcher_spark.streaming.incremental import incremental_match
    from registry_address_matcher_spark.synth import make_registry_pair

    spr, cad, _ = make_registry_pair(spark, n_base=120, seed=11)
    cad = cad.persist()
    src = tmp_path / "probe_src"
    # two chunk files -> two micro-batches with maxFilesPerTrigger=1
    half = spr.count() // 2
    pdf = spr.toPandas()
    spark.createDataFrame(pdf.iloc[:half], spr.schema).write.parquet(
        str(src / "a.parquet")
    )
    spark.createDataFrame(pdf.iloc[half:], spr.schema).write.parquet(
        str(src / "b.parquet")
    )

    stream = (
        spark.readStream.schema(spr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    got_batches: list = []

    def sink(matches, batch_id):
        got_batches.append((batch_id, matches.toPandas()))

    q = (
        incremental_match(stream, cad, sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # one micro-batch per part FILE (writers emit several per chunk dir) —
    # the point is only that the probe really was split across batches
    assert len(got_batches) >= 2, [b for b, _ in got_batches]

    key_cols = ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD", "MATCH_TYPE"]
    got = {
        tuple(r) for _, m in got_batches for r in m[key_cols].itertuples(index=False)
    }
    res = run_match_pipeline(spr, cad, with_clusters=False)
    want = {tuple(r) for r in res.matches.toPandas()[key_cols].itertuples(index=False)}
    res.release()
    assert got == want
    assert len(got) > 0


def test_match_result_release_unpersists(spark):
    from pyspark import StorageLevel

    from registry_address_matcher_spark.pipeline import run_match_pipeline
    from registry_address_matcher_spark.synth import make_registry_pair

    spr, cad, _ = make_registry_pair(spark, n_base=40, seed=5)
    res = run_match_pipeline(spr, cad, with_clusters=False)
    res.matches.count()
    assert res.persisted and all(
        df.storageLevel != StorageLevel.NONE for df in res.persisted
    )
    handles = list(res.persisted)
    res.release()
    assert res.persisted == []
    assert all(df.storageLevel == StorageLevel.NONE for df in handles)


def test_snapshot_merge_upsert_delete_and_time_travel(spark, tmp_path):
    from registry_address_matcher_spark.sources.io import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path / "warehouse"))
    base = spark.createDataFrame(
        [(1, "one", 10), (2, "two", 20), (3, "three", 30)], "id long, name string, v long"
    )
    s0 = cat.append_snapshot(base, "t")

    updates = spark.createDataFrame(
        [(2, "TWO", 22, False), (4, "four", 40, False), (3, None, 0, True)],
        "id long, name string, v long, is_delete boolean",
    )
    cat.merge_snapshot(updates, "t", ["id"], delete_col="is_delete")

    got = {(r["id"], r["name"], r["v"]) for r in cat.load("t").collect()}
    assert got == {(1, "one", 10), (2, "TWO", 22), (4, "four", 40)}
    # time travel: the pre-merge snapshot is intact
    old = {(r["id"], r["name"], r["v"]) for r in cat.load("t", snapshot=s0).collect()}
    assert old == {(1, "one", 10), (2, "two", 20), (3, "three", 30)}
    assert len(cat.snapshots("t")) == 2

    # duplicate update keys are an error, never silently resolved
    dup = spark.createDataFrame(
        [(5, "a", 1, False), (5, "b", 2, False)],
        "id long, name string, v long, is_delete boolean",
    )
    with pytest.raises(ValueError, match="duplicate"):
        cat.merge_snapshot(dup, "t", ["id"], delete_col="is_delete")
    # schema drift is an error
    bad = spark.createDataFrame([(6, "x")], "id long, name string")
    with pytest.raises(ValueError, match="columns"):
        cat.merge_snapshot(bad, "t", ["id"])


def test_table_profile_counts_and_order_stats(spark):
    from registry_address_matcher_spark.plans.quality import table_profile

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 40.0)], "a double, b double"
    )
    rows = {r["column"]: r for r in table_profile(df, ["a", "b"]).collect()}
    a = rows["a"]
    assert (a["n"], a["nulls"], a["n_distinct"]) == (3, 1, 2)
    assert (a["min_v"], a["max_v"], a["p50"]) == (1.0, 2.0, 2.0)
    b = rows["b"]
    assert (b["n"], b["nulls"], b["n_distinct"]) == (3, 1, 3)
    assert b["p50"] == 30.0


def test_dedup_ingest_ledger_chunking_invariant(spark, tmp_path):
    """Streamed-in-chunks ingestion ends with EXACTLY one ledger row per
    distinct content hash; reps are first-arrival (min id within the
    first batch that carried the hash); every snapshot commit is time-
    travelable; NULL text never enters the ledger."""
    from registry_address_matcher_spark.sources.io import SnapshotCatalog
    from registry_address_matcher_spark.streaming.ingest import dedup_ingest

    rows = [
        (1, "alpha"), (2, "beta"), (3, "alpha"),      # chunk a: alpha dup in-batch
        (4, "gamma"), (5, "beta"), (6, None),         # chunk b: beta dup vs ledger
        (7, "alpha"), (8, "delta"), (9, "delta"),     # chunk c
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "shards"
    for name, chunk in (("a", rows[:3]), ("b", rows[3:6]), ("c", rows[6:])):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(src / f"{name}.parquet")
        )
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"), iceberg_catalog="")
    cat.iceberg = None  # force the parquet-dir branch regardless of session conf
    admitted: list = []

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        dedup_ingest(
            stream, cat, "ledger",
            sink=lambda df, bid: admitted.append((bid, df.toPandas())),
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    ledger = cat.load("ledger").toPandas().sort_values("text")
    # one row per distinct non-null content, first-arrival min-id reps
    assert list(ledger["text"]) == ["alpha", "beta", "delta", "gamma"]
    assert list(ledger["doc_id"]) == [1, 2, 8, 4]
    # every batch committed a snapshot -> history is time-travelable
    snaps = cat.snapshots("ledger")
    assert len(snaps) >= 2
    first = cat.load("ledger", snapshot=snaps[0]["id"]).toPandas()
    assert len(first) < len(ledger)
    # the union of admitted rows == the final ledger (nothing admitted twice)
    import pandas as pd

    adm = pd.concat([d for _, d in admitted], ignore_index=True)
    assert sorted(adm["content_sha"]) == sorted(ledger["content_sha"])
