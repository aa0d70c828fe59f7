"""Sorted-neighborhood blocking + blocking-quality metrics.

``global_rank`` / ``sorted_neighborhood_pairs`` are pinned against naive
pandas recomputation (sort + sliding window), across partition counts —
the rank and the pair set must be invariant to WHERE the range split
points land. The plan audit pins the scale contract: no
Exchange SinglePartition anywhere in the SNM plan.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from registry_address_matcher_spark.operators.blocking import (
    blocking_quality,
    global_rank,
    sorted_neighborhood_pairs,
)


@pytest.fixture(scope="module")
def frame(spark):
    # duplicated sort keys + a key straddling any 3-way split point
    rows = [(f"id{i:03d}", f"k{(i * 7) % 25:02d}", i % 5) for i in range(200)]
    return spark.createDataFrame(rows, "id string, k string, v int")


def _expected_ranks(pdf):
    s = pdf.sort_values(["k", "id"]).reset_index(drop=True)
    return {r.id: i + 1 for i, r in s.iterrows()}


def test_global_rank_matches_pandas_total_order(spark, frame):
    want = _expected_ranks(frame.toPandas())
    for parts in (1, 3, 7):
        got = {
            r["id"]: r["rank"]
            for r in global_rank(frame, ["k", "id"], partitions=parts).collect()
        }
        assert got == want, f"partitions={parts}"


def test_snm_pairs_match_naive_window(spark, frame):
    pdf = frame.toPandas().sort_values(["k", "id"]).reset_index(drop=True)
    w = 4
    want = set()
    ids = pdf["id"].tolist()
    for i in range(len(ids)):
        for j in range(i + 1, min(i + w, len(ids))):
            want.add((ids[i], ids[j], j - i))
    for parts in (2, 5):
        got = {
            (r["id_l"], r["id_r"], r["rank_dist"])
            for r in sorted_neighborhood_pairs(
                frame.repartition(parts), ["k"], "id", window=w
            ).collect()
        }
        assert got == want, f"partitions={parts}"


def test_snm_pair_count_is_linear_in_window(spark, frame):
    # candidate count = sum_i min(w-1, n-i) = (n-w+1)(w-1) + (w-1)(w-2)/2
    n, w = frame.count(), 6
    expect = (n - w + 1) * (w - 1) + (w - 1) * (w - 2) // 2
    assert sorted_neighborhood_pairs(frame, ["k"], "id", window=w).count() == expect


def test_snm_rejects_degenerate_window(spark, frame):
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(frame, ["k"], "id", window=1)


def test_snm_plan_has_no_single_partition_exchange(spark, frame):
    plan = (
        sorted_neighborhood_pairs(frame, ["k"], "id", window=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_blocking_quality_hand_computed(spark):
    probe = spark.createDataFrame(
        [("p1", "a"), ("p2", "a"), ("p3", "b"), ("p4", None), ("p5", "z")],
        "pid string, k string",
    )
    build = spark.createDataFrame(
        [("b1", "a"), ("b2", "b"), ("b3", "b"), ("b4", None)],
        "bid string, k string",
    )
    # shared non-null keys: a (2x1=2 pairs), b (1x2=2); NULL never joins; z unmatched
    row = blocking_quality(probe, build, ["k"]).collect()[0]
    assert row["n_blocks"] == 2
    assert row["candidate_pairs"] == 4
    assert row["largest_block_pairs"] == 2
    assert row["reduction_ratio"] == round(1 - 4 / (5 * 4), 6)


def test_blocking_quality_pairs_completeness(spark):
    probe = spark.createDataFrame(
        [("p1", "a"), ("p2", "b"), ("p3", "c")], "pid string, k string"
    )
    build = spark.createDataFrame(
        [("b1", "a"), ("b2", "x"), ("b3", "c")], "bid string, k string"
    )
    truth = spark.createDataFrame(
        [("p1", "b1"), ("p2", "b2"), ("p3", "b3")], "pid string, bid string"
    )
    row = blocking_quality(
        probe, build, ["k"], true_pairs=truth, probe_id="pid", build_id="bid"
    ).collect()[0]
    # (p1,b1) share 'a', (p3,b3) share 'c'; (p2,b2) is b-vs-x -> missed
    assert row["pairs_completeness"] == round(2 / 3, 6)
    assert row["candidate_pairs"] == 2


def test_blocking_quality_requires_ids_with_truth(spark):
    df = spark.createDataFrame([("p1", "a")], "pid string, k string")
    with pytest.raises(ValueError, match="probe_id"):
        blocking_quality(df, df, ["k"], true_pairs=df)


def test_global_rank_release_handle_unpersists(spark, frame):
    from pyspark import StorageLevel

    handle: list = []
    ranked = global_rank(frame, ["k", "id"], release_handle=handle)
    ranked.count()
    assert len(handle) == 1
    assert handle[0].storageLevel != StorageLevel.NONE
    handle[0].unpersist()
    assert handle[0].storageLevel == StorageLevel.NONE
