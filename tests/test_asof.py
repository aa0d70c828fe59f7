"""As-of join: semantics on a hand case + plan shape (no range explosion)."""

import pandas as pd
from pyspark.sql import functions as F


def test_asof_backward_semantics(spark):
    from registry_address_matcher_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        pd.DataFrame({"u": [1, 1, 2], "ts": [10, 20, 15], "tag": ["a", "b", "c"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"u": [1, 1, 2], "ts": [10, 15, 99], "v": [100.0, 200.0, 300.0]})
    )
    out = asof_join_backward(
        left, right, by=["u"], ts_col="ts", value_cols=["ts", "v"], prefix="r_"
    ).toPandas().sort_values(["u", "ts"]).reset_index(drop=True)
    # equal ts is INCLUSIVE (ASOF >=); no earlier right row -> NULLs
    assert list(out.r_v)[:2] == [100.0, 200.0]
    assert pd.isna(out.r_v[2]) and pd.isna(out.r_ts[2])
    assert list(out.r_ts)[:2] == [10, 15]
    assert list(out.tag) == ["a", "b", "c"]


def test_asof_plan_is_window_not_range_join(spark):
    from registry_address_matcher_spark.operators.asof import asof_join_backward

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    l = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    r = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    plan = asof_join_backward(l, r, ["user_id"], "ts", ["value"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # the union trick: ONE window, zero joins of any kind
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Join" not in plan
    assert plan.count("Window") >= 1


def test_range_join_plan_is_equi_not_nested_loop(spark):
    """Bucket bisection must plan as a hash equi-join; the naive
    inequality join Spark would otherwise pick is BroadcastNestedLoop."""
    from registry_address_matcher_spark.operators.range_join import (
        interval_point_join,
    )

    iv = spark.createDataFrame(
        [(1, 0, 100), (1, 200, 300), (2, 50, 250)], "u long, s long, e long"
    )
    pt = spark.createDataFrame(
        [(1, 50), (1, 150), (1, 250), (2, 60), (2, 260)], "u long, ts long"
    )
    out = interval_point_join(iv, pt, ["u"], "s", "e", "ts", cell_width=64)
    rows = {(r.u, r.s, r.ts) for r in out.collect()}
    # half-open [s, e): ts=150 hits nothing for u=1; 250 hits [200,300)
    assert rows == {(1, 0, 50), (1, 200, 250), (2, 50, 60)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
