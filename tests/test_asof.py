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


def test_asof_null_right_values_survive(spark):
    """The matched right row is attached WHOLESALE: a NULL value column in
    the most recent right row stays NULL (no stale carry from an earlier
    non-null row), and all output columns come from the same right row."""
    from registry_address_matcher_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 30)], "u long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "early"), (1, 20, None, "late")],
        "u long, ts long, v double, tag string",
    )
    out = asof_join_backward(
        left, right, by=["u"], ts_col="ts", value_cols=["v", "tag"],
        tie_cols=["ts"],
    ).collect()
    assert len(out) == 1
    # ts=20 is the match: its v is NULL and must STAY NULL; tag='late'
    assert out[0]["r_v"] is None
    assert out[0]["r_tag"] == "late"


def test_asof_duplicate_right_ts_deterministic(spark):
    """Among right rows sharing (by, ts), the greatest tie_cols tuple wins
    — repartitioning must not flip the winner."""
    from registry_address_matcher_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 50)], "u long, ts long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "z"), (1, 10, "m")], "u long, ts long, tag string"
    )
    for parts in (1, 7):
        out = asof_join_backward(
            left, right.repartition(parts), by=["u"], ts_col="ts",
            value_cols=["tag"],
        ).collect()
        assert out[0]["r_tag"] == "z"


def test_asof_chunked_two_pass_matches_single_window(spark):
    """coarse_cell_micros (segmented carry for group skew) must return
    byte-identical results to the single-window plan — including cells
    with no right rows (carry crosses empty cells) and leading NULLs."""
    import pandas as pd
    from pyspark.sql import functions as F
    from registry_address_matcher_spark.operators.asof import asof_join_backward

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # one mega-group: every event mapped onto user 0 -> the single-window
    # plan sorts it in ONE task; the chunked plan splits it across cells
    l = ev.filter(F.col("event_type") == "click").select(
        F.lit(0).alias("user_id"), "ts", "event_id"
    )
    r = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(0).alias("user_id"), "ts", "event_id", "value"
    )
    kw = dict(by=["user_id"], ts_col="ts", value_cols=["event_id", "value"],
              tie_cols=["event_id"], prefix="p_")
    base = asof_join_backward(l, r, **kw).toPandas()
    chunked = asof_join_backward(
        l, r, coarse_cell_micros=3_600_000_000, **kw
    ).toPandas()
    key = ["ts", "event_id"]
    a = base.sort_values(key).reset_index(drop=True)
    b = chunked.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert a["p_event_id"].notna().any()


def test_range_join_malformed_interval_explodes_nothing(spark):
    """end <= start intervals must not fan out cells (Spark sequence(hi,lo)
    DESCENDS rather than returning empty)."""
    from registry_address_matcher_spark.operators.range_join import (
        interval_point_join,
    )

    iv = spark.createDataFrame(
        [(1, 100, 100), (1, 500, 0), (1, 0, 100)], "u long, s long, e long"
    )
    pt = spark.createDataFrame([(1, 50), (1, 250)], "u long, ts long")
    out = interval_point_join(iv, pt, ["u"], "s", "e", "ts", cell_width=10)
    rows = {(r.s, r.e, r.ts) for r in out.collect()}
    assert rows == {(0, 100, 50)}


def test_asof_chunked_null_group_and_null_ts_match_single_window(spark):
    """ADVICE r3: the segmented carry joins must be NULL-SAFE — a NULL
    `by` key is a real group and a NULL ts floors to a NULL cell; plain
    equality dropped their cross-cell carry. Compare both plans over a
    graph with a NULL group alongside a real one and NULL timestamps on
    both sides."""
    import pandas as pd
    from registry_address_matcher_spark.operators.asof import asof_join_backward

    hour = 3_600_000_000
    left = spark.createDataFrame(
        [
            (None, "2024-01-01 00:30:00", "l1"),
            (None, "2024-01-01 05:30:00", "l2"),  # carry must cross 4 empty cells
            ("g", "2024-01-01 05:30:00", "l3"),
            (None, None, "l4"),
            ("g", None, "l5"),
        ],
        "grp string, ts string, lid string",
    ).selectExpr("grp", "cast(ts as timestamp) ts", "lid")
    right = spark.createDataFrame(
        [
            (None, "2024-01-01 00:00:00", "rA", 1.0),
            ("g", "2024-01-01 01:00:00", "rB", 2.0),
            (None, None, "rC", 3.0),
        ],
        "grp string, ts string, rid string, v double",
    ).selectExpr("grp", "cast(ts as timestamp) ts", "rid", "v")

    kw = dict(by=["grp"], ts_col="ts", value_cols=["rid", "v"],
              tie_cols=["rid"], prefix="r_")
    base = asof_join_backward(left, right, **kw).toPandas()
    chunked = asof_join_backward(left, right, coarse_cell_micros=hour, **kw).toPandas()
    key = ["grp", "lid"]
    a = base.sort_values(key).reset_index(drop=True)
    b = chunked.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)
    # the NULL group's later row really does receive the cross-cell carry
    assert a.loc[a.lid == "l2", "r_rid"].iloc[0] == "rA"
