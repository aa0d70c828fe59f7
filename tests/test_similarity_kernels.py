"""Kernel correctness: bit-parallel LCS vs DP oracle (hypothesis), ratio
family invariants, Jaro-Winkler vs DuckDB's implementation."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from registry_address_matcher_spark.functions.similarity import (
    indel_ratio,
    jaro_winkler_similarity,
    lcs_length,
    lcs_length_dp,
    partial_ratio,
    token_set_ratio,
    token_sort_ratio,
)

alpha = st.text(alphabet="ԱԲԳԴԵԶաբգ ABCab", max_size=40)


@settings(max_examples=300, deadline=None)
@given(alpha, alpha)
def test_bitparallel_lcs_matches_dp(a, b):
    assert lcs_length(a, b) == lcs_length_dp(a, b)


@settings(max_examples=200, deadline=None)
@given(alpha, alpha)
def test_ratio_bounds_and_symmetry(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert abs(r - indel_ratio(b, a)) < 1e-9


@settings(max_examples=100, deadline=None)
@given(alpha)
def test_identity_is_100(a):
    assert indel_ratio(a, a) == 100.0
    assert token_sort_ratio(a, a) == 100.0
    assert token_set_ratio(a, a) == 100.0
    assert partial_ratio(a, a) == 100.0


def test_known_ratios():
    # indel: LCS("ABCD","ABXD")=3 -> 200*3/8 = 75
    assert indel_ratio("ABCD", "ABXD") == 75.0
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("A", "") == 0.0
    # token reorder: sort recovers fully
    assert token_sort_ratio("ՄԱՇՏՈՑ ՊՈՂՈՏԱ", "ՊՈՂՈՏԱ ՄԱՇՏՈՑ") == 100.0
    # subset tokens: set recovers fully
    assert token_set_ratio("ԱԲՈՎՅԱՆ", "ԱԲՈՎՅԱՆ ՓՈՂՈՑ") == 100.0
    # substring: partial recovers fully
    assert partial_ratio("ԱԲՈՎ", "ԽԱԲՈՎԽ") == 100.0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefgh", max_size=20), st.text(alphabet="abcdefgh", max_size=20))
def test_jaro_winkler_matches_duckdb(a, b):
    con = duckdb.connect()
    expected = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    got = jaro_winkler_similarity(a, b)
    assert abs(got - float(expected)) < 1e-9, (a, b, got, expected)


def test_fuzzy_scores_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from registry_address_matcher_spark.functions.similarity import (
        best_of_strategies,
        fuzzy_scores,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": ["ԱԲՈՎՅԱՆ", "ՄԱՇՏՈՑ ՊՈՂՈՏԱ", "ՏԵՐՅԱՆ", ""],
                "b": ["ԱԲՈՎՅԱՆ", "ՊՈՂՈՏԱ ՄԱՇՏՈՑ", "ՏԵՐՅԱՆԻ", ""],
            }
        )
    )
    out = df.withColumn("scores", fuzzy_scores(F.col("a"), F.col("b")))
    bs, strat, rank = best_of_strategies("scores")
    got = (
        out.withColumn("best", bs).withColumn("strategy", strat).withColumn("rank", rank)
        .toPandas()
        .set_index("a")
    )
    assert got.loc["ԱԲՈՎՅԱՆ", "best"] == 100.0
    # reorder: token_sort wins and, on the 100-tie, precedes token_set
    assert got.loc["ՄԱՇՏՈՑ ՊՈՂՈՏԱ", "strategy"] == "token_sort_ratio"
    assert got.loc["ՄԱՇՏՈՑ ՊՈՂՈՏԱ", "best"] == 100.0
    # python kernels agree with the UDF outputs
    row = got.loc["ՏԵՐՅԱՆ"]
    assert abs(row["scores"]["ratio"] - indel_ratio("ՏԵՐՅԱՆ", "ՏԵՐՅԱՆԻ")) < 1e-9
    assert row["scores"]["token_set_ratio"] == token_set_ratio("ՏԵՐՅԱՆ", "ՏԵՐՅԱՆԻ")
