"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, compare row count + order-insensitive value content.

Runs at sf0.001 for speed (the driver uses sf0.01 — parity must hold at
any sf since both sides see identical inputs).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _duck():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df):
    """Columns sorted by name, rows sorted, floats normalized."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(f"{v:.6f}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip(f"{name}: rows-only (no SQL oracle)")
    got_df = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    con = _duck()
    want_df = con.execute(oracles[name]).fetchdf()
    assert sorted(got_df.columns) == sorted(want_df.columns), (
        f"{name}: columns {sorted(got_df.columns)} vs {sorted(want_df.columns)}"
    )
    got, want = _canon(got_df), _canon(want_df)
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    mismatches = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
    assert not mismatches, (
        f"{name}: first mismatch at {mismatches[0]}: "
        f"{got[mismatches[0]]} vs {want[mismatches[0]]}"
    )


@pytest.mark.parametrize(
    "name", [n for n in QUERY_NAMES if n not in entry_mod.oracle_sql()]
)
def test_rows_only_queries_run(spark, name):
    """No oracle, but the driver still executes them — they must run."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["MATCH_TYPE", "n"]
