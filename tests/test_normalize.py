"""Normalizer parity: Spark chain vs a pure-Python rendering of the
reference semantics (normalizer.py:105-133) vs the DuckDB SQL rendering."""

import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from registry_address_matcher_spark.functions.normalize import (
    ALIASES,
    RENAME_MAP,
    SUFFIXES,
    normalize_col,
    normalize_sql,
)


def ref_normalize(text) -> str:
    """Line-by-line faithful Python model of the reference normalizer."""
    if text is None or (isinstance(text, float) and pd.isna(text)):
        return ""
    text = str(text).strip().upper()
    if text in ALIASES:
        text = ALIASES[text]
    for suf in SUFFIXES:
        text = re.sub(rf"\b{suf}\.?", "", text, flags=re.IGNORECASE)
    text = re.sub(r"[^\w\s]", "", text)
    text = re.sub(r"\s+", " ", text)
    text = " ".join(w[:-1] if w.endswith("Ի") else w for w in text.split())
    text = re.sub(r"[^\w\s]", "", text.strip().upper())
    text = re.sub(r"\s+", " ", text)
    return RENAME_MAP.get(text, text)


CASES = [
    None,
    "",
    "  ԱԲՈՎՅԱՆ  ",
    "ԱԲՈՎՅԱՆ Փ.",
    "ԱԲՈՎՅԱՆ ՊՈՂ",
    "ԿՈՄԻՏԱՍԻ ԱՎ.",
    "ՏԻԳՐԱՆ ՄԵԾԻ",
    "ԹՈՒՄԱՆՅԱՆԻ",
    "Խ. ՀԱՅՐԻԿ",
    "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿ",
    "Ֆրունզեի",
    "ԼԵՆԻՆԻ",
    "ՂՈՒԿԱՍՅԱՆ ՓՈՂՈՑ 10-ՐԴ",
    "ա բ գ",
    "1/2",
    "12-ԲԻՍ",
    "Ի",
    "Ի Ի Ի",
    "ԻԻ",
    "<<ԱՆԻ>> ԹԱՂԱՄԱՍ 3-ՐԴ ՓՈՂՈՑ",
    "ABC-DEF.GHI",
    "  a   b\tc  ",
    "№5 տուն",
    "ՓՓ",
    "Ա Փ Փ",
]


@pytest.fixture(scope="module")
def spark_out(spark):
    df = spark.createDataFrame(pd.DataFrame({"raw": pd.Series(CASES, dtype=object)}))
    got = df.select(F.col("raw"), normalize_col(F.col("raw")).alias("norm")).toPandas()
    return dict(zip(got["raw"], got["norm"]))


def test_spark_matches_reference_semantics(spark_out):
    for case in CASES:
        assert spark_out[case] == ref_normalize(case), f"case={case!r}"


def test_duckdb_sql_matches_reference_semantics():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"raw": pd.Series(CASES, dtype=object)}))
    sql = f"SELECT raw, {normalize_sql('raw')} AS norm FROM t"
    got = dict(con.execute(sql).fetchall())
    for case in CASES:
        assert got.get(case) == ref_normalize(case), f"case={case!r}"


def test_rename_map_lookup(spark_out):
    from registry_address_matcher_spark.functions.normalize import LIVE_RENAMES, normalize_py

    # reference quirk, reproduced faithfully: keys whose words end in Ի are
    # unreachable because the lookup argument already had Ի stripped —
    # "Ֆրունզեի" therefore does NOT rename (the map key is "ՖՐՈՒՆԶԵԻ")
    assert spark_out["Ֆրունզեի"] == "ՖՐՈՒՆԶԵ"
    # a live entry fires: Ղուկասյան -> Յ ՎԱՐԴԱՆՅԱՆ (normalizer.py:47)
    assert normalize_py("Ղուկասյան") == "Յ ՎԱՐԴԱՆՅԱՆ"
    assert ("Ղուկասյան", "Յ. Վարդանյան") in LIVE_RENAMES
    # dict-literal last-wins: the Մարքսի key maps to ՋԻՎԱՆՈՒ (normalizer.py:49)
    assert RENAME_MAP["ՄԱՐՔՍԻ"] == "ՋԻՎԱՆՈՒ"
    # the pure-Python model and the Spark chain agree everywhere
    for case in CASES:
        assert normalize_py(case) == ref_normalize(case), f"case={case!r}"


def test_preprocess_derived_columns(spark):
    from registry_address_matcher_spark.operators.preprocess import preprocess_registry

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "STREET_NAME": ["ԱԲՈՎՅԱՆ Փ.", None],
                "HOUSE": ["12", "5"],
                "BUILDING": [None, "2"],
            }
        ).astype(object)
    )
    out = preprocess_registry(df).toPandas().sort_values("HOUSE").reset_index(drop=True)
    r12 = out[out.HOUSE == "12"].iloc[0]
    assert r12.STREET_NORM == "ԱԲՈՎՅԱՆ"
    assert r12.FULL_ADDRESS == "ԱԲՈՎՅԱՆ 12"
    assert r12.SEARCH_KEY == "ԱԲՈՎՅԱՆ_12"
    assert abs(r12.COMPLETENESS_SCORE - 2 / 3) < 1e-9
    r5 = out[out.HOUSE == "5"].iloc[0]
    assert r5.STREET_NORM == ""
    assert r5.FULL_ADDRESS == "5 2"
    assert r5.SEARCH_KEY == "_5"
    assert len(r5.ADDRESS_ID) == 64  # sha256 surrogate
