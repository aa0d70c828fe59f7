"""Exact-phase semantics: last-wins dedup, pair exclusion, anti-joins."""

import pandas as pd

from registry_address_matcher_spark.operators.exact import (
    exact_full_matches,
    exact_key_matches,
    exclude_matched,
)
from registry_address_matcher_spark.operators.preprocess import preprocess_registry


def _reg(spark, rows):
    return preprocess_registry(
        spark.createDataFrame(pd.DataFrame(rows).astype(object))
    )


def test_exact_full_last_wins(spark):
    spr = _reg(spark, [{"ADDRESS_ID": "S1", "STREET_NAME": "ԱԲՈՎՅԱՆ", "HOUSE": "1", "BUILDING": ""}])
    cad = _reg(
        spark,
        [
            {"ADDRESS_ID": "C1", "STREET_NAME": "ԱԲՈՎՅԱՆ", "HOUSE": "1", "BUILDING": ""},
            {"ADDRESS_ID": "C2", "STREET_NAME": "ԱԲՈՎՅԱՆ Փ.", "HOUSE": "1", "BUILDING": ""},
        ],
    )
    out = exact_full_matches(spr, cad).toPandas()
    # both CAD rows normalize to the same FULL_ADDRESS; last-wins keeps max id
    assert len(out) == 1
    assert out.iloc[0].ADDRESS_ID_CAD == "C2"
    assert out.iloc[0].MATCH_TYPE == "EXACT_FULL"
    assert out.iloc[0].MATCH_SCORE == 100.0


def test_exact_key_emits_all_and_excludes_pairs(spark):
    spr = _reg(spark, [{"ADDRESS_ID": "S1", "STREET_NAME": "ՏԵՐՅԱՆ", "HOUSE": "7", "BUILDING": "2"}])
    cad = _reg(
        spark,
        [
            {"ADDRESS_ID": "C1", "STREET_NAME": "ՏԵՐՅԱՆ", "HOUSE": "7", "BUILDING": "2"},
            {"ADDRESS_ID": "C2", "STREET_NAME": "ՏԵՐՅԱՆԻ", "HOUSE": "7", "BUILDING": "2"},
            {"ADDRESS_ID": "C3", "STREET_NAME": "ՏԵՐՅԱՆ", "HOUSE": "7", "BUILDING": "3"},
        ],
    )
    # C2 normalizes to ՏԵՐՅԱՆ (genitive strip) -> same SEARCH_KEY as C1
    out = exact_key_matches(spr, cad).toPandas()
    assert sorted(out.ADDRESS_ID_CAD) == ["C1", "C2"]  # C3: building mismatch

    m1 = exact_full_matches(spr, cad)
    out2 = exact_key_matches(
        spr, cad, exclude_pairs=m1.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD")
    ).toPandas()
    # phase-1 matched (S1, C2) via last-wins full address; remaining C1
    assert sorted(out2.ADDRESS_ID_CAD) == ["C1"]


def test_exclude_matched_anti_join(spark):
    spr = _reg(
        spark,
        [
            {"ADDRESS_ID": "S1", "STREET_NAME": "Ա", "HOUSE": "1", "BUILDING": ""},
            {"ADDRESS_ID": "S2", "STREET_NAME": "Բ", "HOUSE": "2", "BUILDING": ""},
        ],
    )
    cad = _reg(spark, [{"ADDRESS_ID": "C1", "STREET_NAME": "Ա", "HOUSE": "1", "BUILDING": ""}])
    matches = exact_full_matches(spr, cad)
    rest = exclude_matched(spr, matches).toPandas()
    assert list(rest.ADDRESS_ID) == ["S2"]
