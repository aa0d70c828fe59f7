"""v3 engine variant and export sinks."""

import json
import os
import zipfile

import pandas as pd
from pyspark.sql import functions as F

from registry_address_matcher_spark.operators.preprocess import preprocess_registry


def _reg(spark, rows):
    return preprocess_registry(spark.createDataFrame(pd.DataFrame(rows).astype(object)))


def test_multi_block_candidates_union(spark):
    from registry_address_matcher_spark.operators.engine_v3 import multi_block_candidates

    spr = _reg(spark, [{"ADDRESS_ID": "S1", "STREET_NAME": "ԱԲՈՎՅԱՆ", "HOUSE": "17", "BUILDING": ""}])
    cad = _reg(
        spark,
        [
            {"ADDRESS_ID": "C1", "STREET_NAME": "ԱԲՈՎՅԱՆ", "HOUSE": "99", "BUILDING": ""},   # street block
            {"ADDRESS_ID": "C2", "STREET_NAME": "ՏԵՐՅԱՆ", "HOUSE": "17", "BUILDING": ""},    # house block
            {"ADDRESS_ID": "C3", "STREET_NAME": "ՏԵՐՅԱՆ", "HOUSE": "170", "BUILDING": ""},   # house prefix "17"
            {"ADDRESS_ID": "C4", "STREET_NAME": "ԱԲՈԴՅԱՆ", "HOUSE": "99", "BUILDING": ""},   # street prefix "ԱԲՈ"
            {"ADDRESS_ID": "C5", "STREET_NAME": "ՔՈՉԱՐ", "HOUSE": "42", "BUILDING": ""},     # no block
        ],
    )
    got = sorted(multi_block_candidates(spr, cad).toPandas().id_c)
    assert got == ["C1", "C2", "C3", "C4"]


def test_match_v3_exact_fallback(spark):
    from registry_address_matcher_spark.operators.engine_v3 import match_v3

    spr = _reg(
        spark,
        [
            # exact SEARCH_KEY hit -> no fuzzy for this row (J8)
            {"ADDRESS_ID": "S1", "STREET_NAME": "ԱԲՈՎՅԱՆ", "HOUSE": "1", "BUILDING": ""},
            # near-miss street -> fuzzy path
            {"ADDRESS_ID": "S2", "STREET_NAME": "ՄԱՇՏՈՑԸ ՊՈՂՈՏԱ", "HOUSE": "2", "BUILDING": ""},
        ],
    )
    cad = _reg(
        spark,
        [
            {"ADDRESS_ID": "C1", "STREET_NAME": "ԱԲՈՎՅԱՆ", "HOUSE": "1", "BUILDING": ""},
            {"ADDRESS_ID": "C2", "STREET_NAME": "ՄԱՇՏՈՑ ՊՈՂՈՏԱ", "HOUSE": "2", "BUILDING": ""},
        ],
    )
    out = match_v3(spr, cad).toPandas()
    s1 = out[out.id_s == "S1"]
    assert list(s1.match_type) == ["exact"] and list(s1.score) == [100.0]
    s2 = out[out.id_s == "S2"]
    assert list(s2.match_type) == ["fuzzy"] and s2.iloc[0].id_c == "C2"
    assert 85 <= s2.iloc[0].score < 100


def test_export_package(spark, registry_fixture, tmp_path):
    from registry_address_matcher_spark.pipeline import run_match_pipeline
    from registry_address_matcher_spark.sources.export import (
        create_export_package,
        summary_report_markdown,
    )

    spr, cad, _ = registry_fixture
    res = run_match_pipeline(spr, cad, with_clusters=False)
    out = str(tmp_path / "pkg")
    zpath = str(tmp_path / "pkg.zip")
    create_export_package(
        out, res.matches, res.unmatched_spr, preprocess_registry(spr), zip_path=zpath
    )
    names = zipfile.ZipFile(zpath).namelist()
    assert "quality_report.json" in names and "matching_statistics.json" in names
    assert any(n.startswith("matched_addresses/") and n.endswith(".csv") for n in names)
    assert any(n.startswith("unmatched_spr_addresses/") for n in names)
    stats = json.load(open(os.path.join(out, "matching_statistics.json")))
    assert stats["total_matches"] > 0 and "by_type" in stats

    md = summary_report_markdown(res.matches, spr.count())
    assert md.startswith("# Matching summary") and "By match type" in md
