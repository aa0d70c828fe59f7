"""Metaphone kernel + phonetic blocking key."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from registry_address_matcher_spark.functions.phonetic import (
    metaphone,
    metaphone_udf,
    phonetic_block_key,
)


def test_known_codes():
    # rule-by-rule checks against the published 1990 transformation table
    assert metaphone("KNIGHT") == "NT"          # KN- initial drop, GH silent
    assert metaphone("WRIGHT") == "RT"          # WR- initial drop
    assert metaphone("PHONE") == "FN"           # PH -> F
    assert metaphone("SHOE") == "X"             # SH -> X
    assert metaphone("THOMAS") == "0MS"         # TH -> 0
    assert metaphone("XAVIER") == "SFR"         # X- initial -> S, V -> F
    assert metaphone("QUICK") == "KK"           # Q -> K, CK -> K
    assert metaphone("JUDGE") == "JJ"           # DGE -> J
    assert metaphone("SCHOOL") == "SKL"         # SCH -> SK
    assert metaphone("CITY") == "ST"            # CI -> S
    assert metaphone("WHALE") == "WL"           # WH- -> W
    assert metaphone("") == ""
    assert metaphone("123") == ""


def test_same_sound_same_code():
    for a, b in [("SMITH", "SMYTH"), ("CATHERINE", "KATHRYN"), ("PHIL", "FILL")]:
        assert metaphone(a) == metaphone(b), (a, b)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=24))
def test_metaphone_total_and_deterministic(s):
    v = metaphone(s)
    assert v == metaphone(s)
    assert all(ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZ0" for ch in v)
    assert len(v) <= 6


def test_phonetic_stem_pairs_and_cap(spark):
    from registry_address_matcher_spark.repos_pipeline import (
        ReposMatchConfig,
        normalize_repos,
        phonetic_stem_pairs,
    )

    rows = [
        {"repo": "a", "path": "src/Smith.py", "commit": "c1", "lang": "py", "content": "aaa"},
        {"repo": "b", "path": "lib/Smyth.py", "commit": "c2", "lang": "py", "content": "bbb"},
        {"repo": "c", "path": "x/Other.py", "commit": "c3", "lang": "py", "content": "ccc"},
    ]
    # a ubiquitous stem exceeding the cap must produce NO pairs
    rows += [
        {"repo": f"r{i}", "path": f"m{i}/index.py", "commit": f"i{i}", "lang": "py", "content": str(i)}
        for i in range(8)
    ]
    import hashlib

    def fid(r):
        return hashlib.sha256(f"{r['repo']}|{r['path']}|{r['commit']}".encode()).hexdigest()

    df = spark.createDataFrame(pd.DataFrame(rows))
    norm = normalize_repos(df)
    cfg = ReposMatchConfig(phonetic_block_cap=5)
    got = phonetic_stem_pairs(norm, cfg).toPandas()
    pairs = set(zip(got.id_l, got.id_r))
    smith, smyth = fid(rows[0]), fid(rows[1])
    assert (smith, smyth) in pairs or (smyth, smith) in pairs  # share metaphone SM0
    index_ids = {fid(r) for r in rows[3:]}
    assert not any(a in index_ids and b in index_ids for a, b in pairs)  # capped block dropped


def test_udf_and_block_key(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"name": ["Smith Street", "Smyth Road", "ԱԲՈՎՅԱՆ ՓՈՂՈՑ", None]})
    )
    out = df.select(
        "name",
        metaphone_udf(F.element_at(F.split(F.trim(F.coalesce("name", F.lit(""))), r"\s+"), 1)).alias("mp"),
        phonetic_block_key(F.coalesce("name", F.lit(""))).alias("key"),
    ).toPandas()
    by_name = out.set_index("name")
    assert by_name.loc["Smith Street", "key"] == by_name.loc["Smyth Road", "key"]
    # non-Latin falls back to a prefix key
    assert by_name.loc["ԱԲՈՎՅԱՆ ՓՈՂՈՑ", "key"] == "ԱԲՈ"
