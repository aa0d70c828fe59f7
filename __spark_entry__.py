"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2, each runnable on the driver's TPC-H-ish parquet tables;
``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL. The ER queries
derive a deterministic SPR/CAD registry pair from ``part`` (seeded
mutations expressible in both dialects) and run the REAL package
operators on it; the oracle reproduces the same semantics in SQL —
including the full normalization chain, rendered by the same code that
builds the Spark expressions (single source of truth, no drift).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from registry_address_matcher_spark.functions.normalize import (
    completeness_sql,
    full_address_sql,
    normalize_col,
    normalize_sql,
    search_key_sql,
)
from registry_address_matcher_spark.operators.preprocess import preprocess_registry

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Deterministic SPR/CAD derivation from `part` — one definition per dialect,
# kept textually adjacent so parity is auditable. Mutations by p_partkey%10:
#   0 -> first token dropped (exact phases miss; fuzzy/lev recovers partially)
#   1 -> trailing punctuation (normalizer strips -> exact)
#   2 -> padded whitespace     (normalizer strips -> exact)
# BUILDING is NULLed for p_brand='Brand#13' to exercise completeness<1.
# ---------------------------------------------------------------------------

_CAD_SQL = """
SELECT concat('C', p_partkey)  AS ADDRESS_ID,
       p_name                  AS STREET_NAME,
       CAST(p_size AS STRING) AS HOUSE,
       nullif(p_brand, 'Brand#13') AS BUILDING
FROM part
"""

_SPR_SQL = """
SELECT concat('S', p_partkey) AS ADDRESS_ID,
       CASE p_partkey % 10
         WHEN 0 THEN substr(p_name, instr(p_name, ' ') + 1)
         WHEN 1 THEN p_name || '.'
         WHEN 2 THEN '  ' || p_name || ' '
         ELSE p_name END      AS STREET_NAME,
       CASE WHEN p_partkey % 7 = 0 THEN ' ' || CAST(p_size AS STRING)
            ELSE CAST(p_size AS STRING) END AS HOUSE,
       nullif(p_brand, 'Brand#13') AS BUILDING
FROM part
"""


def _cad(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_CAD_SQL)


def _spr(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_SPR_SQL)


def _norm_registry_sql(base_sql: str) -> str:
    """Oracle rendering of preprocess_registry over a derived registry."""
    sn = normalize_sql("STREET_NAME")
    hn = normalize_sql("HOUSE")
    bn = normalize_sql("BUILDING")
    return f"""
SELECT ADDRESS_ID, STREET_NAME, HOUSE, BUILDING,
       {sn} AS STREET_NORM,
       {hn} AS HOUSE_NORM,
       {bn} AS BUILDING_NORM,
       {full_address_sql(sn, hn, bn)} AS FULL_ADDRESS,
       {search_key_sql(sn, hn)} AS SEARCH_KEY,
       {completeness_sql('STREET_NAME', 'HOUSE', 'BUILDING')} AS COMPLETENESS_SCORE
FROM ({base_sql})
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_normalize_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — the full normalizer as native expressions (SURVEY §2.2)."""
    part = _load(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("id"),
        normalize_col(F.col("p_name")).alias("name_norm"),
    )


def q_preprocess_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P6 — derived columns over the CAD derivation (SURVEY §2.2)."""
    out = preprocess_registry(_cad(spark, sf_dir))
    return out.select(
        "ADDRESS_ID", "STREET_NORM", "HOUSE_NORM", "BUILDING_NORM",
        "FULL_ADDRESS", "SEARCH_KEY",
        F.round("COMPLETENESS_SCORE", 6).alias("COMPLETENESS_SCORE"),
    )


def q_exact_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — EXACT_FULL with last-wins dedup (SURVEY §2.3)."""
    from registry_address_matcher_spark.operators.exact import exact_full_matches

    spr = preprocess_registry(_spr(spark, sf_dir))
    cad = preprocess_registry(_cad(spark, sf_dir))
    m = exact_full_matches(spr, cad)
    return m.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD", "MATCH_SCORE", "MATCH_TYPE")


def q_exact_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — EXACT_KEY join minus phase-1 pairs (SURVEY §2.3)."""
    from registry_address_matcher_spark.operators.exact import (
        exact_full_matches,
        exact_key_matches,
    )

    spr = preprocess_registry(_spr(spark, sf_dir))
    cad = preprocess_registry(_cad(spark, sf_dir))
    m1 = exact_full_matches(spr, cad)
    m2 = exact_key_matches(spr, cad, exclude_pairs=m1.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD"))
    return m2.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD", "MATCH_SCORE", "MATCH_TYPE")


def q_unmatched_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J7 — anti-join of matched SPR ids (SURVEY §2.3/§2.6)."""
    from registry_address_matcher_spark.operators.exact import (
        exact_full_matches,
        exclude_matched,
    )

    spr = preprocess_registry(_spr(spark, sf_dir))
    cad = preprocess_registry(_cad(spark, sf_dir))
    m1 = exact_full_matches(spr, cad)
    return exclude_matched(spr, m1).select("ADDRESS_ID")


def q_block_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking stats: per-block build-side rows (SURVEY §2.4 A-family)."""
    from registry_address_matcher_spark.operators.blocking import block_sizes

    cad = preprocess_registry(_cad(spark, sf_dir))
    return block_sizes(
        cad.filter(F.col("HOUSE_NORM") != ""), ["HOUSE_NORM", "BUILDING_NORM"]
    )


def q_candidate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — fuzzy-block candidate count per probe row (SURVEY §2.3)."""
    spr = preprocess_registry(_spr(spark, sf_dir)).filter(F.col("HOUSE_NORM") != "")
    cad = preprocess_registry(_cad(spark, sf_dir)).filter(F.col("HOUSE_NORM") != "")
    pairs = spr.select(
        F.col("ADDRESS_ID").alias("spr_id"), "HOUSE_NORM", "BUILDING_NORM"
    ).join(cad.select("HOUSE_NORM", "BUILDING_NORM"), ["HOUSE_NORM", "BUILDING_NORM"])
    return pairs.groupBy("spr_id").agg(F.count(F.lit(1)).alias("candidates"))


def q_lev_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — per-group top-1 with deterministic tie-break, native scorer
    (levenshtein similarity so the oracle can reproduce it exactly)."""
    spr = preprocess_registry(_spr(spark, sf_dir)).filter(
        (F.col("HOUSE_NORM") != "") & (F.col("STREET_NORM") != "")
    )
    cad = preprocess_registry(_cad(spark, sf_dir)).filter(
        (F.col("HOUSE_NORM") != "") & (F.col("STREET_NORM") != "")
    )
    pairs = spr.select(
        F.col("ADDRESS_ID").alias("spr_id"),
        F.col("STREET_NORM").alias("s1"),
        "HOUSE_NORM", "BUILDING_NORM",
    ).join(
        cad.select(
            F.col("ADDRESS_ID").alias("cad_id"),
            F.col("STREET_NORM").alias("s2"),
            "HOUSE_NORM", "BUILDING_NORM",
        ),
        ["HOUSE_NORM", "BUILDING_NORM"],
    )
    score = F.round(
        100.0 * (1.0 - F.levenshtein("s1", "s2") / F.greatest(F.length("s1"), F.length("s2"), F.lit(1))),
        6,
    )
    pairs = pairs.withColumn("score", score)
    w = Window.partitionBy("spr_id").orderBy(F.col("score").desc(), F.col("cad_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("score") >= 85.0))
        .select("spr_id", "cad_id", "score")
    )


def q_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched Jaro-Winkler pandas UDF vs DuckDB's native
    jaro_winkler_similarity — oracle-checks the Arrow kernel itself."""
    from registry_address_matcher_spark.functions.similarity import jaro_winkler_udf

    spr = _spr(spark, sf_dir).select(
        F.col("ADDRESS_ID").alias("id"), F.col("STREET_NAME").alias("s1")
    )
    cad = _cad(spark, sf_dir).select(
        F.expr("concat('S', substr(ADDRESS_ID, 2))").alias("id"),
        F.col("STREET_NAME").alias("s2"),
    )
    joined = spr.join(cad, "id")
    return joined.select(
        "id", F.round(jaro_winkler_udf(F.col("s1"), F.col("s2")), 6).alias("jw")
    )


def q_score_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — 5-point score buckets (SURVEY §2.4)."""
    lev = q_lev_top1(spark, sf_dir)
    return (
        lev.withColumn("bucket", F.floor(F.col("score") / 5).cast("long"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_match_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A13 + U1 — union of exact phases, value_counts on MATCH_TYPE."""
    m1 = q_exact_full(spark, sf_dir)
    m2 = q_exact_key(spark, sf_dir)
    return m1.unionByName(m2).groupBy("MATCH_TYPE").agg(F.count(F.lit(1)).alias("n"))


def q_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — score -> quality bucket case-when (SURVEY §2.2)."""
    lev = q_lev_top1(spark, sf_dir)
    bucket = (
        F.when(F.col("score") >= 90, "Excellent")
        .when(F.col("score") >= 75, "Good")
        .when(F.col("score") >= 50, "Poor")
        .otherwise("No Match")
    )
    return lev.withColumn("quality", bucket).groupBy("quality").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — global top-k with deterministic total order (SURVEY §2.5)."""
    lev = q_lev_top1(spark, sf_dir)
    return lev.orderBy(F.col("score").desc(), F.col("spr_id").asc()).limit(10)


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A6 — count/avg/distinct/dup/median aggregates (SURVEY §2.4)."""
    docs = _load(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("dup_docs"),
        F.round(F.median("n_chars"), 6).alias("median_chars"),
        F.round(F.avg(F.col("lang").isNotNull().cast("int")), 6).alias("lang_completeness"),
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/A10 — hour extraction + group-by-hour counts (SURVEY §2.4)."""
    ev = _load(spark, sf_dir, "events")
    return ev.groupBy(F.hour("ts").alias("hour")).agg(F.count(F.lit(1)).alias("n"))


def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — Pearson correlation per group (SURVEY §2.4)."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price")
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (exact): sha256 groups, representative = min doc_id."""
    docs = _load(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", F.sha2(F.col("text"), 256))
        .groupBy("h")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace tokens + punctuation count per doc."""
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.regexp_count("text", F.lit(r"[^\w\s]")).alias("n_punct"),
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN baseline — brute-force cosine top-10 per probe vector
    (F.aggregate/zip_with dot products, JVM-side)."""
    emb = _load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    probes = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = probes.crossJoin(emb).filter(F.col("vec_id") != F.col("q_id"))
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(F.aggregate(F.zip_with(c, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    pairs = pairs.withColumn("cos", F.round(dot / (norm("qv") * norm("v")), 6))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id", "cos", F.col("rn").alias("rank"))
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-star/small-star CC on the supplier->nation bipartite graph,
    oracle = recursive min-label propagation in DuckDB."""
    from registry_address_matcher_spark.operators.cluster import connected_components

    sup = _load(spark, sf_dir, "supplier")
    edges = sup.select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("dst"),
    )
    return connected_components(edges)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full exact+key match over the part-derived registries at
    sf0.001, match-type distribution."""
    return q_match_type_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "normalize_chain": q_normalize_chain,
        "preprocess_registry": q_preprocess_registry,
        "exact_full": q_exact_full,
        "exact_key": q_exact_key,
        "unmatched_anti": q_unmatched_anti,
        "block_sizes": q_block_sizes,
        "candidate_counts": q_candidate_counts,
        "lev_top1": q_lev_top1,
        "jaro_winkler": q_jaro_winkler,
        "score_histogram": q_score_histogram,
        "match_type_counts": q_match_type_counts,
        "quality_buckets": q_quality_buckets,
        "topk_global": q_topk_global,
        "doc_stats": q_doc_stats,
        "events_hourly": q_events_hourly,
        "corr": q_corr,
        "exact_dedup": q_exact_dedup,
        "token_count": q_token_count,
        "embedding_topk": q_embedding_topk,
        "connected_components": q_connected_components,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_NORM_CAD = _norm_registry_sql(_CAD_SQL)
_NORM_SPR = _norm_registry_sql(_SPR_SQL)

_ORACLE_EXACT_FULL = f"""
WITH spr AS ({_NORM_SPR}), cad AS ({_NORM_CAD}),
cad1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY FULL_ADDRESS ORDER BY ADDRESS_ID DESC) AS rn
    FROM cad) WHERE rn = 1
)
SELECT spr.ADDRESS_ID AS ADDRESS_ID_SPR, cad1.ADDRESS_ID AS ADDRESS_ID_CAD,
       CAST(100.0 AS DOUBLE) AS MATCH_SCORE, 'EXACT_FULL' AS MATCH_TYPE
FROM spr JOIN cad1 ON spr.FULL_ADDRESS = cad1.FULL_ADDRESS
"""

_ORACLE_EXACT_KEY = f"""
WITH spr AS ({_NORM_SPR}), cad AS ({_NORM_CAD}),
m1 AS ({_ORACLE_EXACT_FULL})
SELECT spr.ADDRESS_ID AS ADDRESS_ID_SPR, cad.ADDRESS_ID AS ADDRESS_ID_CAD,
       CAST(100.0 AS DOUBLE) AS MATCH_SCORE, 'EXACT_KEY' AS MATCH_TYPE
FROM spr JOIN cad
  ON spr.SEARCH_KEY = cad.SEARCH_KEY AND spr.BUILDING_NORM = cad.BUILDING_NORM
WHERE NOT EXISTS (
  SELECT 1 FROM m1
  WHERE m1.ADDRESS_ID_SPR = spr.ADDRESS_ID AND m1.ADDRESS_ID_CAD = cad.ADDRESS_ID)
"""

_ORACLE_LEV_TOP1 = f"""
WITH spr AS ({_NORM_SPR}), cad AS ({_NORM_CAD}),
pairs AS (
  SELECT spr.ADDRESS_ID AS spr_id, cad.ADDRESS_ID AS cad_id,
         round(CAST(100.0 AS DOUBLE) * (1.0 - levenshtein(spr.STREET_NORM, cad.STREET_NORM)
               / greatest(length(spr.STREET_NORM), length(cad.STREET_NORM), 1)), 6) AS score
  FROM spr JOIN cad
    ON spr.HOUSE_NORM = cad.HOUSE_NORM AND spr.BUILDING_NORM = cad.BUILDING_NORM
  WHERE spr.HOUSE_NORM <> '' AND spr.STREET_NORM <> '' AND cad.STREET_NORM <> ''
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY spr_id ORDER BY score DESC, cad_id ASC) AS rn
  FROM pairs
)
SELECT spr_id, cad_id, score FROM ranked WHERE rn = 1 AND score >= 85.0
"""


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}
    sqls["normalize_chain"] = (
        f"SELECT p_partkey AS id, {normalize_sql('p_name')} AS name_norm FROM part"
    )
    sqls["preprocess_registry"] = f"""
SELECT ADDRESS_ID, STREET_NORM, HOUSE_NORM, BUILDING_NORM, FULL_ADDRESS, SEARCH_KEY,
       round(COMPLETENESS_SCORE, 6) AS COMPLETENESS_SCORE
FROM ({_NORM_CAD})
"""
    sqls["exact_full"] = _ORACLE_EXACT_FULL
    sqls["exact_key"] = _ORACLE_EXACT_KEY
    sqls["unmatched_anti"] = f"""
WITH spr AS ({_NORM_SPR}), m1 AS ({_ORACLE_EXACT_FULL})
SELECT ADDRESS_ID FROM spr
WHERE ADDRESS_ID NOT IN (SELECT ADDRESS_ID_SPR FROM m1)
"""
    sqls["block_sizes"] = f"""
SELECT HOUSE_NORM, BUILDING_NORM, count(*) AS block_rows
FROM ({_NORM_CAD}) WHERE HOUSE_NORM <> ''
GROUP BY HOUSE_NORM, BUILDING_NORM
"""
    sqls["candidate_counts"] = f"""
WITH spr AS ({_NORM_SPR}), cad AS ({_NORM_CAD})
SELECT spr.ADDRESS_ID AS spr_id, count(*) AS candidates
FROM spr JOIN cad
  ON spr.HOUSE_NORM = cad.HOUSE_NORM AND spr.BUILDING_NORM = cad.BUILDING_NORM
WHERE spr.HOUSE_NORM <> '' AND cad.HOUSE_NORM <> ''
GROUP BY spr.ADDRESS_ID
"""
    sqls["lev_top1"] = _ORACLE_LEV_TOP1
    sqls["jaro_winkler"] = f"""
WITH spr AS ({_SPR_SQL}), cad AS ({_CAD_SQL})
SELECT spr.ADDRESS_ID AS id,
       round(jaro_winkler_similarity(spr.STREET_NAME, cad.STREET_NAME), 6) AS jw
FROM spr JOIN cad ON substr(spr.ADDRESS_ID, 2) = substr(cad.ADDRESS_ID, 2)
"""
    sqls["score_histogram"] = f"""
SELECT CAST(floor(score / 5) AS BIGINT) AS bucket, count(*) AS n
FROM ({_ORACLE_LEV_TOP1}) GROUP BY 1
"""
    sqls["match_type_counts"] = f"""
SELECT MATCH_TYPE, count(*) AS n FROM (
  SELECT * FROM ({_ORACLE_EXACT_FULL}) UNION ALL SELECT * FROM ({_ORACLE_EXACT_KEY})
) GROUP BY MATCH_TYPE
"""
    sqls["quality_buckets"] = f"""
SELECT CASE WHEN score >= 90 THEN 'Excellent' WHEN score >= 75 THEN 'Good'
            WHEN score >= 50 THEN 'Poor' ELSE 'No Match' END AS quality,
       count(*) AS n
FROM ({_ORACLE_LEV_TOP1}) GROUP BY 1
"""
    sqls["topk_global"] = f"""
SELECT spr_id, cad_id, score FROM ({_ORACLE_LEV_TOP1})
ORDER BY score DESC, spr_id ASC LIMIT 10
"""
    sqls["doc_stats"] = """
SELECT count(*) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       count(DISTINCT lang) AS n_langs,
       count(*) - count(DISTINCT text) AS dup_docs,
       round(median(n_chars), 6) AS median_chars,
       round(avg(CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END), 6) AS lang_completeness
FROM documents
"""
    sqls["events_hourly"] = (
        "SELECT hour(ts) AS hour, count(*) AS n FROM events GROUP BY 1"
    )
    sqls["corr"] = """
SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""
    sqls["exact_dedup"] = """
SELECT sha256(text) AS h, min(doc_id) AS rep_id, count(*) AS n
FROM documents GROUP BY 1 HAVING count(*) > 1
"""
    sqls["token_count"] = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
FROM documents
"""
    sqls["embedding_topk"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probes AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 200 = 0),
pairs AS (
  SELECT q_id, vec_id,
         round(list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos
  FROM probes CROSS JOIN e WHERE vec_id <> q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT q_id, vec_id, cos, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
"""
    sqls["connected_components"] = """
WITH RECURSIVE
edges AS (
  SELECT concat('S', s_suppkey) AS src, concat('N', s_nationkey) AS dst FROM supplier
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM sym),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.src, r.lab FROM sym s JOIN reach r ON r.node = s.dst
)
SELECT node, min(lab) AS component FROM reach GROUP BY node
"""
    return sqls
