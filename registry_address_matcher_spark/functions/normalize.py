"""Normalization chain (reference P1–P6) as native Catalyst expressions.

The reference normalizes every address column with a per-row Python UDF
(``/root/reference/src/matching/normalizer.py:105-133`` applied via
``Series.apply`` at ``/root/reference/src/utils/preprocessing.py:24-26``).
Here the same semantics are a chain of native ``F.upper/F.trim/
F.regexp_replace/F.element_at`` expressions — fully JVM-side, inside
whole-stage codegen, zero Python in the hot path.

**Single-source-of-truth design**: every step of the chain is defined as
data below and rendered twice — once to a Spark ``Column``
(:func:`normalize_col`) and once to an ANSI/DuckDB SQL expression string
(:func:`normalize_sql`) so the driver's DuckDB oracle runs the *same*
transformation. All regexes are RE2-compatible (no lookarounds) so both
engines agree.

Chain semantics (each step cites the reference rule it reproduces):

1.  NULL -> ''                             (preprocessing.py:19-21)
2.  trim + upper                           (normalizer.py:114)
3.  exact alias map, pre-normalization     (address.py:136-139)
4.  strip 7 Armenian street-type suffixes at word starts
    (``\\bSUF\\.?`` with unicode word semantics)   (normalizer.py:8-10, :121-122)
5.  strip punctuation ``[^\\w\\s]``          (normalizer.py:125)
6.  collapse whitespace                    (normalizer.py:126)
7.  drop trailing genitive ``Ի`` from each word   (normalizer.py:129)
8.  re-normalize (collapse + trim)         (normalizer.py:132 ``_norm``)
9.  old->new street-rename map lookup      (normalizer.py:21-81, :133)
"""

from __future__ import annotations

import re
from itertools import chain as _chain

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Semantic tables (facts from the reference, not code):
# ---------------------------------------------------------------------------

# address.py:136-139 — exact alias replacements applied to trimmed-upper text
ALIASES: dict[str, str] = {
    "Խ. ՀԱՅՐԻԿ": "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿԻ",
    "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿ": "ԽՐԻՄՅԱՆ ՀԱՅՐԻԿԻ",
}

# normalizer.py:8-10 — street-type suffix tokens stripped at word starts
SUFFIXES: tuple[str, ...] = ("ԽՃՂ", "ՃՂ", "Փ", "ՊՈՂ", "ԱՎ", "ՃԱՄԲ", "ԹԵԼԱ")

# normalizer.py:21-81 — old->new street renames; keys/values are stored in
# raw form here and normalized with the same `_norm` rule at import time,
# exactly as the reference's __init__ does.
_RAW_RENAMES: list[tuple[str, str]] = [
    ("Ֆրունզեի", "Լ. Մադոյան"),
    ("Լենինգրադյան", "Վ. Սարգսյան"),
    ("Կիրովականյան", "Վանաձորի"),
    ("Կալինինի", "Գ. Նժդեհի"),
    ("Կինգիսեպի", "Վ. Չերազի"),
    ("Պլեխանովի", "Սահմանապահների"),
    ("Շինարարների", "Մ. Թետչերի"),
    ("Կիրովի", "Ն. Ռիժկովի"),
    ("Լենինի", "Տիգրան Մեծի"),
    ("Խ. Հայրիկ", "Խրիմյան Հայրիկի"),
    ("Անի թաղամաս Մ. Ավետիսյան", "Մ. Ավետիսյան"),
    # NOTE: the reference defines Մարքսի twice (normalizer.py:33 and :49);
    # dict literal semantics mean the later value wins — kept here in the
    # same order so the same last-wins rule applies.
    ("Մարքսի", "Պ. Ջափարիձեի"),
    ("Անի թաղամաս Ա. Շահինյան", "Ա. Շահինյան"),
    ("Օղակային", "Արևելյան շրջանցող"),
    ("Ռեպինի", "Բ. Շչերբինայի"),
    ("Հեղափոխության", "Գ. Նժդեհի"),
    ("Անի թաղամաս Ե. Չարենցի", "Ե. Չարենցի"),
    ("Ղուկասյան փողոց 10-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 15-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 11-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 12-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 13-րդ", "Յ. Վարդանյան"),
    ("Ղուկասյան փողոց 14-րդ", "Յ. Վարդանյան"),
    ("Սևյան", "Հ. Ղանդիլյան"),
    ("Մուշ-2  թաղամասի փողոցներից մեկը", "Կ. Հալաբյան"),
    ("Ղուկասյան", "Յ. Վարդանյան"),
    ("Խաղաղության", "Բագրատունյաց"),
    ("Մարքսի", "Ջիվանու"),
    ("Ազիզբեկովի", "Ն. Շնորհալու"),
    ("Էլեկտրո պրիբորնի 6-րդ շարք", "Ա. Արմենյան փողոց"),
    ("Էլեկտրո պրիբորնի 10-րդ շարք", "Ա. Գևորգյան փողոց"),
    ("Կիրովաբադյան փողոց", "Ա. Թամանյան փողոց"),
    ("50 ամյակի անվան փողոց", "Ա. Մանուկյան փողոց"),
    ("<<Անի>> թաղամաս 3-րդ փողոց", "Ա. Շահինյան փողոց"),
    ("Հնոցավան 2-րդ շարք", "Ա. Պետրոսյան փողոց"),
    ("Կոմսոմոլի փողոց", "Ա. Վասիլյան փողոց"),
    ("Կեցխովելի փողոց", "Արտակ եպիսկոպոս Սմբատյան փողոց"),
    ("Արվելաձե փողոց", "Գարեգին Ա-ի փողոց"),
    ("Էլեկտրո պրիբորնի 8-րդ շարք", "Թ. Մանդալյան փողոց"),
    ("Պողպատավան 3-րդ շարք", "Ժ. Բ. Բարոնյան փողոց"),
    ("Կրուպսկայա փողոց", "Խ. Դաշտենցի փողոց"),
    ("Քութաիսյան փողոց", "Կ. Դեմիրճյան փողոց"),
    ("Պողպատավան 2-րդ շարք", "Կ. Խաչատրյան փողոց"),
    ("Կույբիշևի փողոց", "Հ. Մազմանյան փողոց"),
    ("Պիոներական փողոց", "Հ. Մելքոնյան փողոց"),
    ("Պողպատավան 1-ին շարք", "Հ. Պողոսյան փողոց"),
    ("Պողպատավան 4-րդ շարք", "Հ. Ռասկատլյան փողոց"),
    ("Կատելնայա", "Հնոցավանի 1-ին շարք"),
    ("Պետ բարակներ", "Ղ. Ղուկասյան փողոց"),
    ("Մայիսյան փողոց", "Մ. Մկրտչյան փողոց"),
    ("Էլեկտրո պրիբորնի 7-րդ շարք", "Մ. Սարգսյան փողոց"),
    ("Սվերդլովի փողոց", "Ն. Ղորղանյան փողոց"),
    ("Աստղի հրապարակ", "Շ. Ազնավուրի հրապարակ"),
    ("Ս. Մուսայելյան փողոց", "Շ. Ազնավուրի հրապարակ"),
    ("Էլեկտրո պրիբորնի 11-րդ շարք", "Ռ. Դանիելյան փողոց"),
    ("Օրջոնիկիձեի փողոց", "Ս. Մատնիշյան փողոց"),
    ("Էնգելսի փողոց", "Վ. Աճեմյան փողոց"),
    ("Կենտրոնական հրապարակ", "Վարդանանց հրապարակ"),
    ("<<Անի>> թաղամաս 15-րդ փողոց", "Ֆորալբերգի փողոց"),
]

# normalizer.py:83-102 — optional house-number decode table (defined but
# never invoked in the reference; exposed here as an opt-in rule P3)
HOUSE_VARIATIONS: dict[str, str] = {
    **{f"{n}{sep}{m}": f"{n}" for n, m in [(1, 1), (2, 2), (3, 3), (15, 1), (23, 2)]
       for sep in "/-_."},
    "1/2": "1", "1½": "1", "2/3": "2", "2½": "2",
    "3/4": "3", "3½": "3", "4/5": "4", "4½": "4",
    "1КОРП1": "1", "1CORP1": "1", "1K1": "1", "1Կ1": "1",
    "2КОРП1": "2", "2CORP1": "2", "2K1": "2", "2Կ1": "2",
    **{f"0{i}": f"{i}" for i in range(1, 10)}, "010": "10",
}


def _norm_py(text: str) -> str:
    """Reference ``_norm`` (normalizer.py:105-108) — used only at import
    time to normalize the rename-map keys/values, never per row."""
    text = str(text).strip().upper()
    text = re.sub(r"[^\w\s]", "", text)
    return re.sub(r"\s+", " ", text)


RENAME_MAP: dict[str, str] = {_norm_py(k): _norm_py(v) for k, v in _RAW_RENAMES}


def normalize_py(text) -> str:
    """Pure-Python model of the full chain — driver-side only (synth
    filtering, tests). Mirrors normalizer.py:110-133 exactly.

    NOTE a reference quirk reproduced faithfully: rename-map KEYS are
    normalized with ``_norm`` (which keeps trailing genitive Ի), but the
    lookup argument has already had the per-word trailing Ի stripped —
    so every map entry whose key contains a word ending in Ի is
    unreachable (dead) in the reference too.
    """
    if text is None:
        return ""
    text = str(text).strip().upper()
    if text in ALIASES:
        text = ALIASES[text]
    for suf in SUFFIXES:
        text = re.sub(rf"\b{suf}\.?", "", text, flags=re.IGNORECASE)
    text = re.sub(r"[^\w\s]", "", text)
    text = re.sub(r"\s+", " ", text)
    text = " ".join(w[:-1] if w.endswith("Ի") else w for w in text.split())
    text = _norm_py(text)
    return RENAME_MAP.get(text, text)


#: rename pairs that actually fire end-to-end (old normalizes onto the
#: same string the new name normalizes to) — synth uses only these
LIVE_RENAMES: list[tuple[str, str]] = [
    (old, new) for old, new in _RAW_RENAMES if normalize_py(old) == normalize_py(new)
]

# ---------------------------------------------------------------------------
# Regex building blocks — RE2-compatible (no lookbehind/lookahead) so the
# identical pattern runs in both Spark (java.util.regex) and DuckDB (RE2).
# ---------------------------------------------------------------------------

# Python's unicode `\w` == letter|digit|underscore for our purposes.
_NONWORD_NONSPACE = r"[^\p{L}\p{N}_\s]"
# left-hand side of Python's `\b` before a word char: start or a non-word char
_WORD_START = r"(^|[^\p{L}\p{N}_])"
_WS = r"\s+"


def _suffix_pattern(suffix: str) -> str:
    # reference: re.sub(r'\bSUF\.?', '', text, flags=IGNORECASE)
    return f"{_WORD_START}{suffix}\\.?"


# ---------------------------------------------------------------------------
# Spark renderer
# ---------------------------------------------------------------------------

def _map_lookup_col(col: Column, mapping: dict[str, str]) -> Column:
    """mapping.get(x, x) as a Catalyst expression (literal map, codegen'd)."""
    if not mapping:
        return col
    m = F.create_map(*_chain.from_iterable((F.lit(k), F.lit(v)) for k, v in mapping.items()))
    # try_element_at: NULL (not an ANSI error) on missing keys
    return F.coalesce(F.try_element_at(m, col), col)


def normalize_col(col: Column | str) -> Column:
    """The full street/house/building normalizer as one native expression."""
    c = F.col(col) if isinstance(col, str) else col
    # 1-2: null fill, trim, upper
    c = F.upper(F.trim(F.coalesce(c.cast("string"), F.lit(""))))
    # 3: alias pre-map
    c = _map_lookup_col(c, ALIASES)
    # 4: suffix strip (word-start anchored, keep the boundary char via $1)
    for suf in SUFFIXES:
        c = F.regexp_replace(c, _suffix_pattern(suf), "$1")
    # 5: punctuation strip
    c = F.regexp_replace(c, _NONWORD_NONSPACE, "")
    # 6: whitespace collapse
    c = F.regexp_replace(c, _WS, " ")
    # 7: trailing genitive Ի per word (word could be just "Ի" -> dropped)
    c = F.regexp_replace(c, "Ի( |$)", "$1")
    # 8: re-norm: collapse + trim
    c = F.trim(F.regexp_replace(c, _WS, " "))
    # 9: rename map
    return _map_lookup_col(c, RENAME_MAP)


def full_address_col(street_norm: Column, house_norm: Column, building_norm: Column) -> Column:
    """P4 (preprocessing.py:29-33): space-concat of the three normals.

    The reference joins with single spaces and trims the ends but keeps
    interior double-spaces when a middle component is empty — reproduced
    by concat (not concat_ws, which would skip only NULLs, not '').
    """
    return F.trim(F.concat(street_norm, F.lit(" "), house_norm, F.lit(" "), building_norm))


def search_key_col(street_norm: Column, house_norm: Column) -> Column:
    """P5 (preprocessing.py:36-38): composite blocking key."""
    return F.concat(street_norm, F.lit("_"), house_norm)


def completeness_col(street: Column, house: Column, building: Column) -> Column:
    """P6 (preprocessing.py:41-45): fraction of the 3 raw columns present."""
    return (
        street.isNotNull().cast("int")
        + house.isNotNull().cast("int")
        + building.isNotNull().cast("int")
    ) / F.lit(3.0)


def house_decode_col(col: Column) -> Column:
    """P3 optional rule: decode separator/padding house variants."""
    return _map_lookup_col(col, HOUSE_VARIATIONS)


# ---------------------------------------------------------------------------
# DuckDB/ANSI renderer — the oracle runs the SAME chain
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _map_lookup_sql(expr: str, mapping: dict[str, str]) -> str:
    if not mapping:
        return expr
    whens = " ".join(
        f"WHEN {_sql_quote(k)} THEN {_sql_quote(v)}" for k, v in mapping.items()
    )
    return f"(CASE ({expr}) {whens} ELSE ({expr}) END)"


def normalize_sql(expr: str) -> str:
    """Render the normalizer chain as a DuckDB SQL expression over `expr`."""
    e = f"upper(trim(coalesce(CAST({expr} AS STRING), '')))"
    e = _map_lookup_sql(e, ALIASES)
    for suf in SUFFIXES:
        pat = _sql_quote(_suffix_pattern(suf))
        e = f"regexp_replace({e}, {pat}, '\\1', 'g')"
    e = f"regexp_replace({e}, {_sql_quote(_NONWORD_NONSPACE)}, '', 'g')"
    e = f"regexp_replace({e}, {_sql_quote(_WS)}, ' ', 'g')"
    e = f"regexp_replace({e}, 'Ի( |$)', '\\1', 'g')"
    e = f"trim(regexp_replace({e}, {_sql_quote(_WS)}, ' ', 'g'))"
    return _map_lookup_sql(e, RENAME_MAP)


def full_address_sql(street: str, house: str, building: str) -> str:
    return f"trim({street} || ' ' || {house} || ' ' || {building})"


def search_key_sql(street: str, house: str) -> str:
    return f"({street} || '_' || {house})"


def completeness_sql(street: str, house: str, building: str) -> str:
    # CAST to DOUBLE: DuckDB would otherwise type int/DECIMAL as DECIMAL,
    # which value-hashes differently from Spark's double
    return (
        f"CAST(((CASE WHEN {street} IS NOT NULL THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {house} IS NOT NULL THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {building} IS NOT NULL THEN 1 ELSE 0 END)) AS DOUBLE) / 3.0"
    )
