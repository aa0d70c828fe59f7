"""Phonetic keys for blocking (north star: soundex/metaphone of name
tokens).

* Soundex is Spark-native (``F.soundex``) — use it directly.
* Metaphone (Lawrence Philips, 1990 — published algorithm, implemented
  here from the public rule list) has no Spark built-in and no library in
  this sandbox, so it is a from-scratch pure-Python kernel exposed as an
  Arrow-batched pandas UDF. ASCII letters only — non-Latin input (e.g.
  Armenian registries) should be transliterated first or blocked on other
  keys; :func:`phonetic_block_key` falls back to a prefix key for
  non-ASCII tokens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_VOWELS = "AEIOU"


def metaphone(word: str, max_len: int = 6) -> str:
    """Classic Metaphone of a single word (letters only considered)."""
    w = "".join(ch for ch in word.upper() if "A" <= ch <= "Z")
    if not w:
        return ""
    # initial-letter exceptions
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w.startswith("X"):
        w = "S" + w[1:]
    elif w.startswith("WH"):
        w = "W" + w[2:]

    out: list[str] = []
    i = 0
    n = len(w)

    def nxt(k: int = 1) -> str:
        return w[i + k] if i + k < n else ""

    def prev(k: int = 1) -> str:
        return w[i - k] if i - k >= 0 else ""

    def isin(ch: str, group: str) -> bool:
        # "" in "AEIOU" is True in Python — guard end-of-word lookaheads
        return ch != "" and ch in group

    while i < n and len(out) < max_len:
        c = w[i]
        # collapse duplicates (except C)
        if c == prev() and c != "C":
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev() == "M"):
                out.append("B")
        elif c == "C":
            if nxt() == "I" and nxt(2) == "A":
                out.append("X")
            elif nxt() == "H":
                if prev() == "S":
                    out.append("K")
                else:
                    out.append("X")
                i += 1
            elif isin(nxt(), "IEY"):
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt() == "G" and isin(nxt(2), "EIY"):
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif c == "G":
            if nxt() == "H":
                if i + 2 < n and w[i + 2] in _VOWELS:
                    out.append("K")
                    i += 1
                else:
                    i += 1  # silent GH
            elif nxt() == "N":
                pass  # silent in GN / GNED
            elif isin(nxt(), "IEY"):
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if isin(prev(), _VOWELS) and not isin(nxt(), _VOWELS):
                pass
            elif isin(prev(), "CSPTG"):
                pass
            else:
                out.append("H")
        elif c == "F":
            out.append("F")
        elif c == "J":
            out.append("J")
        elif c == "K":
            if prev() != "C":
                out.append("K")
        elif c in "LMNR":
            out.append(c)
        elif c == "P":
            if nxt() == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt() == "H":
                out.append("X")
                i += 1
            elif nxt() == "I" and isin(nxt(2), "OA"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt() == "I" and isin(nxt(2), "OA"):
                out.append("X")
            elif nxt() == "H":
                out.append("0")
                i += 1
            elif nxt() == "C" and nxt(2) == "H":
                pass  # silent in TCH
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if isin(nxt(), _VOWELS):
                out.append("W")
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if isin(nxt(), _VOWELS):
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_len])


@pandas_udf(T.StringType())
def metaphone_udf(words: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}
    out = []
    for word in words.fillna(""):
        v = cache.get(word)
        if v is None:
            v = metaphone(word)
            cache[word] = v
        out.append(v)
    return pd.Series(out)


def skeleton_key(col: Column) -> Column:
    """Consonant-skeleton blocking key: first letter + first three
    non-vowel letters of the letters-only uppercased input. A coarser,
    deliberately SQL-portable sibling of metaphone (no Python kernel, no
    backreference regexes — DuckDB's RE2 has neither), used by oracle-
    checked configurations; :func:`skeleton_key_sql` is its DuckDB twin.
    """
    s = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    return F.concat(
        F.substring(s, 1, 1),
        F.substring(F.regexp_replace(F.substring(s, 2, 1 << 20), "[AEIOU]", ""), 1, 3),
    )


def skeleton_key_sql(expr: str) -> str:
    """DuckDB rendering of :func:`skeleton_key` (single source of truth
    lives here, next to the Spark expression)."""
    s = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    return (
        f"concat(substr({s}, 1, 1), "
        f"substr(regexp_replace(substr({s}, 2, 1048576), '[AEIOU]', '', 'g'), 1, 3))"
    )


def phonetic_block_key(col: Column, prefix_len: int = 3) -> Column:
    """Blocking key: metaphone of the first token for ASCII names,
    normalized prefix otherwise (non-Latin scripts carry no information
    through an English phonetic code)."""
    first = F.element_at(F.split(F.trim(col), r"\s+"), 1)
    is_ascii = first.rlike(r"^[A-Za-z]+$")
    return F.when(is_ascii, metaphone_udf(first)).otherwise(
        F.substring(first, 1, prefix_len)
    )
