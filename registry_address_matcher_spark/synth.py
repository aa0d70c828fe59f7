"""Deterministic synthetic data (seed-fixed, no external inputs).

Two generators:

* :func:`make_registry_pair` — SPR/CAD registries in the reference's shape
  with seeded corruptions mirroring the normalizer's rule classes
  (suffix variants ``normalizer.py:8-10``, trailing genitive ``:129``,
  rename map ``:21-81``, punctuation noise) plus labeled ground-truth
  pairs for the pairwise-F1 gate.
* :func:`make_repos` — the north-rule input table
  ``(repo, path, commit, lang, content)`` with duplicate classes (same
  base content, whitespace/comment/identifier corruptions) and a skewed
  ``lang`` column (the deliberate hot blocking key), plus labels.

Everything derives from ``numpy.random.RandomState(seed)`` — same seed,
same bytes, any machine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.normalize import LIVE_RENAMES

_ARM_UPPER = "ԱԲԳԴԵԶԷԸԹԺԻԼԽԾԿՀՁՂՃՄՅՆՇՈՉՊՋՌՍՎՏՐՑՒՓՔՕՖ"
_SUFFIX_DECOR = ["Փ.", "ՊՈՂ.", "ԱՎ.", "ՃԱՄԲ."]


def _word(rng: np.random.RandomState, lo: int = 5, hi: int = 9) -> str:
    n = rng.randint(lo, hi)
    return "".join(_ARM_UPPER[i] for i in rng.randint(0, len(_ARM_UPPER), n))


def _street(rng: np.random.RandomState) -> str:
    return " ".join(_word(rng) for _ in range(rng.randint(2, 4)))


def _corrupt_street(rng: np.random.RandomState, s: str, kind: int) -> str:
    """Corruptions, by recoverability class (kind chosen by caller):
    0 exact copy; 1 suffix decoration (normalizer strips); 2 trailing
    genitive Ի (stripped); 3 punctuation noise (stripped); 4 token swap
    (token_sort recovers); 5 extra shared-free token (token_set recovers);
    6 single-char typo (ratio ~95)."""
    words = s.split()
    if kind == 1:
        return s + " " + _SUFFIX_DECOR[rng.randint(0, len(_SUFFIX_DECOR))]
    if kind == 2:
        i = rng.randint(0, len(words))
        words[i] = words[i] + "Ի"
        return " ".join(words)
    if kind == 3:
        return s.replace(" ", ", ", 1) + "."
    if kind == 4:
        if len(words) >= 2:
            words[0], words[-1] = words[-1], words[0]
        return " ".join(words)
    if kind == 5:
        return s + " " + _word(rng, 4, 6)
    if kind == 6:
        i = rng.randint(0, len(s))
        while s[i] == " ":
            i = rng.randint(0, len(s))
        repl = _ARM_UPPER[rng.randint(0, len(_ARM_UPPER))]
        return s[:i] + repl + s[i + 1 :]
    return s


def make_registry_pair(
    spark: SparkSession,
    n_base: int = 500,
    seed: int = 42,
    dup_rate: float = 0.85,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (spr, cad, labeled_pairs).

    CAD = one clean row per base entity. SPR = for ``dup_rate`` of bases a
    corrupted copy (positive pair), the rest brand-new entities sharing a
    block with some CAD row but with unrelated street (negative pair —
    exercises threshold rejection). A slice of positives uses real
    old->new renamed streets from the reference's table.
    labeled_pairs: (spr_id, cad_id, is_match).
    """
    rng = np.random.RandomState(seed)
    houses = [str(rng.randint(1, 200)) for _ in range(n_base)]
    buildings = ["" if rng.rand() < 0.5 else str(rng.randint(1, 9)) for _ in range(n_base)]
    streets = []
    seen: set[str] = set()
    while len(streets) < n_base:
        s = _street(rng)
        if s not in seen:
            seen.add(s)
            streets.append(s)

    cad_rows = []
    for i in range(n_base):
        cad_rows.append(
            {
                "ADDRESS_ID": f"CAD{i:06d}",
                "STREET_NAME": streets[i],
                "HOUSE": houses[i],
                "BUILDING": buildings[i],
            }
        )

    rename_cycle = list(LIVE_RENAMES)
    spr_rows, labels = [], []
    for i in range(n_base):
        sid = f"SPR{i:06d}"
        if rng.rand() < dup_rate:
            r = rng.rand()
            if r < 0.1 and rename_cycle:
                old, new = rename_cycle[i % len(rename_cycle)]
                # CAD carries the new official name, SPR the old one
                cad_rows[i]["STREET_NAME"] = new
                street = old
            else:
                kind = rng.randint(0, 7)
                street = _corrupt_street(rng, streets[i], kind)
            spr_rows.append(
                {
                    "ADDRESS_ID": sid,
                    "STREET_NAME": street,
                    "HOUSE": houses[i] if rng.rand() < 0.8 else f" {houses[i]}.",
                    "BUILDING": buildings[i],
                }
            )
            labels.append({"spr_id": sid, "cad_id": f"CAD{i:06d}", "is_match": True})
        else:
            # negative: same house+building block as base i, unrelated street
            street = _street(rng)
            spr_rows.append(
                {
                    "ADDRESS_ID": sid,
                    "STREET_NAME": street,
                    "HOUSE": houses[i],
                    "BUILDING": buildings[i],
                }
            )
            labels.append({"spr_id": sid, "cad_id": f"CAD{i:06d}", "is_match": False})

    # seeded NULLs exercise fillna/completeness paths
    for row in spr_rows:
        if rng.rand() < 0.02:
            row["BUILDING"] = None

    spr = spark.createDataFrame(pd.DataFrame(spr_rows).astype(object))
    cad = spark.createDataFrame(pd.DataFrame(cad_rows).astype(object))
    pairs = spark.createDataFrame(pd.DataFrame(labels))
    return spr, cad, pairs


# ---------------------------------------------------------------------------
# north-rule repos table
# ---------------------------------------------------------------------------

_LANGS = ["py", "java", "go", "js", "rs", "c"]
_LANG_P = [0.55, 0.15, 0.10, 0.10, 0.06, 0.04]  # skewed on purpose
_KEYWORDS = ["def", "return", "class", "import", "for", "while", "if", "else",
             "try", "except", "with", "lambda", "yield", "assert", "raise"]


def _content(rng: np.random.RandomState, n_lines: int = 12) -> str:
    lines = []
    for _ in range(n_lines):
        kw = _KEYWORDS[rng.randint(0, len(_KEYWORDS))]
        ident = "v" + "".join(chr(97 + c) for c in rng.randint(0, 26, rng.randint(3, 8)))
        num = rng.randint(0, 10_000)
        lines.append(f"{kw} {ident}_{num}(x): return x + {num}")
    return "\n".join(lines)


def _corrupt_content(rng: np.random.RandomState, c: str, kind: int) -> str:
    """Near-duplicate classes: 0 exact; 1 whitespace churn; 2 comment
    insertion; 3 line reorder; 4 small edit."""
    lines = c.split("\n")
    if kind == 1:
        return "\n".join("  " + ln + " " for ln in lines)
    if kind == 2:
        i = rng.randint(0, len(lines))
        lines.insert(i, f"# note {rng.randint(0, 999)}")
        return "\n".join(lines)
    if kind == 3:
        idx = list(range(len(lines)))
        rng.shuffle(idx)
        return "\n".join(lines[i] for i in idx)
    if kind == 4:
        i = rng.randint(0, len(lines))
        lines[i] = lines[i] + "  # edited"
        return "\n".join(lines)
    return c


def make_repos(
    spark: SparkSession,
    n_base: int = 400,
    dups_per_base: int = 2,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (repos, labeled_pairs).

    Each base file spawns ``dups_per_base`` near-duplicate copies placed in
    other repos (forks/vendoring). labeled_pairs holds all intra-class
    pairs (is_match=True) plus an equal count of seeded cross-class
    negatives.
    """
    rng = np.random.RandomState(seed)
    rows, labels = [], []
    ids_by_class: list[list[str]] = []
    for b in range(n_base):
        base = _content(rng)
        lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]
        cls = []
        for d in range(dups_per_base + 1):
            content = base if d == 0 else _corrupt_content(rng, base, rng.randint(0, 5))
            # one commit touches MANY files (shared across all classes for
            # a generation) — real-world shape, and the regression trap
            # for the round-1 file_id=commit bug: any pipeline keying on
            # commit alone merges every file of a generation into one
            # cluster and fails the F1 gate
            commit = hashlib.sha1(f"{seed}:{d}".encode()).hexdigest()
            repo = f"org{b % 97}/proj{b % 31}_{d}"
            path = f"src/mod{b % 53}/file_{b}.{lang}"
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": content,
                }
            )
            # surrogate identity — must equal repos_pipeline.file_id_col()
            cls.append(hashlib.sha256(f"{repo}|{path}|{commit}".encode()).hexdigest())
        ids_by_class.append(cls)
        for i in range(len(cls)):
            for j in range(i + 1, len(cls)):
                labels.append({"left_id": cls[i], "right_id": cls[j], "is_match": True})
    # negatives: consecutive-class cross pairs
    for b in range(n_base - 1):
        labels.append(
            {"left_id": ids_by_class[b][0], "right_id": ids_by_class[b + 1][0], "is_match": False}
        )
    repos = spark.createDataFrame(pd.DataFrame(rows))
    pairs = spark.createDataFrame(pd.DataFrame(labels))
    return repos, pairs
