"""Text-analysis functions for a training-data pipeline, all-native where
possible (language-ID heuristics and rolling-hash fingerprints stay in
JVM expressions; nothing here crosses into Python).

* :func:`token_count_col` — whitespace tokens.
* :func:`bpe_ish_token_count_col` — a BPE-ish regex segmentation count
  (word pieces / numbers / punctuation runs), the standard pre-tokenizer
  approximation.
* :func:`quality_features` — length / punctuation ratio / stopword ratio
  / digit ratio / mean word length.
* :func:`lang_id_col` — n-gram/stopword-list heuristic over a small set
  of languages (expressible as native CASE over stopword-hit counts).
* :func:`fingerprint_col` — polynomial rolling hash over normalized
  tokens (shift-invariant document fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny public stopword seed-lists (top function words) per language
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "are"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"),
    "es": ("el", "la", "de", "que", "los", "en", "por", "con", "para", "una"),
    "hy": ("եվ", "է", "որ", "այս", "են", "նա", "իր", "մի", "չի", "դա"),
}


def tokens_col(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count_col(col: Column) -> Column:
    return F.size(tokens_col(col))


#: BPE-ish pre-tokenizer pattern: letter runs | digit runs | single punct
BPE_PATTERN = r"(\p{L}+|\p{N}+|[^\p{L}\p{N}\s])"


def bpe_ish_token_count_col(col: Column) -> Column:
    """Count of BPE-ish pieces: letter runs, digit runs, single punct."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(1)))


def quality_features(col: Column) -> dict[str, Column]:
    """Feature columns for a document-quality score."""
    length = F.length(col)
    toks = tokens_col(col)
    n_tokens = F.size(toks)
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    n_digit = F.regexp_count(col, F.lit(r"[0-9]"))
    words = F.filter(toks, lambda t: t.rlike(r"^\p{L}+$"))
    mean_word_len = F.when(
        F.size(words) > 0,
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / F.size(words),
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": length,
        "n_tokens": n_tokens,
        "punct_ratio": F.when(length > 0, n_punct.cast("double") / length).otherwise(0.0),
        "digit_ratio": F.when(length > 0, n_digit.cast("double") / length).otherwise(0.0),
        "mean_word_len": mean_word_len,
    }


def quality_score_col(col: Column) -> Column:
    """Composite heuristic in [0,1]: long enough, not punctuation soup,
    not digit soup, plausible word lengths."""
    f = quality_features(col)
    len_ok = F.least(f["n_chars"].cast("double") / 200.0, F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 4.0)
    digit_ok = F.greatest(F.lit(0.0), F.lit(1.0) - f["digit_ratio"] * 4.0)
    wl = f["mean_word_len"]
    word_ok = F.when((wl >= 2.5) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok + punct_ok + digit_ok + word_ok) / 4.0, 6)


def stopword_hits_col(col: Column, lang: str) -> Column:
    """How many of the language's stopwords appear as tokens."""
    words = STOPWORDS[lang]
    toks = F.transform(tokens_col(F.lower(col)), lambda t: F.regexp_replace(t, r"[^\p{L}]", ""))
    return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))


def lang_id_col(col: Column) -> Column:
    """argmax of stopword hits across languages; 'und' if no hits.
    Deterministic tie-break: language list order."""
    hits = [(lang, stopword_hits_col(col, lang)) for lang in STOPWORDS]
    best = F.greatest(*[h for _, h in hits])
    expr = F.when(best <= 0, F.lit("und"))
    for lang, h in hits:
        expr = expr.when(h == best, F.lit(lang))
    return expr


def fingerprint_col(col: Column, base: int = 1_000_003, mod: int = (1 << 61) - 1) -> Column:
    """Polynomial rolling hash over normalized tokens: sum(h(tok_i) *
    base^i) mod m — order-sensitive document fingerprint, all-native via
    aggregate over a struct accumulator."""
    toks = tokens_col(F.lower(F.trim(col)))
    acc0 = F.struct(F.lit(0).cast("decimal(38,0)").alias("h"), F.lit(1).cast("decimal(38,0)").alias("p"))
    mod_d = F.lit(mod).cast("decimal(38,0)")
    base_d = F.lit(base).cast("decimal(38,0)")
    merged = F.aggregate(
        toks,
        acc0,
        lambda acc, t: F.struct(
            ((acc["h"] + (F.pmod(F.xxhash64(t), F.lit(mod)).cast("decimal(38,0)") * acc["p"]) % mod_d) % mod_d).alias("h"),
            ((acc["p"] * base_d) % mod_d).alias("p"),
        ),
    )
    return merged["h"].cast("long")


def tfidf_scores(
    docs,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
):
    """TF-IDF relevance of every document against a bag of query
    ``terms``: ``score(d) = sum_t tf(t, d) * ln(N / df(t))`` over the
    query terms only, smallest-footprint formulation for a corpus scan:

    * tokenize natively (``lower`` + split on ``[^a-z0-9]+``) and filter
      the exploded stream to the query terms BEFORE any aggregation —
      the shuffle carries only (id, matched term) rows, never the full
      token stream, so a 100 TB corpus shuffles megabytes, not itself;
    * ``df(t)`` (documents containing t) and the corpus size ``N`` are
      query-term-sized / single-row aggregates, joined back as
      broadcasts — no second corpus-wide shuffle.

    Returns (id_col, score) — one row per document containing at least
    one query term, score rounded to ``round_to`` for cross-engine
    comparability. Tokenization is deliberately ASCII-alnum (the BPE-ish
    pre-tokenizer family above handles richer segmentation); reference
    has no relevance scoring — this is a training-data-pipeline add
    (quality-weighted sampling, query-targeted corpus slices).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count_distinct(F.col(id_col)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("w", F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")))
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), round_to).alias("score"))
    )


# --- PII scrubbing -----------------------------------------------------------
# Pattern set kept to the Java-regex / RE2 COMMON subset (no lookaround,
# no backreferences) so the same literal patterns run in Spark and in any
# RE2-based oracle engine. Order matters and is part of the contract:
# URL before EMAIL (a URL can embed an @userinfo part), EMAIL before
# PHONE (digits inside an email must not be half-redacted).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\+\d[\d().\- ]{6,}\d", "<PHONE>"),
)


def scrub_pii_col(col: Column) -> Column:
    """Redact URLs / emails / IPv4s / +phone-numbers in one native
    regexp_replace chain (training-data hygiene pass; zero Python,
    pipelines through whole-stage codegen like any string expression)."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern hit counts BEFORE scrubbing (audit sidecar: how much
    was redacted, by kind). Counted independently on the raw text —
    overlaps (an email inside a URL) are counted under both kinds; the
    scrub chain itself resolves overlaps by its fixed order."""
    return {name: F.regexp_count(col, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


# --- repetition metrics ------------------------------------------------------

def alnum_tokens_col(col: Column) -> Column:
    """lower + split on non-[a-z0-9] runs, empties dropped — the shared
    tokenizer of tfidf_scores / word_ngrams_col (ASCII by design)."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def word_ngrams_col(col: Column, n: int) -> Column:
    """Array of word n-grams (space-joined, duplicates KEPT — repetition
    metrics need multiplicity). Short texts short-circuit to empty: the
    naive ``sequence(1, cnt-(n-1))`` yields a DESCENDING [1, 0] when the
    doc has fewer than n tokens (same landmine ngram_shingles guards)."""
    toks = alnum_tokens_col(col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), cnt - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_features(col: Column, ngram_n: int = 2) -> dict[str, Column]:
    """Within-document repetition metrics (the Gopher/MassiveText-style
    repetition filters, re-expressed natively):

    * ``dup_token_ratio``   — 1 - distinct/total tokens
    * ``dup_ngram_ratio``   — 1 - distinct/total word n-grams
    * ``top_token_ratio``   — frequency share of the most common token

    All three are array expressions over one tokenization — no shuffle,
    no UDF; a 100 TB corpus pays exactly one scan."""
    toks = alnum_tokens_col(col)
    cnt = F.size(toks)
    grams = word_ngrams_col(col, ngram_n)
    gcnt = F.size(grams)
    # top-token share as a run-length aggregate over the SORTED tokens —
    # O(n log n) per doc. The obvious transform(distinct, t ->
    # size(filter(toks, = t))) is O(distinct x total): quadratic on a
    # degenerate document, the exact doc class this filter exists to catch
    sorted_t = F.sort_array(toks)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    def _step(acc, t):
        run = F.when(acc["prev"].eqNullSafe(t), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )
    top = F.aggregate(sorted_t, acc0, _step)["best"]
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))  # noqa: E731
    return {
        "dup_token_ratio": F.round(safe(cnt - F.size(F.array_distinct(toks)), cnt), 6),
        "dup_ngram_ratio": F.round(safe(gcnt - F.size(F.array_distinct(grams)), gcnt), 6),
        "top_token_ratio": F.round(safe(F.coalesce(top, F.lit(0)), cnt), 6),
    }
