"""Text analysis for LLM data pipelines: language-ID, quality scoring, token
counting, document fingerprinting.

Everything here is a pure column expression (`pyspark.sql.functions`) —
whole-stage codegen, no Python workers, linear scaling with executors. At
100 TB these run as a single map-only pass over the corpus (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword sets for the n-gram/stopword-overlap heuristic.
# Deliberately tiny and deterministic (both engines can evaluate the same
# lists); a production system would load larger lexicons the same way.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "por", "con"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "pour", "que", "dans"),
}

#: BPE-ish tokenizer regex: word pieces, digit runs, single punctuation marks.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def words(col: Column | str) -> Column:
    """Whitespace word split (empty tokens removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


def word_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """BPE-ish token count: lowercase, then count word-piece/digit/punct
    matches of :data:`TOKEN_RE` — a cheap deterministic proxy for a real BPE
    tokenizer's token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of distinct stopwords of ``lang`` present in the text."""
    return F.size(
        F.array_intersect(
            words(F.lower(F.col(col) if isinstance(col, str) else col)),
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
        )
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-overlap language ID: argmax of per-language distinct-stopword
    hits; ``und`` (undetermined) when no language scores a hit.

    Ties break by language-code order (deterministic). This is the classic
    cheap corpus-filter heuristic (a production stack would swap in fastText
    via a pandas UDF with the same column contract).
    """
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # iterate in reverse so earlier languages win ties via later overwrite
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when(hits[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def quality_score(col: Column | str) -> Column:
    """Composite document quality score in [0,1]:

    0.25·length_ok + 0.25·(1-punct_ratio) + 0.25·alpha_ratio + 0.25·mean_word_len_ok

    - length_ok: 1 if 20..5000 chars
    - punct_ratio: non-alphanumeric-non-space chars / chars
    - alpha_ratio: alphabetic chars / chars
    - mean_word_len_ok: 1 if mean word length in [3, 10]

    All ratios are exact integer-count divisions → cross-engine deterministic.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", "")).cast("double")
    n_words = word_count(c).cast("double")
    mean_wl = F.when(n_words > 0, (n - (n_words - 1)) / n_words).otherwise(F.lit(0.0))
    length_ok = F.when((n >= 20) & (n <= 5000), 1.0).otherwise(0.0)
    mwl_ok = F.when((mean_wl >= 3) & (mean_wl <= 10), 1.0).otherwise(0.0)
    safe_n = F.when(n > 0, n).otherwise(F.lit(1.0))
    return (
        0.25 * length_ok
        + 0.25 * (1.0 - n_punct / safe_n)
        + 0.25 * (n_alpha / safe_n)
        + 0.25 * mwl_ok
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the canonicalized text
    (lowercased, whitespace collapsed, trimmed). The exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))
