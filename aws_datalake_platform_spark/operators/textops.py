"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd, no Python in the hot
path) so a 100 TB corpus pass is a single narrow projection. Each has an
exact DuckDB-SQL equivalent registered in plans/llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalize_text

# BPE-ish tokenizer regex: alnum runs or single non-space symbols —
# approximates subword pre-tokenization without an external vocab.
TOKEN_REGEX = r"[a-z0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "que", "y", "en", "un", "es", "se", "no", "los"],
    "fr": ["le", "la", "et", "un", "est", "que", "pour", "dans", "ce", "les"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual symbols."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(TOKEN_REGEX), 0))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_digit = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(F.length(c) > 0, n_digit / F.length(c)).otherwise(F.lit(0.0))


def avg_token_len(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, n_sw / F.size(t)).otherwise(F.lit(0.0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Raw stopword hit count for one language (language-ID signal)."""
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(t, lambda x: F.array_contains(sw, x)))


def language_id(col: Column | str) -> Column:
    """Stopword-vote language ID over {en,de,es,fr}; 'und' when no list
    scores a hit. Deterministic preference order on ties: en,de,es,fr."""
    s = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] > 0), "en"
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )


def quality_class(text: Column | str, n_chars: Column | str) -> Column:
    """3-way quality classification for corpus filtering — the text-corpus
    analogue of the reference's sensor quality CASE (transform.py:238-251):
    HIGH needs length AND structure; MED needs length; else LOW."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    return (
        F.when((n >= 300) & (token_count(t) >= 50) & (punct_ratio(t) < 0.1), "HIGH")
        .when(n >= 150, "MED")
        .otherwise("LOW")
    )


def bag_fingerprint(col: Column | str) -> Column:
    """Order-invariant document fingerprint: md5 over the sorted distinct
    token set of the normalized text. Word-shuffled duplicates collide on
    it — an O(1)-per-doc shuffle-dup detector (vs pairwise Jaccard)."""
    toks = F.split(normalize_text(col), " ")
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
