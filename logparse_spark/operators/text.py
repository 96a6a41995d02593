"""Text-analysis operators for training-data pipelines — all pure JVM
column expressions (whole-stage codegen; zero Python in the hot path).

- language ID: stopword-profile n-gram heuristic;
- quality scoring: length / punctuation / stopword-ratio features;
- token counting: whitespace and BPE-ish regex segmentations;
- document fingerprinting: content hash + winnowing-style shingle min.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (heuristic language ID)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "por", "con"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "que", "pour"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
}


def words_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (array_intersect is codegen'd)."""
    w = F.array_distinct(words_col(text))
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over language profiles; 'und' when no profile hits."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (stable CASE WHEN chain)
    for lang in reversed(list(scores)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(words_col(text), lambda w: w != ""))


# BPE-ish pre-tokenization: word pieces, numbers, and non-space symbols
# (the GPT-2 pretokenizer shape, simplified to a POSIX-safe regex)
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    return F.coalesce(F.regexp_count(text, F.lit(BPE_REGEX)), F.lit(0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-signal columns (composable with a threshold filter)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = whitespace_token_count(t)
    stop_hits = F.greatest(*lang_scores(t).values())
    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_words": n_words,
            "q_mean_word_len": F.when(n_words > 0, n_chars / n_words),
            "q_punct_ratio": F.when(
                n_chars > 0, F.regexp_count(t, F.lit(r"[^\w\s]")) / n_chars
            ),
            "q_stopword_hits": stop_hits,
            "q_upper_ratio": F.when(
                n_chars > 0, F.regexp_count(t, F.lit(r"[A-Z]")) / n_chars
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Single [0,1] quality score from the features (simple monotone mix)."""
    qf = quality_features(df, text_col)
    score = (
        F.least(F.col("q_n_words") / 50.0, F.lit(1.0)) * 0.4
        + F.least(F.col("q_stopword_hits") / 5.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.coalesce(F.col("q_punct_ratio"), F.lit(0.0)) * 4.0, F.lit(1.0))) * 0.2
    )
    return qf.withColumn("quality", F.round(score, 6))


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint of whitespace-normalized text."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def shingle_fingerprint(text: Column, n: int = 4) -> Column:
    """Winnowing-flavored rolling fingerprint: min xxhash64 over char
    n-gram shingles — robust to local edits, pure SQL."""
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(text) - n, F.lit(0))),
        lambda i: text.substr(i + 1, F.lit(n)),
    )
    return F.array_min(F.transform(grams, lambda g: F.abs(F.xxhash64(g))))
