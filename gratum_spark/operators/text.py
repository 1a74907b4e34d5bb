"""Text analysis operators for corpus curation at scale.

All expression-only (JVM, codegen'd): language-ID (characteristic-word
heuristic), quality scoring, token counting, document fingerprinting.
Each returns a DataFrame transform usable standalone or via
Pipeline.apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import words

__all__ = [
    "token_stats_named",
    "quality_score",
    "lang_id",
    "fingerprint",
    "DEFAULT_LANG_WORDS",
]

# Characteristic-word lists for the heuristic language identifier.
# For real text these would be per-language stopword lists; the shape of
# the operator (argmax over per-language hit counts, alphabetical
# tie-break => fully deterministic) is what matters.
DEFAULT_LANG_WORDS: dict[str, list[str]] = {
    "de": ["customer", "hash", "join", "row", "column"],
    "en": ["hash", "order", "table", "window", "row"],
    "es": ["slow", "agg", "hash", "merge", "vector"],
    "fr": ["scan", "data", "batch", "query", "small"],
    "zh": ["join", "small", "customer", "row", "column"],
}


def token_stats_named(col_name: str) -> dict[str, Column]:
    """Whitespace tokens + a BPE-ish regex token count (alpha runs,
    digit runs, single other chars)."""
    text = F.col(col_name)
    return {
        "ws_tokens": F.size(F.split(F.trim(text), "\\s+")),
        "bpe_tokens": F.size(
            F.expr(f"regexp_extract_all({col_name}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ),
    }


def quality_score(col_name: str) -> dict[str, Column]:
    """Heuristic quality signals: char/word counts, mean word length,
    non-alpha ratio, stopword ratio. Deterministic doubles (single
    division at the end — identical IEEE ops in any engine)."""
    text = F.col(col_name)
    n_chars = F.length(text)
    w = words(text)
    n_words = F.size(w)
    alpha_chars = F.length(F.regexp_replace(text, "[^a-z]", ""))
    stop_hits = F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in ["the", "a", "of", "and"]])))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": alpha_chars.cast("double") / n_words.cast("double"),
        "non_alpha_ratio": (n_chars - alpha_chars - (n_words - 1)).cast("double")
        / n_chars.cast("double"),
        "stop_kinds": stop_hits,
    }


def lang_id(
    col_name: str, lang_words: dict[str, list[str]] | None = None
) -> Column:
    """Predict language: argmax over per-language characteristic-word
    intersection counts; alphabetical-first tie-break (deterministic).
    Expression-only — array_intersect per language + a CASE chain."""
    lw = lang_words or DEFAULT_LANG_WORDS
    w = words(F.col(col_name))
    scores = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in wl])))
        for lang, wl in sorted(lw.items())
    }
    m = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    pred = None
    for lang in sorted(scores):  # alphabetical tie-break
        cond = scores[lang] == m
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred


def fingerprint(col_name: str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed). md5 is portable across engines,
    unlike xxhash64 — use this when fingerprints must be comparable
    outside Spark."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col_name))), "\\s+", " ")
    return F.md5(norm)


def apply_text_analysis(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Convenience: id + all text-analysis columns in one select."""
    ts = token_stats_named(text_col)
    qs = quality_score(text_col)
    return df.select(
        F.col(id_col),
        ts["ws_tokens"].alias("ws_tokens"),
        ts["bpe_tokens"].alias("bpe_tokens"),
        qs["n_words"].alias("n_words"),
        qs["mean_word_len"].alias("mean_word_len"),
        lang_id(text_col).alias("pred_lang"),
        fingerprint(text_col).alias("fingerprint"),
    )
