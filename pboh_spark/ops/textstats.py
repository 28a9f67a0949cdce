"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (codegen'd) and all
reproducible in plain SQL — each has a DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pboh_spark.util import ensure_parallelism

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "that", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "de", "que", "es", "para", "con", "una", "por"],
}


def _words(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_words_bpe_ish) — whitespace tokens plus a
    BPE-ish subword estimate: alnum runs + punctuation marks each count
    (the regexp split both engines implement identically)."""
    words = _words(text_col)
    bpe_ish = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda w: w != F.lit(""),
        )
    ) + F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]+", ""))
    return ensure_parallelism(docs, trigger_ratio=0.25).select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        bpe_ish.cast("int").alias("n_subwords"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_word_len, punct_ratio,
    stopword_ratio, quality) — the classic cheap quality filters
    (C4/Gopher-style length & symbol heuristics)."""
    words = _words(text_col)
    n_tokens = F.size(words)
    n_chars = F.length(F.col(text_col))
    n_punct = F.length(
        F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", "")
    )
    stop = F.lit(LANG_PROFILES["en"]).cast("array<string>")
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    avg_wl = (
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
        / F.greatest(n_tokens, F.lit(1))
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    quality = (
        F.when(n_tokens < 5, 0.0)
        .when(punct_ratio > 0.3, 0.2)
        .otherwise(
            F.least(
                F.lit(1.0),
                0.5 * stop_ratio * 5 + 0.5 * F.least(n_tokens / 100.0, F.lit(1.0)),
            )
        )
    )
    return ensure_parallelism(docs, trigger_ratio=0.25).select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_wl, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax over per-language
    stopword-hit ratios; 'und' when nothing matches. Deterministic
    tie-break on language code."""
    words = _words(text_col)
    n = F.greatest(F.size(words), F.lit(1))
    scores = []
    for lang, prof in sorted(LANG_PROFILES.items()):
        p = F.lit(prof).cast("array<string>")
        hits = F.size(F.filter(words, lambda w: F.array_contains(p, w)))
        scores.append(F.struct((hits / n).alias("s"), F.lit(lang).alias("l")))
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return ensure_parallelism(docs, trigger_ratio=0.25).select(
        "doc_id",
        F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und")).alias("lang_pred"),
        F.round(best["s"], 6).alias("lang_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp64) — order-sensitive rolling document fingerprint:
    fold word hashes h_i with fp = (fp·31 + h_i) mod (2^56−5) — keeps fp·31+h inside int64 (no ANSI overflow). An
    order-independent content id would be md5(text); this one changes
    under any word reorder (the plagiarism-detection shape)."""
    p = (1 << 56) - 5
    words = _words(text_col)
    wh = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("bigint")
    )
    fp = F.aggregate(
        wh, F.lit(0).cast("bigint"), lambda acc, h: (acc * 31 + h) % F.lit(p)
    )
    return ensure_parallelism(docs, trigger_ratio=0.25).select("doc_id", fp.alias("fp64"))
