"""Stage 1 — normalization + mention extraction (pure column expressions).

Reference parity:
* lowercase-only normalization — utils/Normalizer.scala:9-11,
  md/Mention.scala:16 (``F.lower``)
* tokenization with delimiter split + token cleanup —
  context/TextSplittingInWords.scala:15-45 (``regexp_replace`` + ``split``
  + array ops; no Porter stemming — blocking needs determinism, not stems,
  see SURVEY.md F4)
* stopword removal — context/StopWords.scala:6-70 (``array_except``)
* mention = Capitalized token sequence planted by synth (the datasets give
  the reference its mention spans, eval/datasets/AIDA.scala:21; we extract
  ours declaratively with ``regexp_extract_all``)

Everything here stays inside whole-stage codegen — zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Capitalized word, optionally followed by more capitalized words
# ("J Smith" has a single-letter token → [A-Z][a-z]*).
MENTION_RE = r"[A-Z][a-z]*(?: [A-Z][a-z]*)*"

# small stemless stoplist (≙ context/StopWords.scala — theirs is stemmed;
# ours only needs to stabilize context features, not match it verbatim)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "with",
    "is", "was", "are", "it", "this", "that", "we", "you", "i", "he", "she",
    "they", "be", "as", "at", "by", "from", "about", "into", "then", "there",
]


def normalize_turns(transcripts: DataFrame) -> DataFrame:
    """Adds ``text_norm`` (lowercase ≙ Normalizer.scala:9-11) and
    ``tokens`` (split + stopword-filtered ≙ TextSplittingInWords.scala:15-45)
    while preserving ``text`` byte-identical (per-row invariant)."""
    toks = F.split(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]+", " "), r"\s+"
    )
    toks = F.filter(toks, lambda t: t != F.lit(""))
    return (
        transcripts.withColumn("text_norm", F.lower(F.col("text")))
        .withColumn("tokens", F.array_except(toks, F.lit(STOPWORDS).cast("array<string>")))
    )


# HTML entities the link normalizer resolves (the reference delegates to
# StringEscapeUtils.unescapeHtml4 — full HTML4 table; transcripts only ever
# carry this core subset, and the subset keeps the transform a pure
# column-expression chain with an exact DuckDB oracle)
HTML_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
]
# percent-escapes handled without a UDF (same subset both engines)
PCT_ESCAPES = [
    ("%20", " "), ("%26", "&"), ("%27", "'"), ("%28", "("), ("%29", ")"),
    ("%2C", ","), ("%2c", ","),
]


def unescape_html(col):
    """One unescapeHtml4 pass (subset) as chained replace — codegen'd."""
    for ent, ch in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def process_target_link(col):
    """The F2 link normalizer — utils/Normalizer.scala:15-27
    (processTargetLink): DOUBLE html-unescape (their input is
    double-escaped wiki markup), underscore→space, trim, capitalize first
    letter, then percent-decode when a '%' survives. All column
    expressions (whole-stage codegen), no Python."""
    c = unescape_html(unescape_html(col))
    c = F.trim(F.replace(c, F.lit("_"), F.lit(" ")))
    cap = F.concat(
        F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 1 << 30)
    )
    decoded = cap
    for esc, ch in PCT_ESCAPES:
        decoded = F.replace(decoded, F.lit(esc), F.lit(ch))
    return F.when(cap.contains("%"), F.trim(decoded)).otherwise(cap)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """Stage-1 output (FIXTURES.md §3):
    (conv_id, turn_idx, mention_id, ngram, surface, offset, length, tokens).

    ``ngram`` is the normalized mention (lowercase), the probe key into
    name statistics — ≙ Mention.scala:13-35 + Normalizer.scala:9-11.
    ``mention_id`` is a deterministic hash of the identifying quadruple
    (stable under any partitioning; used as the cluster-id tie-break).
    """
    # exact per-occurrence offsets: text = seg0+m0+seg1+m1+…+segN where
    # segs = split(text, RE) and ms = regexp_extract_all(text, RE), so
    # offset(m_k) = Σ len(seg_0..k) + Σ len(m_0..k-1). instr() would
    # return the FIRST occurrence for every repeat ("Alice met Alice").
    segs = F.split(F.col("text"), MENTION_RE)
    surfs = F.expr(f"regexp_extract_all(text, '{MENTION_RE}', 0)")
    seg_len = lambda k: F.aggregate(  # noqa: E731
        F.slice(segs, 1, k), F.lit(0), lambda a, s: a + F.length(s)
    )
    m_len = lambda k: F.aggregate(  # noqa: E731
        F.slice(surfs, 1, k), F.lit(0), lambda a, s: a + F.length(s)
    )
    # guard: sequence(1, 0) would count DOWN ([1,0]) on mention-less turns
    offsets = F.when(
        F.size(surfs) > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(surfs)),
            lambda k: seg_len(k) + m_len(k - 1),
        ),
    ).otherwise(F.array().cast("array<int>"))
    m = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.arrays_zip(surfs, offsets)).alias("pos", "z"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "pos",
            F.col("z.0").alias("surface"),
            F.col("z.1").alias("offset"),
        )
        .withColumn("ngram", F.lower(F.col("surface")))
        .withColumn("length", F.length("surface"))
        .withColumn(
            "mention_id",
            F.xxhash64("conv_id", "turn_idx", "pos", "ngram"),
        )
        .withColumn("tokens", F.split(F.col("ngram"), " "))
        .drop("text", "pos")
    )
    return m.select(
        "conv_id", "turn_idx", "mention_id", "ngram", "surface",
        "offset", "length", "tokens",
    )


def verify_text_equality(transcripts: DataFrame, output: DataFrame) -> int:
    """Per-row invariant from BASELINE.json input_hint: per-turn text
    equality under stable (conv_id, turn_idx) ordering. Returns the number
    of violating rows (0 = pass). Implemented as a full outer join on the
    ordering key + text comparison (distributed; no driver collect)."""
    a = transcripts.select("conv_id", "turn_idx", F.col("text").alias("t_in"))
    b = output.select("conv_id", "turn_idx", F.col("text").alias("t_out"))
    j = a.join(b, ["conv_id", "turn_idx"], "full_outer")
    return j.where(
        F.col("t_in").isNull()
        | F.col("t_out").isNull()
        | (F.col("t_in") != F.col("t_out"))
    ).count()
