"""PII detection and redaction over a (doc_id, text) corpus.

The training-data hygiene pass next to dedup and decontamination
(ours-beyond-reference): flag and strip personally identifiable
patterns before a corpus ships. Pattern-based detection over three
high-precision classes — emails, IPv4 addresses, phone-shaped numbers —
as pure regexp column expressions: no Python in the hot path, no
shuffle at all for the scan (one codegen'd projection; the only wire
cost is whatever the caller aggregates afterwards). At 100 TB that is
the cheapest possible full-corpus pass — the same budget as text stats.

Cross-engine discipline: the patterns use only the Java-regex ∩ RE2
intersection (character classes, bounded quantifiers, non-capturing
groups, ``\\b`` anchors — no lookaround, no backreferences), and the
contract query lands INTEGER counts + a boolean flag only, so the
DuckDB oracle computes the identical values. Redaction
(``redact_pii``) replaces matches with typed placeholder tokens; it is
pytest-verified rather than oracle-gated because hashing whole
rewritten documents would ride on incidental regexp_replace dialect
corners instead of the operator's semantics.

These are pattern classes, not a compliance guarantee: names,
addresses, and free-text identifiers need entity-level tooling (the
linkage pipeline itself is the building block for that); the op is the
standard cheap first pass that catches the mechanical leak classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java ∩ RE2: classes, bounded repeats, (?:), \b only
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

_CLASSES = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, has_pii) — per-document
    match counts for each pattern class (group 0 = full matches) and
    the any-class flag. One shuffle-free projection."""
    counts = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ).cast("bigint").alias(f"n_{name}")
        for name, pat, _tok in _CLASSES
    ]
    out = docs.select("doc_id", *counts)
    flag = None
    for name, _pat, _tok in _CLASSES:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Same schema as ``docs`` with every pattern match in ``text_col``
    replaced by its typed placeholder (``<EMAIL>``/``<IP>``/``<PHONE>``).
    Email replacement runs first so an address is not first mangled by
    the narrower classes. Pure regexp_replace chain — codegen, no
    shuffle."""
    col = F.col(text_col)
    for _name, pat, tok in _CLASSES:
        col = F.regexp_replace(col, pat, tok)
    return docs.withColumn(text_col, col)
