"""Token-window chunking — segmenting documents into training windows.

The packing step of a training-data pipeline (ours-beyond-reference,
like the rest of ``ops/``): long documents split into fixed-size
overlapping token windows so every window fits a model's context
length, with the overlap preserving cross-boundary continuations.

Spark shape: pure column expressions — whitespace token split, an
integer chunk-count formula, one ``posexplode`` over the per-doc chunk
index range, and clamped ``slice`` windows re-joined to text. No
shuffle at all: the pass is a single codegen projection whose output
rows ≈ corpus tokens / (chunk_size − overlap), and downstream writers
partition it however they like. Same corpus-scale budget as the text
stats.

Cross-engine discipline: tokenization is a literal single-space split
with empties filtered (NOT ``\\s+`` — the DuckDB oracle's string_split
has no regex mode, and whatever the split does to embedded newlines it
does identically in both engines because the rule is the same string
literal); chunk counts are integer arithmetic
(``(max(n − overlap, 1) + step − 1) div step``); and slices clamp at
the document tail in both engines, so the landed (chunk_idx, n_tokens,
chunk_text) values hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) — chunk ``i`` covers
    tokens [i·step, i·step + chunk_size) with step = chunk_size −
    overlap; the final chunk clamps at the document tail. Every
    document with ≥ 1 token yields ≥ 1 chunk; token-less documents
    yield none. Every token appears in ≥ 1 chunk, and consecutive
    chunks share exactly ``overlap`` tokens except at the tail
    (pytest-pinned reconstruction property).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != ""
    )
    n = F.size(words)
    n_chunks = (
        F.greatest(n - F.lit(overlap), F.lit(1)) + F.lit(step - 1)
    ).cast("bigint") / F.lit(step)
    n_chunks = F.floor(n_chunks).cast("int")
    exploded = docs.select(
        "doc_id",
        words.alias("__w"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_idx", "__i"
        ),
    )
    window = F.slice(
        F.col("__w"), F.col("chunk_idx") * step + 1, chunk_size
    )
    return (
        exploded.select(
            "doc_id",
            "chunk_idx",
            F.size(window).cast("bigint").alias("n_tokens"),
            F.array_join(window, " ").alias("chunk_text"),
        )
        .where(F.col("n_tokens") > 0)
    )
