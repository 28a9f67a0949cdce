"""Benchmark decontamination — n-gram overlap against a benchmark set.

The standard training-data hygiene pass (the reference has no analogue —
ours-beyond-reference, like the dedup ladder it composes with): a
document is contaminated when it shares long word n-grams with an
evaluation benchmark, and contaminated documents must be dropped or
flagged before training. Detection is exact n-gram membership, the
industry-default shape (n ≈ 8-13 contiguous words).

Spark shape: corpus documents explode to DISTINCT word n-grams
(``ops.dedup.word_shingles`` — the same primitive as the Jaccard/minhash
ladder, so one shingle table can serve both passes), the benchmark
explodes to its distinct n-gram SET, and one hash equi-join + per-doc
count yields each document's contaminated-n-gram count. The benchmark
side is benchmark-sized (thousands of eval documents — megabytes), so
the join broadcasts; the corpus side is one shuffle-free scan + one
groupBy on doc_id. At 100 TB the only corpus-scale costs are the
n-gram explode and that single aggregation — the same budget as exact
dedup. (A deployment joining on raw n-gram STRINGS ships long keys;
hash them to 128-bit first when the corpus is large — kept as strings
here because the join is then EXACT and trivially SQL-reproducible.)

Output is INTEGER-only (counts + an integer-arithmetic threshold flag,
``100·n_contaminated ≥ pct·n_ngrams``) — the same cross-engine trick as
the streamed scoring stage: no float ratio ever lands, so the values
hash identically in Spark and the DuckDB oracle (a rounded ratio like
1/32 = 0.03125 sits exactly on a 4dp rounding tie, where Spark HALF_UP
and DuckDB half-even diverge). The ratio is reconstructable downstream.

Short documents: a doc with fewer than ``n`` words yields exactly one
n-gram (its full text) — clamped slicing, identical in both engines —
so every document gets a row and a nonzero denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pboh_spark.ops.dedup import word_shingles


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_pct: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_ngrams, n_contaminated, is_contaminated) — per corpus
    document, the count of its distinct word ``n``-grams, how many of
    them appear anywhere in ``benchmark``'s n-gram set, and the integer
    threshold flag ``100·n_contaminated ≥ min_pct·n_ngrams``.

    ``docs`` and ``benchmark`` are (doc_id, text)-shaped; a document
    that IS in the benchmark scores n_contaminated == n_ngrams (flag
    true at any ``min_pct`` > 0) — run it over the pre-dedup corpus and
    the keep-list drops both the leak and its near-duplicates.
    """
    sh = word_shingles(docs, text_col, k=n)
    bench = word_shingles(benchmark, text_col, k=n).select("shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        sh.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)) * 100
                >= F.col("n_ngrams") * int(min_pct)
            ).alias("is_contaminated"),
        )
    )
