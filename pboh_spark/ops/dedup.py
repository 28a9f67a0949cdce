"""Deduplication operators over a (doc_id, text) corpus.

Five strategies, cheapest-first — the standard large-corpus dedup ladder:

* exact        — hash-groupBy on md5(text); one shuffle, no pairs.
* ngram-jaccard — word-shingle Jaccard on candidate pairs.
* minhash-LSH  — shingle → minhash → banded keys → bucket self-join;
  the pair space is ~Σ bucket², not n² (same shape as blocking.py).
* simhash      — 64-bit sign-of-weighted-sum fingerprint; near-dups are
  fingerprints at small Hamming distance, found by banding the bits.
* embedding-cosine — near-dup by vector similarity (see simsearch.py).

All hashes derive from md5 hex prefixes so every step is reproducible in
plain SQL (the DuckDB oracle runs the same computation). Everything is
column expressions — dedup never leaves the JVM.

Scale notes: exact dedup at 100 TB is one hash-partitioned shuffle on a
64-hex key (AQE coalesces); LSH bucket joins salt-cap oversized buckets
exactly like blocking.salt_and_cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-prefix → bigint: identical in Spark (conv) and DuckDB ('0x'||…)::bigint
def _h32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, content_hash, canonical_id, is_dup) — canonical = min
    doc_id per hash group. One groupBy; at scale this is the cheapest
    full-corpus dedup and always runs first."""
    h = docs.select(
        "doc_id", F.md5(F.col(text_col)).alias("content_hash")
    )
    canon = h.groupBy("content_hash").agg(F.min("doc_id").alias("canonical_id"))
    return (
        h.join(canon, "content_hash")
        .withColumn("is_dup", F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "content_hash", "canonical_id", "is_dup")
    )


def word_shingles(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word k-grams of the lowercased text.
    Pure array ops: split → transform over a sliding index range →
    explode. (The n-gram primitive under jaccard/minhash/simhash.)"""
    from pboh_spark.util import ensure_parallelism

    words = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
    )
    # the shingle expansion is the expensive per-row work of every
    # consumer (jaccard/minhash/LSH); a single-partition input (one small
    # parquet row group) would run it all on one core — no-op at scale
    return (
        ensure_parallelism(docs)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.length("shingle") > 0)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    min_jaccard: float = 0.7,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard) for pairs above the threshold.

    Without ``candidate_pairs``, candidates come from sharing ≥1 shingle
    (exact containment blocking — fine for small corpora / tests; at
    100 TB feed LSH candidates in instead). Jaccard = |∩| / (|A|+|B|−|∩|)
    computed from per-doc distinct-shingle counts + per-pair overlap —
    aggregation-only, no array intersections at pair level.
    """
    sh = word_shingles(docs, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if candidate_pairs is None:
        a = sh.alias("a")
        b = sh.alias("b")
        overlap = (
            a.join(b, "shingle")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
            .agg(F.count("*").alias("inter"))
        )
    else:
        pa = candidate_pairs.select("doc_id_a", "doc_id_b")
        overlap = (
            pa.join(sh.withColumnRenamed("doc_id", "doc_id_a"), "doc_id_a")
            .join(
                sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed(
                    "shingle", "shingle_b"
                ),
                "doc_id_b",
            )
            .where(F.col("shingle") == F.col("shingle_b"))
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.count("*").alias("inter"))
        )
    na = sizes.select(
        F.col("doc_id").alias("doc_id_a"), F.col("n_sh").alias("na")
    )
    nb = sizes.select(
        F.col("doc_id").alias("doc_id_b"), F.col("n_sh").alias("nb")
    )
    return (
        overlap.join(na, "doc_id_a")
        .join(nb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def minhash_signatures_wide(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, mh_0 … mh_{n-1}) — universal-hash minhash over word
    shingles: the i-th hash of shingle s is (a_i·H(s) + b_i) mod p with
    H = md5-prefix int. All n minimums are computed as n agg columns in
    ONE groupBy over the shingle rows — the naive explode-per-hash shape
    shuffles n× the shingle data for the same answer."""
    import numpy as np

    rng = np.random.default_rng(seed)
    p = (1 << 31) - 1
    a = rng.integers(1, p, size=n_hashes).tolist()
    b = rng.integers(0, p, size=n_hashes).tolist()
    sh = word_shingles(docs, text_col, k).withColumn("h", _h32(F.col("shingle")))
    mins = [
        F.min((F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(p)).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, hash_idx, minhash) — long-form view of
    ``minhash_signatures_wide`` (stack-unpivoted; same one-shuffle plan).
    SQL-reproducible (no Python anywhere)."""
    wide = minhash_signatures_wide(docs, text_col, k, n_hashes, seed)
    stack = ", ".join(f"{i}, mh_{i}" for i in range(n_hashes))
    return wide.select(
        "doc_id",
        F.expr(f"stack({n_hashes}, {stack}) as (hash_idx, minhash)"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash: band key = hash of the
    band's signature rows; docs sharing any band key pair up. Returns
    (doc_id_a, doc_id_b, n_shared_bands). Band keys come straight off the
    wide signature row — no second shuffle between signatures and bands."""
    wide = minhash_signatures_wide(docs, text_col, k, n_hashes, seed)
    rows_per_band = n_hashes // n_bands
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.sort_array(
                            F.array(
                                *[
                                    F.col(f"mh_{bi * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ]
                            )
                        ),
                    )
                ).alias("band_key"),
            )
            for bi in range(n_bands)
        ]
    )
    banded = wide.select(
        "doc_id", F.explode(bands_arr).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — per-word md5-derived bit pattern, summed sign
    per bit position (weights = term frequency). explode(words) →
    explode(bit positions) → two aggs. Near-dups differ in few bits."""
    words = F.explode(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit(""))
    )
    wh = docs.select("doc_id", words.alias("word")).withColumn(
        "h", _h32(F.col("word"))
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
    contrib = wh.select("doc_id", "h", bit.alias("bit")).withColumn(
        "v", F.expr("CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END")
    )
    return (
        contrib.groupBy("doc_id", "bit")
        .agg(F.sum("v").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("bitval") * F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
            ).alias("simhash")
        )
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    n_bits: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs:
    (id_a, id_b, cosine) with cosine ≥ ``threshold`` and id_a < id_b.

    Two candidate-generation modes:
    * ``use_lsh=True`` (default — the 100-TB path) — sign-LSH bucket
      self-join (simsearch.hyperplane_signatures): candidates only share
      a (table, signature) bucket, so the pair space is Σ bucket²
      instead of n². Recall depends on the angular threshold: true
      near-dups (cosine ≳ 0.9, angle ≲ 26°) collide with probability
      (1 − θ/π)^n_bits per table; raise n_tables for higher recall.
    * ``use_lsh=False`` — all-pairs self join. Quadratic: strictly the
      exact VERIFICATION baseline (recall ground truth for the LSH
      mode), or the right plan only when one side is provably bounded
      (e.g. one day's delta against itself).
    """
    from pboh_spark.ops.simsearch import arrow_cosine_pairs, hyperplane_signatures

    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if use_lsh:
        if dim is None:
            # Spark array columns carry no width in the schema, so sniffing
            # costs a driver-side job; callers that know the embedding dim
            # should pass it to keep the query single-job.
            dim = len(vectors.select(vec_col).first()[0])
        sigs = hyperplane_signatures(
            vectors, dim, n_bits=n_bits, n_tables=n_tables, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        cand = (
            sigs.alias("x")
            .join(sigs.alias("y"), ["table", "sig"])
            .where(F.col("x.vid") < F.col("y.vid"))
            .select(
                F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b")
            )
            .distinct()
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    # Arrow cosine re-rank (simsearch.arrow_cosine_pairs): identical
    # IEEE fold to the former with_cosine expression, vectorized — the
    # interpreted HOF aggregates were ~0.8 s per 57k pairs here
    return (
        arrow_cosine_pairs(pairs, "va", "vb", ("id_a", "id_b"), dim=dim)
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) — near-dup pairs whose simhash
    fingerprints differ in ≤ ``max_hamming`` bits.

    Banded candidate generation: the fingerprint splits into ``n_bands``
    contiguous bit-bands and candidates must share at least one band
    verbatim. Pigeonhole: with ``max_hamming < n_bands`` the ≤ k
    differing bits cannot touch every band, so recall over the Hamming
    ball is EXACT — the candidate join only prunes, never misses.
    Verification is one codegen'd expression (bit_count of xor); the
    pair space is Σ band-bucket², not n² — the classic simhash dedup
    shape at corpus scale.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            "for exact banded recall (pigeonhole)"
        )
    if bits % n_bands:
        raise ValueError("bits must divide evenly into n_bands")
    w = bits // n_bands
    mask = (1 << w) - 1
    sh = simhash(docs, text_col, bits)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * w)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id", "simhash",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )
