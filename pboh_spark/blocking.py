"""Stage 3 — blocking: candidate-key blocks + minhash-LSH fallback,
salted and size-capped.

The reference never blocks explicitly — every doc is tiny (≤25 mentions,
FewParamsLearning.scala:364) so it enumerates all pairs with nested loops
(CocitationMap.scala:24-39). At 10^12 turns the comparable-pair space
must be pruned *before* the join, so:

* **Candidate blocks** ("the reference blocking key"): a mention's
  normalized name probes the p̂(e|m) index exactly like
  MentEntsFreqIndexWrapper.scala:19-64 probes the crosswikis dictionary;
  two mentions are comparable iff their candidate sets intersect, so the
  block key IS the candidate entity id (top-10 runtime prune ≙ :53).
* **Minhash-LSH blocks**: fuzzy fallback for names the dictionary misses,
  the analogue of the reference's trigram-similarity nearest-key lookup
  (MentionEntitiesFrequencyIndex.scala:123-182). Char-3gram shingles →
  n minhashes → banded keys, computed by one Arrow-vectorized pandas UDF.
* **Skew handling** (north_rule: explicit, not AQE-only): block sizes are
  measured; blocks over ``cap`` are *salt-split* into ⌈n/cap⌉ sub-blocks
  (deterministic hash of mention_id) — bounding any single block's
  pair count at cap², the distributed analogue of the reference's
  doc-size guards (EvalOnDatasets.scala:172). Lost cross-salt recall is
  reported as a metric, never silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HASHES = 16
N_BANDS = 4  # 4 rows per band
_MERSENNE = np.uint64((1 << 61) - 1)

# DataFrames persisted internally (salt_and_cap); callers running many
# blocking passes in one session call release_persisted() between passes
# so the cached blocked tables don't accumulate for the session lifetime
_PERSISTED: list = []


def release_persisted() -> None:
    """Unpersist every DataFrame this module cached (blocking=False)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def _minhash_params(n_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
    return a, b


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _shingle_hashes(s: str, k: int = 3) -> np.ndarray:
    """Stable 64-bit FNV-1a hashes of char k-grams (padded) — python
    hash() is salted per-process. Vectorized: one codepoint array per
    string, then k fused xor/multiply passes over the sliding windows
    (uint64 wraps ≡ the & mask of the scalar form — keys byte-identical
    to the original per-char loop; asserted in tests)."""
    s = f"^{s}$"
    if len(s) < k:
        s = s.ljust(k, "_")
    codes = np.fromiter(map(ord, s), dtype=np.uint64, count=len(s))
    n = len(s) - k + 1
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ codes[j : j + n]) * _FNV_PRIME
    return h


def minhash_band_keys_udf(
    n_hashes: int = N_HASHES, n_bands: int = N_BANDS, seed: int = 42
):
    """pandas UDF: name → array of band keys ("b{i}:{h}").

    Arrow-batched: one Python invocation per ~10k rows; signatures are
    numpy matrix ops per batch (input_hint: no per-row Python UDFs)."""
    a, b = _minhash_params(n_hashes, seed)
    rows_per_band = n_hashes // n_bands

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bands(names: pd.Series) -> pd.Series:
        uniq = names.drop_duplicates()
        cache: dict[str, list[str]] = {}
        for s in uniq:
            sh = _shingle_hashes(s)
            # (n_hashes, n_shingles) universal hashing, min per row
            hv = (np.outer(a, sh) + b[:, None]) % _MERSENNE
            sig = hv.min(axis=1)
            keys = []
            for bi in range(n_bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                kh = np.uint64(0xCBF29CE484222325)
                for v in chunk:
                    kh = np.uint64(
                        (int(kh) ^ int(v)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
                    )
                keys.append(f"b{bi}:{int(kh) % (1 << 32)}")
            cache[s] = keys
        return names.map(cache)

    return bands


def candidate_blocks(
    mentions: DataFrame, name_stats: DataFrame, top_k: int = 10
) -> DataFrame:
    """(block_key, conv_id, turn_idx, mention_id, ngram, prob) — one row
    per (mention, candidate entity). block_key = 'e{entity}'.

    The probe ≙ MentEntsFreqIndexWrapper.scala:19-64 with the runtime
    top-10 prune (:53). name_stats is bounded by the surface-form
    dictionary (~21M rows at reference scale) → broadcastable or a plain
    shuffle hash join at worst; Catalyst picks via AQE.
    """
    from pboh_spark.util import bound_parallelism

    cands = name_stats.where(F.col("rank") <= top_k).select(
        F.col("name"), F.col("entity"), F.col("prob")
    )
    # bound the branch's task width before the caller unions it with the
    # LSH branch (the union SUMS both branches' partition counts and
    # every downstream pass over the blocked table pays that many task
    # launches); below the union the coalesce survives CollapseRepartition
    return bound_parallelism(
        mentions.join(cands, mentions["ngram"] == cands["name"], "inner")
        .select(
            F.concat(F.lit("e"), F.col("entity").cast("string")).alias("block_key"),
            "conv_id", "turn_idx", "mention_id", "ngram",
            F.col("entity").alias("cand_entity"), "prob",
        )
    )


def minhash_blocks(
    mentions: DataFrame,
    name_stats: DataFrame | None = None,
    oov_only: bool = True,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """LSH blocks for fuzzy matching. With ``oov_only`` (default) only
    mentions whose name misses the dictionary are LSH-blocked — the
    dictionary path already covers in-vocabulary names, and this keeps the
    LSH pair space proportional to the OOV tail (left_anti ≙ the
    reference's unknown-mention path, VerifyEDAbstract.scala:58-78)."""
    m = mentions
    if oov_only and name_stats is not None:
        m = mentions.join(
            name_stats.select(F.col("name").alias("ngram")).distinct(),
            "ngram",
            "left_anti",
        )
    from pboh_spark.util import bound_parallelism

    bands = minhash_band_keys_udf(n_hashes, n_bands)
    # same width bound as candidate_blocks (see there): cheaper task
    # launches for the union's downstream passes, no-op when the branch
    # is already reasonably partitioned
    return bound_parallelism(
        m.withColumn("bk", F.explode(bands(F.col("ngram"))))
        .select(
            F.col("bk").alias("block_key"),
            "conv_id", "turn_idx", "mention_id", "ngram",
            F.lit(None).cast("bigint").alias("cand_entity"),
            F.lit(None).cast("double").alias("prob"),
        )
    )


def salt_and_cap(
    blocked: DataFrame, cap: int = 512, persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Splits blocks larger than ``cap`` into ⌈n/cap⌉ salted sub-blocks.

    Returns (salted_df, metrics_df). metrics_df: per-block sizes and the
    number of oversplit blocks — the 'never silently' part. One extra
    shuffle (groupBy block_key) whose result broadcasts back (block-size
    dim is tiny relative to data).

    The input is materialized once (lazy localCheckpoint) because it is
    scanned twice — once for sizes, once for the salting join — and
    upstream blocking includes a pandas UDF that must not run twice. In
    the checkpointed pipeline the stage write supersedes this; for
    ad-hoc use (bench, notebooks) it halves the blocking cost. Callers
    that only consume the ``metrics`` side (one scan, salted df
    discarded) pass ``persist=False`` so no cache entry outlives the
    call.
    """
    if persist:
        # hash-partition on block_key BEFORE materializing: the three
        # consumers (size agg, salting join, and the downstream pair
        # self-join) all key on block_key, so they reuse this one
        # exchange instead of each re-shuffling the table — and the
        # union's inflated partition count (sum of both blocking
        # branches' partitions, mostly near-empty) collapses first.
        #
        # localCheckpoint (lazy) rather than persist (r6): a persisted
        # DataFrame keeps its FULL logical plan, and every downstream
        # consumer (self-join aliases a/b, the attribute re-attach, the
        # size agg) embeds that blocking tree again — Catalyst was
        # re-analyzing ~12 copies of the union subtree per query build,
        # ~1-2 s of driver time per pass. The checkpoint truncates the
        # lineage to a leaf (partitioning preserved), cutting both
        # analysis and AQE re-optimization cost; same rows, same
        # storage level (MEMORY_AND_DISK). Trade-off (guide §5): local
        # checkpoints are not fault-tolerant — an executor loss forces
        # the query to re-run instead of recomputing the lost blocks.
        # For a derived blocking table inside one query that is the
        # right side of the trade at any scale; durable pipelines go
        # through checkpoint.py stage writes instead.
        blocked = blocked.repartition("block_key").localCheckpoint(
            eager=False
        )
        # kept for reference-dropping: DataFrame.unpersist is a no-op on
        # a checkpointed frame, but popping the reference lets the
        # ContextCleaner reclaim the checkpoint RDD's blocks
        _PERSISTED.append(blocked)
    sizes = blocked.groupBy("block_key").agg(F.count("*").alias("block_size"))
    big = sizes.where(F.col("block_size") > cap)
    salted = (
        blocked.join(big, "block_key", "left")
        .withColumn(
            "n_salt",
            F.when(
                F.col("block_size").isNotNull(),
                F.ceil(F.col("block_size") / F.lit(cap)).cast("int"),
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "block_key",
            F.when(
                F.col("n_salt") > 1,
                F.concat(
                    F.col("block_key"),
                    F.lit("#"),
                    F.pmod(F.xxhash64("mention_id"), F.col("n_salt")).cast("string"),
                ),
            ).otherwise(F.col("block_key")),
        )
        .drop("block_size", "n_salt")
    )
    metrics = sizes.agg(
        F.count("*").alias("n_blocks"),
        F.max("block_size").alias("max_block_size"),
        F.sum(F.when(F.col("block_size") > cap, 1).otherwise(0)).alias(
            "n_blocks_salted"
        ),
        F.sum(F.col("block_size") * (F.col("block_size") - 1) / 2).alias(
            "naive_pairs"
        ),
    )
    return salted, metrics
