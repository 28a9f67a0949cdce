"""Stage 5 — bounded-iteration max-product / sum-product score aggregation
(the PBOH loopy-BP core) as a per-conversation Arrow-vectorized kernel.

The reference runs loopy BP per document over a fully-connected CRF of
its mentions (LoopyBeliefPropagation.scala:55-163 max-product, :166-230
sum-product), messages in log space with min-normalization (:85-121),
convergence EPS=1e-5 / 15-iteration bound (:33,
eval/VerifyEDLBPForListOfWords.scala:35), neighbor-sum memoization
(MessagesMap.scala:24-47), and belief extraction (ScorerFull.scala:263-317).

Spark mapping: documents ⇒ conversations; since each conversation is
≤25 mentions × ≤10 candidates (doc-size cap ≙ FewParamsLearning.scala:364,
top-10 prune ≙ MentEntsFreqIndexWrapper.scala:53), the whole CRF fits in
small dense numpy tensors, so the kernel is a grouped **cogroup
applyInPandas** over (candidates, conv-local lambda pairs) — one Python
call per conversation batch, everything inside is vectorized numpy.
The reference's per-message virtual calls into Trove maps become three
tensor ops per iteration; the O(l²k²)-not-O(l³k²) neighbor-sum
subtraction trick (MessagesMap.scala:32-40) is preserved as
``S[i,a] − M[j,i,a]``.

The update implemented (max-product, ScorerFull.scala:231-261 scoring):

    msg'[i→j](b) = max_a ( f·rho[i](a) + Σ_{k≠j} msg[k→i](a)
                           + g·2/(L−1)·lambda(E[i,a], E[j,b]) )

min-normalized per (i,j); sum-product swaps max for logsumexp and
normalizes to Σexp = 1 (LoopyBeliefPropagation.scala:195-230).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pboh_spark.stats import ScorerWeights

MAX_ITER = 15  # eval/VerifyEDLBPForListOfWords.scala:35
EPS = 1e-5  # LoopyBeliefPropagation.scala:33
LAMBDA_FLOOR = -1000.0  # ScorerFull.scala:225
NEG = -1.0e30

RESOLVE_SCHEMA = (
    "conv_id string, mention_id bigint, entity bigint, score double, "
    "n_iters int, converged boolean"
)


def _pack(e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """int-pair → int64 key, min in the high bits — utils/Utils.scala:37-43."""
    lo = np.minimum(e1, e2).astype(np.int64)
    hi = np.maximum(e1, e2).astype(np.int64)
    return (lo << np.int64(32)) | hi


def _solve_conv(
    ents: np.ndarray,  # (L, K) candidate entity ids, -1 padding, sorted asc
    rho: np.ndarray,  # (L, K) unary potentials, NEG padding
    lam_map: dict[int, float],  # packed pair → lambda (cocit>0 pairs only)
    weights: ScorerWeights,
    max_product: bool,
    logpop: np.ndarray | None = None,  # (L, K) log unnormalized popularity
    lam_const: float = LAMBDA_FLOOR,  # log(backoff/N); floor if no stats
    max_iter: int = MAX_ITER,
    eps: float = EPS,
) -> tuple[np.ndarray, np.ndarray, int, bool]:
    """One conversation. Returns (best_idx (L,), best_score (L,), iters,
    converged). Brute-force-verifiable on tiny graphs (tests §8)."""
    L, K = ents.shape
    valid = ents >= 0
    # guard the 32-bit pair packing: ids ≥ 2^32 would silently collide in
    # _pack and probe another pair's lambda (utils/Utils.scala packs ints)
    if ents.max(initial=0) >= (1 << 32):
        raise ValueError(
            "entity ids must fit in 32 bits for lambda pair-packing; "
            f"got max id {int(ents.max())}"
        )
    if L == 1:
        # beliefs use f·rho exactly like the multi-mention path (there are
        # no messages), so scores stay on one scale for any weights.f
        b = np.where(valid[0], weights.f * rho[0], NEG)
        i = int(np.argmax(b))
        score = b[i]
        if not max_product:
            # same [0,1] marginal-probability scale as the multi-mention
            # path (softmax over valid candidates), not a raw log-prob
            p = np.where(valid[0], np.exp(b - b.max()), 0.0)
            score = p[i] / p.sum()
        return np.array([i]), np.array([score]), 0, True

    # Λ[i,j,a,b] — pandas .map is a C-speed dict probe over the flattened
    # key tensor (the per-doc CocitationMap analogue, CocitationMap.scala:24-39).
    # Missing pairs back off to the closed-form independence default
    # (ScorerFull.scala:212-213): log(B/N) + (1−h)(log p̂_a + log p̂_b).
    keys = _pack(
        np.broadcast_to(ents[:, None, :, None], (L, L, K, K)),
        np.broadcast_to(ents[None, :, None, :], (L, L, K, K)),
    ).ravel()
    lam = pd.Series(keys).map(lam_map).to_numpy(dtype=np.float64).reshape(
        L, L, K, K
    )
    if logpop is not None:
        default = lam_const + (1.0 - weights.h) * (
            logpop[:, None, :, None] + logpop[None, :, None, :]
        )
    else:
        default = np.full((L, L, K, K), LAMBDA_FLOOR)
    lam = np.where(np.isnan(lam), default, lam)
    pair_w = weights.g * 2.0 / (L - 1)  # ScorerFull.scala:234 scaling
    lam = pair_w * lam
    f_rho = weights.f * np.where(valid, rho, NEG)

    M = np.zeros((L, L, K))  # M[i,j,b] = msg i→j evaluated at cand b of j
    off_diag = ~np.eye(L, dtype=bool)
    iters = 0
    converged = False
    for iters in range(1, max_iter + 1):
        S = M.sum(axis=0)  # S[i,a] = Σ_k msg k→i (a)   (C8 memoization)
        # base_ij[i,j,a] = f·rho[i,a] + S[i,a] − M[j,i,a]
        # (exclude the recipient's own message by subtraction —
        # MessagesMap.scala:24-47; M.transpose(1,0,2)[i,j,a] = M[j,i,a])
        base_ij = f_rho[:, None, :] + S[:, None, :] - M.transpose(1, 0, 2)
        scores = base_ij[:, :, :, None] + lam  # (i, j, a, b)
        scores = np.where(valid[:, None, :, None], scores, NEG)
        if max_product:
            new_M = scores.max(axis=2)  # (i, j, b)
        else:
            mx = scores.max(axis=2, keepdims=True)
            new_M = (
                np.log(np.exp(scores - mx).sum(axis=2)) + mx[:, :, 0, :]
            )
        new_M = np.where(valid[None, :, :], new_M, 0.0)
        if max_product:
            # min-normalization over valid b — LoopyBeliefPropagation.scala:110-121
            mn = np.where(valid[None, :, :], new_M, np.inf).min(
                axis=2, keepdims=True
            )
            new_M = np.where(valid[None, :, :], new_M - mn, 0.0)
        else:
            # normalize Σ_b exp(msg) = 1 — LoopyBeliefPropagation.scala:210-218
            masked = np.where(valid[None, :, :], new_M, -np.inf)
            mx = masked.max(axis=2, keepdims=True)
            with np.errstate(invalid="ignore"):
                lse = np.log(
                    np.where(
                        valid[None, :, :], np.exp(masked - mx), 0.0
                    ).sum(axis=2, keepdims=True)
                ) + mx
            new_M = np.where(valid[None, :, :], new_M - lse, 0.0)
        new_M = np.where(off_diag[:, :, None], new_M, 0.0)
        delta = np.abs(new_M - M).max()
        M = new_M
        if delta < eps:
            converged = True
            break

    bel = f_rho + M.sum(axis=0)  # ScorerFull.scala:263-317
    bel = np.where(valid, bel, NEG)
    best = bel.argmax(axis=1)  # candidates sorted by entity ⇒ stable tie-break
    best_score = bel[np.arange(L), best]
    if not max_product:
        mx = bel.max(axis=1, keepdims=True)
        p = np.where(valid, np.exp(bel - mx), 0.0)
        p = p / p.sum(axis=1, keepdims=True)
        best_score = p[np.arange(L), best]
    return best, best_score, iters, converged


def _kernel(weights: ScorerWeights, max_product: bool, lam_const: float):
    def solve(cand: pd.DataFrame, lam: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(
                columns=[
                    "conv_id", "mention_id", "entity", "score",
                    "n_iters", "converged",
                ]
            )
        conv = cand["conv_id"].iloc[0]
        lam_map = dict(
            zip(
                _pack(
                    lam["e1"].to_numpy(np.int64), lam["e2"].to_numpy(np.int64)
                ),
                lam["lambda_potential"].to_numpy(np.float64),
            )
        ) if len(lam) else {}
        # deterministic order: mention_id asc, entity asc (stable tie-break)
        cand = cand.sort_values(["mention_id", "entity"])
        mids = cand["mention_id"].unique()
        L = len(mids)
        K = int(cand.groupby("mention_id")["entity"].size().max())
        ents = np.full((L, K), -1, dtype=np.int64)
        rho = np.full((L, K), NEG, dtype=np.float64)
        logpop = np.zeros((L, K), dtype=np.float64)
        has_pop = "log_pop" in cand.columns
        for i, (_, grp) in enumerate(cand.groupby("mention_id", sort=True)):
            k = len(grp)
            ents[i, :k] = grp["entity"].to_numpy()
            rho[i, :k] = grp["rho"].to_numpy()
            if has_pop:
                logpop[i, :k] = (
                    grp["log_pop"].fillna(0.0).to_numpy(dtype=np.float64)
                )
        best, score, iters, conv_ok = _solve_conv(
            ents, rho, lam_map, weights, max_product,
            logpop=logpop if has_pop else None, lam_const=lam_const,
        )
        return pd.DataFrame(
            {
                "conv_id": conv,
                "mention_id": mids,
                "entity": ents[np.arange(L), best],
                "score": score,
                "n_iters": iters,
                "converged": conv_ok,
            }
        )

    return solve


def lambda_at_h(conv_affine: DataFrame, h: float) -> DataFrame:
    """Re-evaluate conversation-local potentials at a (re-fit) h weight
    from the affine coefficients carried by
    ``conv_lambda_pairs(..., value_cols=("log_smoothed", "lp_sum"))``:

        λ(h) = log_smoothed − h·lp_sum

    This is THE consistency rule between training and inference — the
    same decomposition stats.with_lambda_potential emits and the
    learning kernel differentiates. Fitted-weight inference must come
    through here rather than reusing a lambda_potential baked at the
    prior h (used by pipeline --learn-weights and the
    pboh_resolve_lbp_fitted contract query)."""
    return conv_affine.select(
        "conv_id", "e1", "e2",
        (
            F.col("log_smoothed") - F.lit(h) * F.col("lp_sum")
        ).alias("lambda_potential"),
    )


def backoff_lam_const(
    scalars: dict[str, int], w: ScorerWeights | None = None
) -> float:
    """Closed-form independence-backoff constant log((N − δ·D)/N) − log N
    for entity pairs absent from the lambda table (ScorerFull.scala:
    212-213 recast; N = total pairs, D = distinct pairs). Shared by the
    LBP kernel and the learning kernel so both back off identically."""
    w = w or ScorerWeights()
    n = float(max(scalars.get("num_total_pairs", 1), 1))
    d = float(max(scalars.get("num_distinct_pairs", 1), 1))
    backoff = max(n - w.delta_cocit * d, 1e-9) / n
    return float(np.log(backoff) - np.log(n))


def conv_lambda_pairs(
    candidates: DataFrame,
    lambda_table: DataFrame,
    value_cols: tuple[str, ...] = ("lambda_potential",),
) -> DataFrame:
    """Conversation-local candidate-entity pair potentials:
    (conv_id, e1, e2, *value_cols). Distinct conv entities self-join
    on conv_id (anti-diagonal) then probe the global lambda table — the
    distributed CocitationMap build (CocitationMap.scala:24-47), one
    shuffle instead of per-doc hash probes. Missing pairs take the −1000
    floor inside the kernel. Weight learning passes
    ``value_cols=("log_smoothed", "lp_sum")`` to carry the h-affine λ
    coefficients instead of the evaluated potential.
    """
    ce = candidates.select("conv_id", "entity").distinct()
    a = ce.alias("a")
    b = ce.alias("b")
    pairs = (
        a.join(b, "conv_id")
        .where(F.col("a.entity") <= F.col("b.entity"))  # diagonal included
        .select(
            "conv_id",
            F.col("a.entity").alias("e1"),
            F.col("b.entity").alias("e2"),
        )
    )
    # explicit alias mints a FRESH conv_id attribute: the caller cogroups
    # this output against the candidate table it was derived from, and a
    # shared attribute id trips Spark's ambiguous-self-join analysis when
    # the candidate lineage is shallow (e.g. a raw createDataFrame)
    return pairs.join(
        lambda_table.select("e1", "e2", *value_cols), ["e1", "e2"], "inner"
    ).select(F.col("conv_id").alias("conv_id"), "e1", "e2", *value_cols)


def augment_containment(
    candidates: DataFrame,
    mentions: DataFrame,
    name_stats: DataFrame,
    top_k: int = 10,
) -> DataFrame:
    """Containment candidate augmentation —
    index/MentEntsFreqIndexWrapper.scala:30-40: when another mention of
    the SAME document strictly contains this mention's normalized string
    (``other.contains(m)``), the container's candidate entities are
    merged into the contained mention's set with frequency 1
    (``addEntity(c, 1)`` ⇒ prior ≈ 1/(total_freq(m)+1)), then the
    per-mention top-k prune runs over the merged set (:53).

    Spark recast: a conv-local self-join of the mention table (docs are
    ≤25 mentions, so per-conv fan-out is bounded — the join is equi on
    conv_id, never a cross), container candidates attach by mention id,
    a left-anti drops entities the mention already had, and one window
    re-prunes to top-k by (rho desc, entity asc). Mentions that are OOV
    themselves get no augmentation (the reference returns null before
    merging, :23-26) — enforced by the inner join on name_stats totals.

    Documented deviation from ``addEntity(c, 1)``: the reference ALSO
    increments the stored frequency of entities the contained mention
    already has and inflates the map's total_freq, which shifts EVERY
    candidate's prior for that mention. Here existing candidates keep
    their original rho (the left-anti drops the duplicates instead of
    bumping them) and total_freq is not adjusted — only genuinely new
    entities arrive, at prior ≈ 1/(total_freq+1). Post-augmentation
    priors are therefore approximate (≈, not =) vs the reference.

    Cost at scale: the final prune is ONE extra hash partition of the
    candidate table on mention_id with ≤ k·(1+containers) rows per group
    (skew impossible — group key is the mention instance). Pruning only
    the augmented subset would need a semi+anti join pair, i.e. two
    shuffles of the same table, so the single window is the cheaper
    plan.
    """
    m = mentions.select("conv_id", "mention_id", "ngram")
    a, b = m.alias("a"), m.alias("b")
    pairs = (
        a.join(b, "conv_id")
        .where(
            (F.col("a.ngram") != F.col("b.ngram"))
            & (F.instr(F.col("b.ngram"), F.col("a.ngram")) > 0)
        )
        .select(
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.mention_id").alias("mention_id"),
            F.col("a.ngram").alias("ngram"),
            F.col("b.mention_id").alias("container_id"),
        )
    )
    cc = candidates.select(
        F.col("mention_id").alias("container_id"), "entity", "log_pop"
    )
    aug = (
        pairs.join(cc, "container_id")
        .select("conv_id", "mention_id", "ngram", "entity", "log_pop")
        .distinct()
        .join(candidates.select("mention_id", "entity"),
              ["mention_id", "entity"], "left_anti")
    )
    totals = name_stats.select(
        F.col("name").alias("ngram"), "total_freq"
    ).distinct()
    aug = (
        aug.join(totals, "ngram", "inner")
        .withColumn("rho", -F.log(F.col("total_freq") + 1))
        .select("conv_id", "mention_id", "entity", "rho", "log_pop")
    )
    merged = candidates.select(
        "conv_id", "mention_id", "entity", "rho", "log_pop"
    ).unionByName(aug)
    w = Window.partitionBy("mention_id").orderBy(
        F.desc("rho"), F.asc("entity")
    )
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .drop("rk")
    )


def mention_candidates(
    mentions: DataFrame,
    name_stats: DataFrame,
    entity_stats: DataFrame | None = None,
    top_k: int = 10,
    containment: bool = True,
) -> DataFrame:
    """(conv_id, mention_id, entity, rho, log_pop) with rho = log p̂(e|m) —
    the prior-only unary potential (ScorerFull.scala:15-104 without the
    context-word term; see context.rho_with_context for the full C1).
    ``log_pop`` feeds the kernel's independence-backoff default lambda.
    ``containment`` (default on, matching the reference's wrapper) merges
    conv-local containing mentions' candidates before the top-k prune —
    see augment_containment."""
    cands = name_stats.where(F.col("rank") <= top_k).select(
        F.col("name"), F.col("entity"), F.log(F.col("prob")).alias("rho")
    )
    out = mentions.join(
        cands, mentions["ngram"] == cands["name"], "inner"
    ).select("conv_id", "mention_id", "entity", "rho")
    if entity_stats is not None:
        # entity_stats grows with the catalog (~70 MB at reference scale,
        # unbounded at 100×) — no broadcast hint; AQE decides per actual size
        out = out.join(
            entity_stats.select("entity", "log_pop"), "entity", "left"
        )
    else:
        out = out.withColumn("log_pop", F.lit(0.0))
    out = out.select("conv_id", "mention_id", "entity", "rho", "log_pop")
    if containment:
        out = augment_containment(out, mentions, name_stats, top_k)
    return out


def resolve_entities(
    candidates: DataFrame,
    conv_lambdas: DataFrame,
    weights: ScorerWeights | None = None,
    max_product: bool = True,
    scalars: dict[str, int] | None = None,
) -> DataFrame:
    """LBP assignment per conversation → (conv_id, mention_id, entity,
    score, n_iters, converged). Cogrouped Arrow exchange: both sides
    shuffle once on conv_id, kernel runs per group.

    ``scalars`` (stats.corpus_scalars) parameterizes the closed-form
    independence-backoff lambda for pairs missing from conv_lambdas."""
    w = weights or ScorerWeights()
    lam_const = backoff_lam_const(scalars, w) if scalars else LAMBDA_FLOOR
    # conv_lambdas usually derives from candidates (shared attribute ids);
    # localCheckpoint gives it fresh lineage so the cogroup analyzes cleanly
    # — and truncates the self-join plan, which is what we want before an
    # Arrow exchange anyway.
    lam = conv_lambdas.localCheckpoint(eager=False)
    return (
        candidates.groupBy("conv_id")
        .cogroup(lam.groupBy("conv_id"))
        .applyInPandas(_kernel(w, max_product, lam_const), RESOLVE_SCHEMA)
    )


def convergence_report(assignments: DataFrame) -> DataFrame:
    """LBP convergence telemetry bucketed by conversation size —
    ≙ GlobalStats.scala:200-209 (avg iters / % converged per doc rollup)
    + the doc-size bucketing of GlobalStats.scala:116-141.

    Input: the resolve_entities output (one row per mention; ``n_iters``
    and ``converged`` are conversation-constant). Two cheap aggs over the
    assignments table: per-conv collapse, then per-bucket rollup.
    Returns (bucket, n_convs, n_mentions, avg_iters, max_iters,
    pct_converged) — a handful of rows, safe to collect into metrics.
    """
    per_conv = assignments.groupBy("conv_id").agg(
        F.count("*").alias("n_m"),
        F.first("n_iters").alias("n_iters"),
        F.first("converged").alias("converged"),
    )
    bucket = (
        F.when(F.col("n_m") == 1, "1")
        .when(F.col("n_m") == 2, "2")
        .when(F.col("n_m") <= 10, "3-10")
        .otherwise("11+")
    )
    return (
        per_conv.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_convs"),
            F.sum("n_m").alias("n_mentions"),
            F.round(F.avg("n_iters"), 3).alias("avg_iters"),
            F.max("n_iters").alias("max_iters"),
            F.round(F.avg(F.col("converged").cast("int")), 4).alias(
                "pct_converged"
            ),
        )
        .orderBy("bucket")
    )


def resolve_argmax(candidates: DataFrame) -> DataFrame:
    """ARGMAX baseline: independent per-mention max_e rho —
    md/MostFrequentEntity.scala:12-21, run side-by-side with LBP exactly
    like eval/EvalOnDatasets.scala:192-195. Deterministic tie-break on
    entity id (the reference's is hash-order-dependent — SURVEY.md §7.3)."""
    return (
        candidates.groupBy("conv_id", "mention_id")
        .agg(
            F.max_by("entity", F.struct(F.col("rho"), -F.col("entity"))).alias(
                "entity"
            ),
            F.max("rho").alias("score"),
        )
    )
