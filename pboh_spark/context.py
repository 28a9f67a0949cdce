"""Context-word statistics and the full rho unary potential (C1).

The reference's unary potential adds context evidence to the link prior
(loopybeliefpropagation/ScorerFull.scala:15-104):

    rho(m,e) = a·log p̂(e|m) + b·Σ_{w ∈ ctx(m)} log(max(p̃(w|e)/p̂(w), 1))

with p̃(w|e) absolutely discounted: p̃(w|e) = (freq(w,e) − ξ)/total(e),
leftover mass μ_e spread over the unigram p̂(w) (ScorerFull.scala:44-85,
the F9 operator). Context = K=50 words left+right of the mention
(context/TextSplittingInWords.scala:62-105; K at EntityWordsProbs.scala:37),
recast as a turn-window: tokens of the ±W turns around the mention's turn
(Window.rowsBetween — SURVEY.md W1).

Index builds ≙ the reference's Spark jobs:
* word_freq      — context/WordFreqPerCorpus.scala:20-53  (A1; freq ≥ 20 filter :38)
* word_entity_freq — context/EntityWordsProbs.scala:176-216 (groupByKey →
  window extraction → reduceByKey; min-freq prunes :151,
  WordEntityProbsIndex.scala:104)

All DataFrame aggs + joins; the LevelDB KV spill of the reference
(WordEntityProbsIndex.scala:25-68) is simply Spark's native shuffle spill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pboh_spark.stats import ScorerWeights

CONTEXT_TURNS = 2  # ± turns ≙ the reference's ±50-word window


def word_freq(norm_turns: DataFrame, min_freq: int = 2) -> DataFrame:
    """(word, freq) + p_w column — ≙ WordFreqPerCorpus.scala:36-38
    (reduceByKey count + freq ≥ k prune; theirs k=20 on Wikipedia)."""
    wf = (
        norm_turns.select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
    )
    # p̂(w) denominator = PRUNED vocabulary mass: the reference computes
    # totalSumFreqs AFTER the freq ≥ 20 filter (WordFreqPerCorpus.scala:38-40
    # sums the filtered RDD; WordFreqDict loads only pruned rows), so the
    # evidence term log(p̃/p̂) is calibrated against pruned mass.
    total = wf.agg(F.sum("freq")).collect()[0][0] or 1
    return wf.withColumn("p_w", F.col("freq") / F.lit(float(total)))


def context_windows(
    norm_turns: DataFrame, mentions: DataFrame, window: int = CONTEXT_TURNS
) -> DataFrame:
    """(conv_id, mention_id, word) — context words of each mention from
    the ±``window`` surrounding turns (W1: Window.partitionBy(conv)
    .orderBy(turn_idx).rowsBetween(−w, +w) + collect_list → explode)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-window, window)
    )
    ctx = norm_turns.select(
        "conv_id",
        "turn_idx",
        F.flatten(F.collect_list("tokens").over(w)).alias("ctx_words"),
    )
    return (
        mentions.join(ctx, ["conv_id", "turn_idx"])
        .select(
            "conv_id",
            "mention_id",
            F.explode("ctx_words").alias("word"),
        )
    )


def word_entity_freq(
    anchors_ctx: DataFrame, min_freq: int = 2
) -> DataFrame:
    """(entity, word, freq, total_e) from a (doc/conv, entity, word)
    training table — ≙ EntityWordsProbs.scala:198-213 (map → groupByKey →
    window extraction → reduceByKey), with the (w,e) freq ≥ k prune
    (EntityWordsProbs.scala:151, WordEntityProbsIndex.scala:104)."""
    wef = (
        anchors_ctx.groupBy("entity", "word")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
    )
    totals = wef.groupBy("entity").agg(F.sum("freq").alias("total_e"))
    return wef.join(totals, "entity")


def rho_with_context(
    candidates: DataFrame,
    mention_ctx: DataFrame,
    wef: DataFrame,
    wfreq: DataFrame,
    weights: ScorerWeights | None = None,
    fused: bool = True,
) -> DataFrame:
    """Full C1 rho: candidates (conv_id, mention_id, entity, rho, log_pop)
    with rho ← a·rho_prior + b·Σ_w log(max(p̃(w|e)/p̂(w), 1)).

    ``fused=False`` additionally returns the unfused coordinates
    (``rho_prior``, ``ctx_evidence``) so weight learning can
    differentiate the a/b mix (learning._pl_conv recombines them with
    the candidate weights instead of consuming the baked sum).

    p̃(w|e) = max(freq − ξ, 0)/total_e  (absolute discounting, F9 —
    ScorerFull.scala:44-85; the max(·,1) inside the log mirrors the
    reference's 'only positive evidence' clamp :94-99).

    Plan shape: mention-context words join the (entity,word) stats on
    (word) then (entity) — one shuffle each — and aggregate back to
    (mention, entity). Catalyst pushes the candidate-entity semi-join
    down so only candidate entities' rows survive the wef probe.
    """
    w = weights or ScorerWeights()
    cand_ctx = candidates.select("mention_id", "entity").join(
        mention_ctx.select("mention_id", "word"), "mention_id"
    )
    scored = (
        cand_ctx.join(wef, ["entity", "word"], "left")
        .join(wfreq.select("word", "p_w"), "word", "left")
        .withColumn(
            "p_tilde",
            F.greatest(F.col("freq") - F.lit(w.xi), F.lit(0.0))
            / F.col("total_e"),
        )
        .withColumn(
            "evidence",
            F.when(
                F.col("p_tilde").isNotNull()
                & F.col("p_w").isNotNull()
                & (F.col("p_tilde") > 0),
                F.log(F.greatest(F.col("p_tilde") / F.col("p_w"), F.lit(1.0))),
            ).otherwise(F.lit(0.0)),
        )
        .groupBy("mention_id", "entity")
        .agg(F.sum("evidence").alias("ctx_evidence"))
    )
    out = (
        candidates.join(scored, ["mention_id", "entity"], "left")
        .withColumn("rho_prior", F.col("rho"))
        .withColumn(
            "ctx_evidence", F.coalesce(F.col("ctx_evidence"), F.lit(0.0))
        )
        .withColumn(
            "rho",
            F.lit(w.a) * F.col("rho_prior")
            + F.lit(w.b) * F.col("ctx_evidence"),
        )
    )
    cols = ["conv_id", "mention_id", "entity", "rho", "log_pop"]
    if not fused:
        cols += ["rho_prior", "ctx_evidence"]
    return out.select(*cols)
