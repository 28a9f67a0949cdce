"""Context-word statistics + the full rho unary potential (C1/F9) —
pruned-mass p̂(w) normalization (WordFreqPerCorpus.scala:38-40), absolute
discounting (ScorerFull.scala:44-85), and the a/b evidence mix
(ScorerFull.scala:15-104) against hand-computed values."""

from __future__ import annotations

import math

from pboh_spark import context
from pboh_spark.stats import ScorerWeights

TURNS_SCHEMA = "conv_id string, turn_idx int, tokens array<string>"


def _turns(spark):
    rows = [
        ("c1", 0, ["apple", "fruit", "tree"]),
        ("c1", 1, ["apple", "pie", "fruit"]),
        ("c2", 0, ["apple", "computer", "chip"]),
    ]
    return spark.createDataFrame(rows, TURNS_SCHEMA)


def test_word_freq_normalizes_over_pruned_mass(spark):
    """The reference computes totalSumFreqs AFTER the min-freq prune
    (WordFreqPerCorpus.scala sums the filtered RDD) — p_w must divide by
    the surviving mass only."""
    wf = context.word_freq(_turns(spark), min_freq=2).collect()
    d = {r["word"]: (r["freq"], r["p_w"]) for r in wf}
    # freqs: apple=3, fruit=2 survive; tree/pie/computer/chip pruned
    assert set(d) == {"apple", "fruit"}
    pruned_mass = 3 + 2
    assert abs(d["apple"][1] - 3 / pruned_mass) < 1e-12
    assert abs(d["fruit"][1] - 2 / pruned_mass) < 1e-12


def test_context_windows_spans_adjacent_turns(spark):
    turns = _turns(spark)
    mentions = spark.createDataFrame(
        [("c1", 0, 100)], "conv_id string, turn_idx int, mention_id bigint"
    )
    got = sorted(
        r["word"]
        for r in context.context_windows(turns, mentions, window=1).collect()
    )
    # ±1 turn inside c1: both turns' tokens; c2 never leaks in
    assert got == sorted(["apple", "fruit", "tree", "apple", "pie", "fruit"])


def test_word_entity_freq_prunes_and_totals(spark):
    rows = [
        (0, "apple"), (0, "apple"), (0, "pie"),
        (1, "apple"),
    ]
    anchors_ctx = spark.createDataFrame(rows, "entity bigint, word string")
    got = {
        (r["entity"], r["word"]): (r["freq"], r["total_e"])
        for r in context.word_entity_freq(anchors_ctx, min_freq=2).collect()
    }
    # (0,'apple') freq 2 survives; (0,'pie') and (1,'apple') pruned;
    # total_e computed over the SURVIVING rows
    assert got == {(0, "apple"): (2, 2)}


def test_rho_with_context_matches_hand_formula(spark):
    """One mention, two candidates; entity 0 has positive word evidence,
    entity 1 none — rho must equal a·rho_prior + b·log(p̃/p̂) by hand."""
    w = ScorerWeights()
    candidates = spark.createDataFrame(
        [("c1", 7, 0, math.log(0.6), 1.0), ("c1", 7, 1, math.log(0.4), 1.0)],
        "conv_id string, mention_id bigint, entity bigint, rho double, "
        "log_pop double",
    )
    mention_ctx = spark.createDataFrame(
        [("c1", 7, "apple"), ("c1", 7, "tree")],
        "conv_id string, mention_id bigint, word string",
    )
    wef = spark.createDataFrame(
        [(0, "apple", 10, 20)],
        "entity bigint, word string, freq bigint, total_e bigint",
    )
    wfreq = spark.createDataFrame(
        [("apple", 100, 0.01), ("tree", 50, 0.005)],
        "word string, freq bigint, p_w double",
    )
    out = {
        r["entity"]: r["rho"]
        for r in context.rho_with_context(
            candidates, mention_ctx, wef, wfreq, weights=w
        ).collect()
    }
    p_tilde = (10 - w.xi) / 20  # absolute discounting, F9
    expected_0 = w.a * math.log(0.6) + w.b * math.log(max(p_tilde / 0.01, 1.0))
    expected_1 = w.a * math.log(0.4)  # no (entity,word) stats → no evidence
    assert abs(out[0] - expected_0) < 1e-9
    assert abs(out[1] - expected_1) < 1e-9
    # positive-evidence clamp: p̃/p̂ < 1 contributes 0, not a penalty
    wfreq_hi = spark.createDataFrame(
        [("apple", 100, 0.99), ("tree", 50, 0.005)],
        "word string, freq bigint, p_w double",
    )
    out2 = {
        r["entity"]: r["rho"]
        for r in context.rho_with_context(
            candidates, mention_ctx, wef, wfreq_hi, weights=w
        ).collect()
    }
    assert abs(out2[0] - w.a * math.log(0.6)) < 1e-9
