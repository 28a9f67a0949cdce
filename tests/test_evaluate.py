"""Evaluation metrics: micro vs macro pairwise F1 (GlobalStats.scala:236-248)
and the LBP convergence telemetry rollup (GlobalStats.scala:200-209),
checked against hand-computed fixtures."""

from __future__ import annotations

import pytest

from pboh_spark import evaluate, resolve


@pytest.fixture(scope="module")
def labeled(spark):
    # conv A: triangle m1-m2-m3 all gold-matched; conv B: m4-m5 gold-matched,
    # m4-m6 / m5-m6 not; one cross-conv pair (macro must exclude it)
    rows = [
        ("A", "A", 1, 2, True),
        ("A", "A", 2, 3, True),
        ("A", "A", 1, 3, True),
        ("B", "B", 4, 5, True),
        ("B", "B", 4, 6, False),
        ("B", "B", 5, 6, False),
        ("A", "B", 1, 4, False),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id_a string, conv_id_b string, mention_id_a bigint, "
        "mention_id_b bigint, is_match boolean",
    )


@pytest.fixture(scope="module")
def comps(spark):
    # predicted: {m1,m2,m3} one cluster (conv A perfect);
    # conv B wrong: m4 alone, {m5,m6} together
    rows = [(1, 10), (2, 10), (3, 10), (4, 40), (5, 50), (6, 50)]
    return spark.createDataFrame(rows, "id bigint, cluster_id bigint")


def test_micro_f1_hand_computed(labeled, comps):
    m = evaluate.pairwise_f1(labeled, comps)
    # tp=3 (A triangle), fp=1 (m5-m6), fn=1 (m4-m5); cross-conv pair is a TN
    assert (m["tp"], m["fp"], m["fn"]) == (3, 1, 1)
    assert m["precision"] == pytest.approx(0.75)
    assert m["recall"] == pytest.approx(0.75)
    assert m["f1"] == pytest.approx(0.75)


def test_macro_f1_hand_computed(labeled, comps):
    """Macro = F1 of per-doc-AVERAGED precision/recall (reference divides
    macro sums by numVisitedDocs before combining): conv A p=r=1, conv B
    p=r=0 ⇒ macro p=r=0.5 ⇒ macro F1 0.5 — distinct from micro's 0.75."""
    m = evaluate.macro_pairwise_f1(labeled, comps)
    assert m["n_docs"] == 2
    assert m["macro_precision"] == pytest.approx(0.5)
    assert m["macro_recall"] == pytest.approx(0.5)
    assert m["macro_f1"] == pytest.approx(0.5)


def test_macro_f1_empty(spark, comps):
    empty = spark.createDataFrame(
        [],
        "conv_id_a string, conv_id_b string, mention_id_a bigint, "
        "mention_id_b bigint, is_match boolean",
    )
    m = evaluate.macro_pairwise_f1(empty, comps)
    assert m == {
        "macro_precision": 1.0, "macro_recall": 1.0, "macro_f1": 1.0,
        "n_docs": 0,
    }


def test_convergence_report(spark):
    rows = (
        [("c1", 1, 100, 0.5, 0, True)]
        + [("c2", i, 100 + i, 0.5, 5, True) for i in range(4)]
        + [("c3", i, 200 + i, 0.5, 15, False) for i in range(12)]
    )
    assigns = spark.createDataFrame(
        rows,
        "conv_id string, mention_id bigint, entity bigint, score double, "
        "n_iters int, converged boolean",
    )
    rep = {r["bucket"]: r.asDict() for r in
           resolve.convergence_report(assigns).collect()}
    assert set(rep) == {"1", "3-10", "11+"}
    assert rep["1"]["n_convs"] == 1 and rep["1"]["avg_iters"] == 0.0
    assert rep["3-10"]["n_mentions"] == 4
    assert rep["3-10"]["pct_converged"] == 1.0
    assert rep["11+"]["max_iters"] == 15
    assert rep["11+"]["pct_converged"] == 0.0


def test_linking_accuracy_reports_multilabel_surfaces(spark):
    """ADVICE r4: a surface annotated with TWO gold entities in one
    document collapses to the min label; the metric must surface the
    collapsed-group count so the divergence from per-occurrence grading
    (GlobalStats.scala:236-248) is visible, not silent."""
    from pboh_spark import evaluate

    gold = spark.createDataFrame(
        [("c", 0, "s", 1), ("c", 0, "s", 2), ("c", 0, "t", 3)],
        "conv_id string, turn_idx int, surface string, entity long",
    )
    mentions = spark.createDataFrame(
        [("c", 0, 10, "s"), ("c", 0, 11, "s"), ("c", 0, 12, "t")],
        "conv_id string, turn_idx int, mention_id long, ngram string",
    )
    assign = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "mention_id long, entity long"
    )
    m = evaluate.linking_accuracy(assign, gold, mentions)
    # surface 's' grades against min(1,2)=1: mention 11's answer 2 is
    # "wrong" under the collapse even though it matches a gold label
    assert m["n_mentions"] == 3
    assert abs(m["micro_accuracy"] - 2 / 3) < 1e-12
    assert m["n_multilabel_surfaces"] == 1
    # single-label gold: counter stays 0 (mention 11 is genuinely wrong
    # now — 2 vs the only gold label 1 — so accuracy stays 2/3)
    clean = evaluate.linking_accuracy(
        assign, gold.where("entity <> 2"), mentions
    )
    assert clean["n_multilabel_surfaces"] == 0
    assert abs(clean["micro_accuracy"] - 2 / 3) < 1e-12


def test_candidate_rank_report_buckets(spark):
    """GlobalCountersCWEB recast: hand-built index where the gold lands
    at known places; every counter path covered (OOV name, known name
    with absent gold, exact rank buckets incl. the 0-based → 1-based
    threshold mapping at the 3/4 and 8/9 boundaries)."""
    from pboh_spark import evaluate, stats

    # anchors: name 'a' has 10 candidates with freq 10..1 (entity 1 is
    # most frequent → rank 1, entity 10 → rank 10)
    rows = [("d", "a", e) for e in range(1, 11) for _ in range(11 - e)]
    anchors = spark.createDataFrame(
        rows, "doc_id string, name string, entity long"
    )
    ns = stats.name_stats(anchors, top_k=1 << 30)
    queries = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 4), ("a", 8), ("a", 9),
         ("a", 99), ("zz", 1)],
        "mention string, gold_entity long",
    )
    got = {
        r["bucket"]: r["n"]
        for r in evaluate.candidate_rank_report(queries, ns).collect()
    }
    assert got == {
        "rank_1": 1, "rank_3": 1, "rank_4_8": 2, "rank_9_16": 1,
        "gold_not_in_candidates": 1, "name_not_in_index": 1,
    }
    # counts partition the queries
    assert sum(got.values()) == 7


def test_candidate_rank_report_with_id_mapping(spark):
    """External-id pre-counters (FreebaseWikipIndex path): unmappable
    ids split by name-known/unknown exactly like the reference's
    numGoogleFreebaseEntitiesNotInWikip / numBoth counters."""
    from pboh_spark import evaluate, stats

    anchors = spark.createDataFrame(
        [("d", "a", 1), ("d", "a", 1), ("d", "a", 2)],
        "doc_id string, name string, entity long",
    )
    ns = stats.name_stats(anchors, top_k=1 << 30)
    mapping = spark.createDataFrame(
        [("m.1", 1), ("m.2", 2), ("m.9", 9)], "ext_id string, entity long"
    )
    queries = spark.createDataFrame(
        [("a", "m.1"),    # maps → rank 1
         ("a", "m.9"),    # maps, entity 9 not a candidate of 'a'
         ("a", "m.404"),  # unmappable, name known
         ("zz", "m.404"),  # unmappable AND name unknown
         ("zz", "m.1")],  # maps, name unknown
        "mention string, gold_ext_id string",
    )
    got = {
        r["bucket"]: r["n"]
        for r in evaluate.candidate_rank_report(
            queries, ns, id_mapping=mapping
        ).collect()
    }
    assert got == {
        "rank_1": 1, "gold_not_in_candidates": 1,
        "gold_id_unmappable": 1, "name_and_id_both_missing": 1,
        "name_not_in_index": 1,
    }


def test_freebase_wiki_mapping_majority_and_redirects(spark):
    """FreebaseWikipIndex.scala:38-66 recast: candidate titles chase
    redirects, drop those the title index can't resolve, and the id
    maps to the MOST FREQUENT canonical (deterministic tie-break:
    smallest title)."""
    from pboh_spark import datasets

    idx = spark.createDataFrame(
        [("Canon_A", 100), ("Canon_B", 200)], "title string, entity_id long"
    )
    red = spark.createDataFrame(
        [("Alias_A", "Canon_A")], "alias string, canonical string"
    )
    fb = spark.createDataFrame(
        [
            # m.x: Canon_A appears twice (once via redirect), Canon_B once
            ("m.x", "Canon_A"), ("m.x", "Alias_A"), ("m.x", "Canon_B"),
            # m.y: tie 1-1 → smallest title (Canon_A) wins
            ("m.y", "Canon_B"), ("m.y", "Canon_A"),
            # m.z: only unresolvable titles → absent from the mapping
            ("m.z", "Disambig_Page"),
        ],
        "ext_id string, title string",
    )
    m = {
        r["ext_id"]: (r["entity"], r["title"])
        for r in datasets.freebase_wiki_mapping(fb, idx, red).collect()
    }
    assert m == {"m.x": (100, "Canon_A"), "m.y": (100, "Canon_A")}
