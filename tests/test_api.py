"""EntityLinker API — the console EntityLinkingAPI analogue: joint
linking of one conversation's mentions, context-entity steering,
unknown-mention exclusion."""

from __future__ import annotations

from pboh_spark import stats, synth
from pboh_spark.api import EntityLinker


def _linker(spark, universe, anchors):
    ns = stats.name_stats(anchors)
    es = stats.entity_stats(anchors)
    cooc = stats.cooccurrence(anchors).persist()
    scalars = stats.corpus_scalars(anchors, cooc=cooc)
    lam = stats.with_lambda_potential(cooc, es, scalars)
    return EntityLinker.from_tables(ns, es, lam, scalars)


def test_canonical_names_link_to_gold(spark, universe, anchors):
    linker = _linker(spark, universe, anchors)
    # canonical surfaces are unambiguous in the anchor corpus
    names = [universe.canonical[e] for e in (0, 1, 2)]
    anns = linker.link(names)
    assert [a.entity for a in anns] == [0, 1, 2]
    assert all(a.converged for a in anns)


def test_unknown_mention_excluded(spark, universe, anchors):
    linker = _linker(spark, universe, anchors)
    anns = linker.link(["Zzqx Qwortle", universe.canonical[5]])
    assert anns[0].entity == -1
    assert anns[1].entity == 5


def test_context_entities_steer_ambiguous_mention(spark, universe, anchors):
    """An ambiguous alias should resolve toward the entity co-occurring
    with the supplied context — the pairwise potential at work
    (≙ consoleJustOutput context mode)."""
    linker = _linker(spark, universe, anchors)
    # find an alias whose candidate list has ≥2 entities (ambiguous)
    ambiguous = [
        (n, c) for n, c in linker.name_candidates.items() if len(c) >= 2
    ]
    assert ambiguous, "anchor noise should create ambiguous names"
    name, cands = max(
        ambiguous, key=lambda nc: min(p for _, p in nc[1])
    )
    cands_sorted = sorted(cands, key=lambda ep: -ep[1])
    runner_up = cands_sorted[1][0]
    # context = entities sharing the runner-up's topic (strong cocit)
    topic = universe.topic_of[runner_up]
    ctx = [int(e) for e in universe.topics[topic] if e != runner_up][:4]
    with_ctx = linker.link([name], context_entities=ctx)[0]
    no_ctx = linker.link([name])[0]
    # with topical context the joint score must not pick a cross-topic
    # entity over the runner-up's topic when context says otherwise
    assert with_ctx.entity in {e for e, _ in cands}
    assert no_ctx.entity == cands_sorted[0][0]


def test_from_tables_lambda_row_ceiling(spark, universe, anchors):
    """An oversized lambda table must raise, not OOM the driver."""
    import pytest

    ns = stats.name_stats(anchors)
    es = stats.entity_stats(anchors)
    cooc = stats.cooccurrence(anchors)
    scalars = stats.corpus_scalars(anchors, cooc=cooc)
    lam = stats.with_lambda_potential(cooc, es, scalars)
    with pytest.raises(ValueError, match="max_lambda_rows"):
        EntityLinker.from_tables(ns, es, lam, scalars, max_lambda_rows=1)


def test_from_tables_prunes_to_candidate_closure(spark, universe, anchors):
    """Lambda rows whose endpoints are outside the name dictionary's
    candidate closure are never collected (driver memory bound)."""
    import numpy as np

    from pboh_spark.resolve import _pack

    ns = stats.name_stats(anchors)
    es = stats.entity_stats(anchors)
    cooc = stats.cooccurrence(anchors)
    scalars = stats.corpus_scalars(anchors, cooc=cooc)
    lam = stats.with_lambda_potential(cooc, es, scalars)
    extra = spark.createDataFrame(
        [(1_000_000, 1_000_001, 5, 1.0, 1.0, 0.0)],
        "e1 bigint, e2 bigint, cocit bigint, lambda_potential double, "
        "log_smoothed double, lp_sum double",
    )
    linker = EntityLinker.from_tables(
        ns, es, lam.unionByName(extra), scalars
    )
    stray = int(_pack(np.array([1_000_000]), np.array([1_000_001]))[0])
    assert stray not in linker.lam_map
    assert linker.lam_map  # in-closure pairs still present


def test_format_annotations_console_shape(spark, universe, anchors):
    """Console output parity (ConsoleEntityLinking: ALL predictions with
    scores; unknown mentions entity −1)."""
    from pboh_spark.api import format_annotations

    linker = _linker(spark, universe, anchors)
    anns = linker.link([universe.canonical[0], "Zzqx Unknown"])
    lines = format_annotations(anns).splitlines()
    assert len(lines) == 2
    m0, e0, s0 = lines[0].split("\t")
    assert m0 == universe.canonical[0] and int(e0) == 0
    float(s0)  # parseable score
    m1, e1, s1 = lines[1].split("\t")
    assert int(e1) == -1 and s1 == "nan"
