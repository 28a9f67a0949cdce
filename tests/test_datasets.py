"""AIDA-CoNLL adapter (datasets.py) — round-trip on a committed fixture
(tests/fixtures/aida_sample.txt, 3 docs / 2 splits / 7 mentions incl. a
multi-word mention with an I-continuation line and an -NME- line) and
the end-to-end hook into the evaluate stack.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pboh_spark import datasets, evaluate, resolve, stats

FIXTURE = str(Path(__file__).resolve().parent / "fixtures" / "aida_sample.txt")


def test_load_aida_documents(spark):
    docs = datasets.load_aida(spark, FIXTURE).orderBy("doc_id").collect()
    assert [d["doc_id"] for d in docs] == [
        "1 testa Cricket", "2 testa Politics", "3 testb Football"
    ]
    # doc text = first tab field of every non-empty line (AIDA.scala:94-96)
    assert docs[0]["words"] == [
        "England", "beat", "Pakistan", "by", "an", "innings", "at",
        "Lord", "'s", ".",
    ]


def test_split_filter_matches_reference_semantics(spark):
    testa = datasets.load_aida(spark, FIXTURE, split="testa")
    testb = datasets.load_aida(spark, FIXTURE, split="testb")
    assert testa.count() == 2
    assert testb.count() == 1


def test_mentions_and_gold(spark):
    mentions, gold = datasets.aida_mentions_gold(spark, FIXTURE)
    g = {
        (r["conv_id"], r["surface"]): (r["entity"], r["entity_title"])
        for r in gold.collect()
    }
    # B-lines only: the I-continuation of "lord 's" must NOT duplicate,
    # the -NME- line must NOT appear
    assert len(g) == 8
    assert g[("1 testa Cricket", "lord 's")] == (103, "Lord%27s")
    assert g[("2 testa Politics", "new york")] == (104, "New_York")
    assert g[("3 testb Football", "karachi")] == (105, "Karachi")
    m = mentions.collect()
    assert len(m) == 8
    assert all(r["ngram"] == r["surface"] for r in m)
    # deterministic ids, unique per occurrence
    assert len({r["mention_id"] for r in m}) == 8


def test_to_transcripts_schema(spark):
    t = datasets.to_transcripts(datasets.load_aida(spark, FIXTURE))
    assert [f.name for f in t.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    row = t.where(t.conv_id == "3 testb Football").collect()[0]
    assert row["text"] == "Pakistan hosted England in Karachi ."


XML_FIXTURE = str(
    Path(__file__).resolve().parent / "fixtures" / "msnbc_sample.xml"
)
GERBIL_DIR = str(
    Path(__file__).resolve().parent / "fixtures" / "gerbil_problems"
)
GERBIL_RAW = str(Path(__file__).resolve().parent / "fixtures" / "gerbil_raw")


def test_xml_gold_adapter(spark):
    """AQUAINT/MSNBC/ACE04 mentions-XML: NIL and empty wikiName dropped,
    &amp; unescaped, mentions lowercased, ids deterministic."""
    mentions, gold = datasets.load_xml_gold(spark, XML_FIXTURE)
    g = {
        (r["conv_id"], r["surface"]): r["entity_title"]
        for r in gold.collect()
    }
    assert len(g) == 4  # 6 annotations − 1 NIL − 1 empty
    assert g[("Bus16451112.txt", "at&t labs")] == "AT&T"
    assert g[("Pol16451321.txt", "new york")] == "New_York"
    # same title ⇒ same hashed entity id across documents
    ids = {
        (r["conv_id"], r["entity_title"]): r["entity"]
        for r in gold.collect()
    }
    assert (
        ids[("Bus16451112.txt", "England")]
        == ids[("Pol16451321.txt", "England")]
    )
    assert mentions.count() == 4


def test_hashed_entity_ids_fit_lbp_pair_packing(spark):
    """xml/gerbil entity ids hash from titles — they must land in
    [0, 2^31): the LBP kernel rejects ids ≥ 2^32 and negative ids would
    sign-extend through the pair packing (regression: raw xxhash64
    crashed resolve_entities on these formats)."""
    for _, gold in (
        datasets.load_xml_gold(spark, XML_FIXTURE),
        datasets.load_gerbil_gold(spark, GERBIL_DIR),
    ):
        ids = [r["entity"] for r in gold.select("entity").collect()]
        assert ids and all(0 <= i < (1 << 31) for i in ids), ids


def test_xml_gold_lbp_path_runs(spark):
    """The full LBP resolver must run on hashed-id gold sets (the crash
    scenario: evaluate_gold_dataset's default lbp=True path)."""
    mentions, gold = datasets.load_xml_gold(spark, XML_FIXTURE)
    m = datasets.evaluate_gold_dataset(spark, mentions, gold, lbp=True)
    assert m["lbp"]["micro_accuracy"] == 1.0


def test_gerbil_adapter(spark):
    """GERBIL Problems/ dir: value-on-next-line tags, per-file docs,
    offsets preserved, NIL dropped."""
    mentions, gold = datasets.load_gerbil_gold(spark, GERBIL_DIR)
    rows = {
        (r["conv_id"], r["ngram"]): r["offset"] for r in mentions.collect()
    }
    assert rows == {
        ("doc1.txt", "england"): 10,
        ("doc1.txt", "at&t labs"): 40,
        ("doc2.txt", "new york"): 5,
    }
    g = {r["surface"]: r["entity_title"] for r in gold.collect()}
    assert g == {
        "england": "England", "at&t labs": "AT&T", "new york": "New_York",
    }


def test_gerbil_raw_texts(spark):
    t = datasets.load_raw_texts(spark, GERBIL_RAW).collect()
    assert len(t) == 1
    row = t[0]
    assert row["conv_id"] == "doc1.txt"
    # lines joined by a space, the ’ → ' replacement applied
    assert "somebody's friends on a second line" in row["text"]


def test_xml_gold_end_to_end_accuracy(spark):
    """Same e2e hook as AIDA: gold-derived anchors → candidates →
    argmax → linking_accuracy must be perfect on the fixture."""
    from pyspark.sql import functions as F

    mentions, gold = datasets.load_xml_gold(spark, XML_FIXTURE)
    anchors = gold.select(
        F.col("surface").alias("name"), "entity",
        F.col("conv_id").alias("doc_id"),
    )
    cand = resolve.mention_candidates(
        mentions, stats.name_stats(anchors), top_k=10
    )
    metrics = evaluate.linking_accuracy(
        resolve.resolve_argmax(cand), gold, mentions
    )
    assert metrics["n_mentions"] == 4
    assert metrics["micro_accuracy"] == 1.0


def test_evaluate_gold_dataset_argmax_and_lbp(spark):
    """EvalOnDatasets recast: both resolvers side-by-side on a loaded
    gold set (self-anchored ⇒ both must be perfect on the fixture)."""
    mentions, gold = datasets.aida_mentions_gold(spark, FIXTURE)
    m = datasets.evaluate_gold_dataset(spark, mentions, gold, lbp=True)
    assert m["argmax"]["micro_accuracy"] == 1.0
    assert m["lbp"]["micro_accuracy"] == 1.0
    assert m["n_gold_mentions"] == 8


def test_linking_accuracy_end_to_end_on_aida(spark):
    """The VERDICT r3 #3 acceptance bar: an AIDA file feeds the existing
    candidate/resolve/evaluate stack unchanged. Anchors are derived from
    the gold itself (each doc 'links' its surfaces), so the prior is
    perfect and micro accuracy must be 1.0 — any drop means a plumbing
    bug in the adapter shapes."""
    from pyspark.sql import functions as F

    mentions, gold = datasets.aida_mentions_gold(spark, FIXTURE)
    anchors = gold.select(
        F.col("surface").alias("name"), "entity",
        F.col("conv_id").alias("doc_id"),
    )
    ns = stats.name_stats(anchors)
    cand = resolve.mention_candidates(mentions, ns, top_k=10)
    assign = resolve.resolve_argmax(cand)
    metrics = evaluate.linking_accuracy(assign, gold, mentions)
    assert metrics["n_mentions"] == 8
    assert metrics["micro_accuracy"] == 1.0
