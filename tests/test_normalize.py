"""Stage 1: per-turn text equality invariant + extraction fidelity."""

from pyspark.sql import functions as F

from pboh_spark import normalize


def test_text_equality_invariant(tiny):
    """BASELINE.json input_hint: per-turn text equality under stable
    (conv_id, turn_idx) ordering."""
    t, _ = tiny
    out = normalize.normalize_turns(t)
    assert normalize.verify_text_equality(t, out) == 0


def test_extraction_matches_gold(tiny):
    t, g = tiny
    m = normalize.extract_mentions(t)
    g2 = g.select("conv_id", "turn_idx", F.col("surface").alias("gs"))
    m2 = m.select("conv_id", "turn_idx", F.col("surface").alias("ms"))
    assert g2.join(m2, ["conv_id", "turn_idx"], "left_anti").count() == 0
    assert m2.join(g2, ["conv_id", "turn_idx"], "left_anti").count() == 0
    assert (
        g2.join(m2, ["conv_id", "turn_idx"])
        .where(F.col("gs") != F.col("ms"))
        .count()
        == 0
    )


def test_ngram_is_lowercase(tiny):
    """Normalization = toLowerCase only (Normalizer.scala:9-11)."""
    t, _ = tiny
    m = normalize.extract_mentions(t)
    assert m.where(F.col("ngram") != F.lower(F.col("surface"))).count() == 0


def test_mention_ids_unique_and_deterministic(spark, tiny, universe):
    t, _ = tiny
    m = normalize.extract_mentions(t)
    n = m.count()
    assert m.select("mention_id").distinct().count() == n
    # deterministic under re-extraction with different partitioning
    m2 = normalize.extract_mentions(t.repartition(13))
    assert m.select("mention_id").exceptAll(m2.select("mention_id")).count() == 0


def test_offsets_exact_for_repeated_and_contained_surfaces(spark):
    """instr() regression: repeated surfaces ('Alice met Alice') and a
    surface contained in an earlier longer mention must get their own
    character offsets, not the first occurrence's."""
    df = spark.createDataFrame(
        [("c0", 0, "Alice met Alice"), ("c0", 1, "Alice Smith met Alice")],
        "conv_id string, turn_idx int, role string",
    ).toDF("conv_id", "turn_idx", "text")
    rows = {
        (r["turn_idx"], r["offset"]): r["surface"]
        for r in normalize.extract_mentions(df).collect()
    }
    assert rows == {
        (0, 0): "Alice",
        (0, 10): "Alice",
        (1, 0): "Alice Smith",
        (1, 16): "Alice",
    }


def test_process_target_link_reference_semantics(spark):
    """F2 chain vs Normalizer.processTargetLink (utils/Normalizer.scala:
    15-27): double HTML unescape, underscore→space+trim, capitalize,
    percent-decode only when a % survives."""
    from pyspark.sql import functions as F

    from pboh_spark.normalize import process_target_link

    cases = [
        # (raw, expected)
        ("anarchism", "Anarchism"),
        ("new_york_city", "New york city"),          # capitalize FIRST only
        ("a&amp;amp;b", "A&b"),                       # double unescape
        ("rock_&amp;_roll", "Rock & roll"),
        ("foo%20bar", "Foo bar"),                     # percent-decode
        ("50&#39;s_music", "50's music"),
        ("_padded_", "Padded"),                       # trim after _→space
        ("", ""),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw string")
    got = {
        r["raw"]: r["norm"]
        for r in df.select(
            "raw", process_target_link(F.col("raw")).alias("norm")
        ).collect()
    }
    for raw, want in cases:
        assert got[raw] == want, (raw, got[raw], want)
