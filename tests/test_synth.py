"""Generator determinism — the whole test strategy rests on it."""

from pyspark.sql import functions as F

from pboh_spark import synth


def test_schema(tiny):
    t, g = tiny
    assert [f.simpleString() for f in t.schema.fields] == [
        "conv_id:string", "turn_idx:int", "role:string",
        "text:string", "tool:string", "ts:timestamp",
    ]


def test_deterministic_across_partitioning(spark, universe):
    """Same conversations regardless of parallelism — per-conv rng seeding
    (required for the local[8] vs local[32] scaling evidence to compare
    identical inputs)."""
    a, _ = synth.generate_transcripts(spark, 40, universe=universe, partitions=2)
    b, _ = synth.generate_transcripts(spark, 40, universe=universe, partitions=16)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_prefix_stability(spark, universe):
    """Conversation i is identical at any total scale (sf prefix property)."""
    a, _ = synth.generate_transcripts(spark, 10, universe=universe)
    b, _ = synth.generate_transcripts(spark, 50, universe=universe)
    b10 = b.where(F.col("conv_id") < "c00000010")
    assert a.exceptAll(b10).count() == 0


def test_doc_size_cap(tiny):
    """1–25 mentions per conversation (FewParamsLearning.scala:364 cap)."""
    _, g = tiny
    sizes = g.groupBy("conv_id").count().agg(
        F.min("count"), F.max("count")
    ).collect()[0]
    assert sizes[0] >= 1 and sizes[1] <= 25


def test_alias_uniqueness(universe):
    seen = set()
    for al in universe.aliases:
        for a in al:
            assert a.lower() not in seen
            seen.add(a.lower())


def test_ts_monotone_within_conversation(tiny):
    t, _ = tiny
    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        t.withColumn("prev", F.lag("ts").over(w))
        .where(F.col("prev").isNotNull() & (F.col("ts") < F.col("prev")))
        .count()
    )
    assert bad == 0
