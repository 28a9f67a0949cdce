"""Stage 2 statistics vs pandas/numpy oracles on the same anchor corpus."""

import numpy as np
from pyspark.sql import functions as F

from pboh_spark import stats


def test_name_stats_probabilities(anchors):
    ns = stats.name_stats(anchors)
    # per-name probs sum to 1 when no candidates were pruned
    sums = (
        ns.groupBy("name")
        .agg(F.sum("prob").alias("s"), F.max("rank").alias("r"))
        .where(F.col("r") < 64)
    )
    bad = sums.where(F.abs(F.col("s") - 1.0) > 1e-9).count()
    assert bad == 0
    # rank is dense from 1, deterministic tie-break
    assert ns.where(F.col("rank") < 1).count() == 0


def test_name_stats_vs_pandas_oracle(anchors):
    ns = stats.name_stats(anchors).toPandas()
    pdf = anchors.toPandas()
    freq = pdf.groupby(["name", "entity"]).size().reset_index(name="freq")
    total = freq.groupby("name")["freq"].sum().rename("total")
    merged = freq.join(total, on="name")
    import pandas as pd
    chk = ns.merge(merged, on=["name", "entity"], suffixes=("", "_o"))
    assert len(chk) == len(ns)
    assert (chk["freq"] == chk["freq_o"]).all()
    assert np.allclose(chk["prob"], chk["freq_o"] / chk["total"])


def test_cooccurrence_vs_pandas_oracle(anchors):
    co = stats.cooccurrence(anchors).toPandas()
    pdf = anchors.toPandas()[["doc_id", "entity"]].drop_duplicates()
    m = pdf.merge(pdf, on="doc_id")
    m = m[m["entity_x"] < m["entity_y"]]
    oracle = (
        m.groupby(["entity_x", "entity_y"]).size().reset_index(name="cocit")
    )
    merged = co.merge(
        oracle,
        left_on=["e1", "e2"],
        right_on=["entity_x", "entity_y"],
        suffixes=("", "_o"),
    )
    assert len(merged) == len(co) == len(oracle)
    assert (merged["cocit"] == merged["cocit_o"]).all()


def test_entity_stats_popularity(anchors):
    es = stats.entity_stats(anchors).toPandas()
    pdf = anchors.toPandas()
    sizes = pdf.groupby("doc_id").size().rename("n_d")
    j = pdf.join(sizes, on="doc_id")
    pop = j.assign(c=j["n_d"] - 1).groupby("entity")["c"].sum()
    merged = es.set_index("entity").join(pop.rename("pop_o"))
    assert (merged["popularity"] == merged["pop_o"]).all()


def test_scalars_consistency(anchors):
    sc = stats.corpus_scalars(anchors)
    assert sc["num_total_links"] == anchors.count()
    assert sc["num_total_pairs"] > sc["num_distinct_pairs"] > 0


def test_lambda_potential_properties(anchors):
    es = stats.entity_stats(anchors)
    sc = stats.corpus_scalars(anchors)
    lam = stats.with_lambda_potential(stats.cooccurrence(anchors), es, sc)
    pdf = lam.toPandas()
    assert pdf["lambda_potential"].notna().all()
    assert np.isfinite(pdf["lambda_potential"]).all()
    # diagonal rows exist (self-cocitation — EntityCooccurrenceIndex.scala:146-154)
    assert (pdf["e1"] == pdf["e2"]).any()
    # more co-citation ⇒ larger potential, holding the entity pair's
    # popularity fixed is impossible here, so check the global trend
    hi = pdf[pdf["cocit"] >= pdf["cocit"].quantile(0.9)]["lambda_potential"].mean()
    lo = pdf[pdf["cocit"] <= pdf["cocit"].quantile(0.1)]["lambda_potential"].mean()
    assert hi > lo
