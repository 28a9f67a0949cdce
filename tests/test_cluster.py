"""Stage 6: connected components vs a union-find oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pboh_spark import cluster


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _oracle(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {x: uf.find(x) for x in list(uf.p)}


def _random_edges(rng, n_nodes, n_edges):
    return [
        (int(rng.integers(n_nodes)), int(rng.integers(n_nodes)))
        for _ in range(n_edges)
    ]


@pytest.mark.parametrize("algo", [
    cluster.connected_components, cluster.connected_components_star
])
def test_cc_random_graphs(spark, algo):
    rng = np.random.default_rng(13)
    edges = [e for e in _random_edges(rng, 200, 150) if e[0] != e[1]]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["mention_id_a", "mention_id_b"])
    )
    got = {r["id"]: r["cluster_id"] for r in algo(df).collect()}
    want = _oracle(edges)
    # canonical min-label: roots must agree exactly
    # (both use min element of component)
    comp_want = {}
    for k, v in want.items():
        comp_want.setdefault(v, set()).add(k)
    for root, members in comp_want.items():
        labels = {got[m] for m in members}
        assert len(labels) == 1, f"component {root} split: {labels}"
        assert labels == {min(members)}


def test_cc_chain_graph(spark):
    """Long chain — worst case diameter for label propagation; must still
    converge within the iteration bound."""
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["mention_id_a", "mention_id_b"])
    )
    got = cluster.connected_components(df, max_iter=30).collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert len(got) == n


def test_clusters_table_keeps_singletons(spark):
    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "mention_id": [1, 2, 3],
                "conv_id": ["a", "a", "b"],
                "turn_idx": [0, 1, 0],
                "ngram": ["x", "y", "z"],
            }
        )
    )
    comp = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "cluster_id": [1, 1]})
    )
    out = {r["mention_id"]: r["cluster_id"]
           for r in cluster.clusters_table(mentions, comp).collect()}
    assert out == {1: 1, 2: 1, 3: 3}
