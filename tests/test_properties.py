"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5: it has none): random-graph connected components
against a pure-Python union-find oracle, and Jaro-Winkler metric
invariants on arbitrary strings."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pboh_spark.pairs import jaro_winkler

# ---------------------------------------------------------------------------
# Jaro-Winkler invariants (pure function — no Spark session needed)
# ---------------------------------------------------------------------------

_texts = st.text(alphabet=string.ascii_lowercase + " ", max_size=24)


@given(_texts, _texts)
def test_jw_symmetric_and_bounded(a, b):
    x = jaro_winkler(a, b)
    y = jaro_winkler(b, a)
    assert abs(x - y) < 1e-12
    assert 0.0 <= x <= 1.0


@given(_texts)
def test_jw_identity(a):
    assert jaro_winkler(a, a) == 1.0


# ---------------------------------------------------------------------------
# connected components vs union-find oracle
# ---------------------------------------------------------------------------

def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


_edges = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_edges)
def test_cc_matches_union_find(spark, edges):
    from pboh_spark.cluster import connected_components

    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges],
        "mention_id_a bigint, mention_id_b bigint",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    want = _union_find_components(
        [(u, v) for u, v in edges if u != v]
    )
    # union-find canonicalizes to the min of each component, as does
    # hash-to-min; vertex sets differ only by self-loop-only vertices,
    # which connected_components drops (u != v filter)
    assert got == {x: r for x, r in want.items()}


# ---------------------------------------------------------------------------
# int-pair packing (F8) — symmetric + recoverable (pure numpy)
# ---------------------------------------------------------------------------

@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
def test_pack_symmetric_and_recoverable(a, b):
    import numpy as np

    from pboh_spark.resolve import _pack

    p1 = int(_pack(np.array([a]), np.array([b]))[0])
    p2 = int(_pack(np.array([b]), np.array([a]))[0])
    assert p1 == p2  # unordered-pair key
    lo, hi = p1 >> 32, p1 & 0xFFFFFFFF
    assert (lo, hi) == (min(a, b), max(a, b))  # injective, recoverable
