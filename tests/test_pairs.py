"""Stage 4: similarity numerics vs oracles + pair-join semantics."""

import math

import pytest
from pyspark.sql import functions as F

from pboh_spark import blocking, pairs


# Known Jaro-Winkler values (textbook examples)
@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("martha", "marhta", 0.9611),
        ("dixon", "dicksonx", 0.8133),
        ("jellyfish", "smellyfish", 0.8962),
        ("abc", "abc", 1.0),
        ("abc", "xyz", 0.0),
    ],
)
def test_jaro_winkler_known_values(a, b, expected):
    assert math.isclose(pairs.jaro_winkler(a, b), expected, abs_tol=1e-3)


def test_candidate_pairs_antidiagonal_and_dedup(spark):
    import pandas as pd
    rows = [
        ("k1", "c0", 0, 1, "alpha", 10, 0.9),
        ("k1", "c0", 1, 2, "alpha", 10, 0.9),
        ("k2", "c0", 0, 1, "alpha", 11, 0.1),  # same mentions, 2nd shared cand
        ("k2", "c0", 1, 2, "alpha", 11, 0.1),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "block_key", "conv_id", "turn_idx", "mention_id",
                "ngram", "cand_entity", "prob",
            ],
        )
    )
    cp = pairs.candidate_pairs(df).collect()
    assert len(cp) == 1  # deduped across the two shared blocks
    row = cp[0]
    assert row["mention_id_a"] < row["mention_id_b"]
    # prior agreement sums over shared candidates: .9*.9 + .1*.1
    assert math.isclose(row["prior_agreement"], 0.82, abs_tol=1e-9)
    assert row["shared_entity"] == 10  # the higher-agreement candidate


def test_score_separation(spark):
    """Same-entity surface variants score above threshold; different
    entities below."""
    import pandas as pd
    rows = [
        # (a, b, prior_agreement, shared)
        ("marco dubois", "m dubois", 0.9, 5),
        ("marco dubois", "marco duboiss", 0.9, 5),
        ("summit logistics holdings", "summit capital holdings", 0.05, 7),
        ("walter schneider", "petra takahashi", 0.0, None),
    ]
    pdf = pd.DataFrame(
        [
            (i, 100 + i, "c0", "c1", 0, 0, a, b, pa, sh, "k")
            for i, (a, b, pa, sh) in enumerate(rows)
        ],
        columns=[
            "mention_id_a", "mention_id_b", "conv_id_a", "conv_id_b",
            "turn_idx_a", "turn_idx_b", "ngram_a", "ngram_b",
            "prior_agreement", "shared_entity", "block_key",
        ],
    )
    df = spark.createDataFrame(pdf)
    out = {
        (r["ngram_a"], r["ngram_b"]): r
        for r in pairs.score_pairs(df).collect()
    }
    assert out[("marco dubois", "m dubois")]["is_match_pred"]
    assert out[("marco dubois", "marco duboiss")]["is_match_pred"]
    assert not out[
        ("summit logistics holdings", "summit capital holdings")
    ]["is_match_pred"]
    assert not out[("walter schneider", "petra takahashi")]["is_match_pred"]


def test_embedding_cosine_fuses_into_score(spark):
    """north_star's third similarity: identical vectors must raise the
    fused score above orthogonal ones, missing vectors take the neutral
    0.5, and w_cos=0 leaves the classic score untouched."""
    import pandas as pd

    from pboh_spark import pairs as pm

    rows = pd.DataFrame(
        {
            "mention_id_a": [1, 3, 5],
            "mention_id_b": [2, 4, 6],
            "ngram_a": ["acme corp", "acme corp", "acme corp"],
            "ngram_b": ["acme corp", "acme corp", "acme corp"],
            "prior_agreement": [0.5, 0.5, 0.5],
            "shared_entity": [None, None, None],
            "vec_a": [[1.0, 0.0], [1.0, 0.0], None],
            "vec_b": [[1.0, 0.0], [0.0, 1.0], None],
        }
    )
    df = spark.createDataFrame(
        rows,
        "mention_id_a bigint, mention_id_b bigint, ngram_a string, "
        "ngram_b string, prior_agreement double, shared_entity bigint, "
        "vec_a array<double>, vec_b array<double>",
    )
    out = {
        r["mention_id_a"]: r
        for r in pm.score_pairs(df, w_cos=0.2).collect()
    }
    same, orth, miss = out[1], out[3], out[5]
    assert abs(same["emb_cos_sim"] - 1.0) < 1e-9
    assert abs(orth["emb_cos_sim"] - 0.5) < 1e-9
    assert abs(miss["emb_cos_sim"] - 0.5) < 1e-9
    assert same["score"] > orth["score"]
    # w_cos=0 (default) is byte-compatible with the classic score
    base = {r["mention_id_a"]: r["score"] for r in pm.score_pairs(df).collect()}
    assert abs(base[1] - base[3]) < 1e-12
