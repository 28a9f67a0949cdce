#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the linkage
pipeline's candidate-pairs-scored/sec (the BASELINE.json throughput
metric) on the seeded synthetic transcript corpus sized to the same sf.

Prints ONE JSON line:
  {"metric": "headline_suite_sec", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pairs_scored": N, "pairs_per_sec": X}

--scaling runs the linkage job at local[N] and local[4N] on the SAME
input and reports both throughputs + efficiency (the sandbox stand-in
for the N vs 4N executor criterion) and appends the result to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the headline suite: one per operator family (relational agg/join chain,
# PBOH potentials, pair scoring, dedup LSH, clustering, text, ANN)
BENCH_QUERIES = [
    "rel_q1_pricing_summary",
    "rel_q3_top_orders",
    "rel_q5_nation_revenue",
    "rel_window_running",
    "stat_name_stats",
    "stat_lambda_potential",
    "link_pair_scoring",
    "dedup_lsh_pairs",
    "dedup_simhash",
    "cc_components",
    "text_quality",
    "text_fingerprint",
    "ann_cosine_topk",
]


def _force(df) -> None:
    """Fully materialize (noop sink: computes every column, writes nothing)."""
    df.write.format("noop").mode("overwrite").save()


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


def linkage_pairs_throughput(
    spark, n_conversations: int, block_cap: int = 64
) -> tuple[int, float]:
    """Blocking → within-block self-join → vectorized pair scoring on the
    seeded synthetic corpus; returns (pairs_scored, seconds). The corpus is
    deterministic and identical at any parallelism (synth seeds per conv)."""
    from pboh_spark import blocking, stats, synth
    from pboh_spark import pairs as pairs_mod
    from pboh_spark.normalize import extract_mentions

    uni = synth.EntityUniverse()
    transcripts, _ = synth.generate_transcripts(
        spark, n_conversations, universe=uni, partitions=128
    )
    anchors = synth.generate_anchors(spark, 4000, universe=uni)
    ns = stats.name_stats(anchors).cache()
    ns.count()
    # materialize the input corpus before the clock starts — the metric is
    # pairs-scored/sec of the blocking+scoring stages, not synth generation
    mentions = extract_mentions(transcripts).cache()
    mentions.count()

    t0 = time.time()
    cb = blocking.candidate_blocks(mentions, ns, top_k=10)
    mh = blocking.minhash_blocks(mentions, ns, oov_only=True)
    salted, _ = blocking.salt_and_cap(cb.unionByName(mh), cap=block_cap)
    scored = pairs_mod.score_pairs(pairs_mod.candidate_pairs(salted))
    n_pairs = scored.count()
    return n_pairs, time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run linkage at local[N] and local[4N], report efficiency")
    ap.add_argument("--n", type=int, default=8, help="N for the scaling run")
    ap.add_argument("--n-conversations", type=int, default=None)
    args = ap.parse_args()

    from pboh_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    n_conv = args.n_conversations or max(200, int(sf * 20000))

    if args.scaling:
        from pyspark.sql import SparkSession

        results = {}
        for cores in (args.n, 4 * args.n):
            active = SparkSession.getActiveSession()
            if active:
                active.stop()
            spark = get_spark(cores=cores, app_name=f"bench_scaling_{cores}")
            # warm-up: JVM/codegen/Python-worker pool
            linkage_pairs_throughput(spark, max(50, n_conv // 20))
            n_pairs, secs = linkage_pairs_throughput(spark, n_conv)
            results[cores] = {
                "pairs_scored": n_pairs,
                "sec": round(secs, 2),
                "pairs_per_sec": round(n_pairs / secs, 1),
            }
            spark.stop()
        lo, hi = args.n, 4 * args.n
        eff = results[hi]["pairs_per_sec"] / (4 * results[lo]["pairs_per_sec"])
        out = {
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "n_cores": lo,
            "n4_cores": hi,
            "results": results,
            "n_conversations": n_conv,
        }
        print(json.dumps(out))
        return

    spark = get_spark(cores=CPUS, app_name="bench")
    times = run_headline(spark, SF_DIR)
    n_pairs, secs = linkage_pairs_throughput(spark, n_conv)
    times["linkage_pairs"] = round(secs, 3)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pairs_scored": n_pairs,
        "pairs_per_sec": round(n_pairs / secs, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
