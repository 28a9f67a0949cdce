"""Head-to-head benchmark of the two connected-components algorithms
(cluster.connected_components = hash-to-min + pointer jumping,
cluster.connected_components_star = alternating large-star/small-star,
Kiveris et al. SoCC'14) on three graph shapes:

* lsh    — the real minhash-LSH near-dup graph of sf0.1 documents
           (near-clique components, diameter ≤ ~2): the production shape.
* chain  — one 2,000-vertex path (worst-case diameter): stresses round
           count; hash-to-min needs O(log d) rounds via pointer jumping,
           star contracts geometrically.
* skew   — one 3,000-vertex star hub + 500 size-4 cliques: one giant
           skewed key next to many small ones (the AQE skew-join case).

Both algorithms must produce IDENTICAL labels on every graph (asserted
— min-id component contract); the benchmark is time + driver rounds.
Run: python tools/cc_bench.py  →  prints a BENCH.md-ready table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"


def graphs(spark):
    from pyspark.sql import functions as F

    from pboh_spark.ops.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lsh = minhash_lsh_pairs(d, "text", k=3, n_hashes=32, n_bands=8).select(
        F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v")
    )

    n = 2000
    chain = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )

    hub = spark.range(1, 3000).select(
        F.lit(0).cast("long").alias("u"), F.col("id").alias("v")
    )
    cliq = (
        spark.range(500)
        .select(F.explode(F.array([F.lit(i) for i in range(4)])).alias("m"),
                F.col("id"))
        .select((10_000 + F.col("id") * 4 + F.col("m")).alias("vid"),
                F.col("id"))
    )
    a, b = cliq.alias("a"), cliq.alias("b")
    cliq_edges = (
        a.join(b, "id")
        .where(F.col("a.vid") < F.col("b.vid"))
        .select(F.col("a.vid").alias("u"), F.col("b.vid").alias("v"))
    )
    skew = hub.union(cliq_edges)

    return {"lsh": lsh, "chain": chain, "skew": skew}


def main() -> None:
    from pboh_spark import cluster
    from pboh_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=16)
    out = {}
    for gname, edges in graphs(spark).items():
        edges = edges.localCheckpoint(eager=True)  # exclude gen cost
        labels = {}
        for aname, fn in (
            ("hash_to_min", cluster.connected_components),
            ("large_small_star", cluster.connected_components_star),
        ):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                lab = fn(edges, "u", "v")
                n = lab.count()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            labels[aname] = lab
            out[f"{gname}/{aname}"] = {"sec": round(best, 3), "vertices": n}
        # identical min-id labels — the correctness gate of the benchmark
        diff = (
            labels["hash_to_min"]
            .exceptAll(labels["large_small_star"])
            .count()
        )
        assert diff == 0, f"{gname}: label mismatch ({diff} rows)"
        out[f"{gname}/match"] = True
    print(json.dumps(out, indent=2))
    print()
    print("| graph | hash-to-min (s) | large/small-star (s) | labels match |")
    print("|---|---|---|---|")
    for g in ("lsh", "chain", "skew"):
        print(
            f"| {g} | {out[f'{g}/hash_to_min']['sec']} | "
            f"{out[f'{g}/large_small_star']['sec']} | yes |"
        )


if __name__ == "__main__":
    main()
