"""End-to-end pipeline orchestration + spark-submit CLI.

Stage graph (each stage checkpointed, resumable — checkpoint.py):

    transcripts ──► s1_mentions ──► s3_blocked ──► s4_pairs ──► s6_components
    anchors ─► s2_name_stats/entity_stats/cooccurrence ─┐
                                    └─► s5_assignments ◄┘  (LBP linking)

Run: spark-submit --py-files pboh_spark.zip -m pboh_spark.pipeline
     --input <transcripts> --anchors <anchors> --out <dir> [--cores N]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pboh_spark import blocking, cluster, evaluate, normalize, resolve, stats, synth
from pboh_spark import pairs as pairs_mod
from pboh_spark.checkpoint import StageCheckpointer
from pboh_spark.session import get_spark


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    anchors: DataFrame,
    out_dir: str,
    threshold: float = 0.65,
    block_cap: int = 512,
    top_k: int = 10,
    with_lbp: bool = True,
) -> dict:
    """Full run; returns metrics dict. All stages via StageCheckpointer —
    re-invoking with the same out_dir resumes after the last complete
    stage."""
    ck = StageCheckpointer(spark, out_dir)
    t0 = time.time()

    mentions = ck.run_stage(
        "s1_mentions", lambda: normalize.extract_mentions(transcripts)
    )
    name_stats = ck.run_stage("s2_name_stats", lambda: stats.name_stats(anchors))
    ent_stats = ck.run_stage("s2_entity_stats", lambda: stats.entity_stats(anchors))
    scalars = stats.corpus_scalars(anchors)
    lam = ck.run_stage(
        "s2_lambda",
        lambda: stats.with_lambda_potential(
            stats.cooccurrence(anchors), ent_stats, scalars
        ),
        upstream=["s2_entity_stats"],
    )

    def build_blocked() -> DataFrame:
        cb = blocking.candidate_blocks(mentions, name_stats, top_k=top_k)
        mh = blocking.minhash_blocks(mentions, name_stats, oov_only=True)
        salted, _ = blocking.salt_and_cap(cb.unionByName(mh), cap=block_cap)
        return salted

    blocked = ck.run_stage(
        "s3_blocked",
        build_blocked,
        upstream=["s1_mentions", "s2_name_stats"],
        repartition_by="block_key",
    )

    scored = ck.run_stage(
        "s4_pairs",
        lambda: pairs_mod.score_pairs(
            pairs_mod.candidate_pairs(blocked), lam, threshold=threshold
        ),
        upstream=["s3_blocked", "s2_lambda"],
    )

    components = ck.run_stage(
        "s6_components",
        lambda: cluster.connected_components(scored.where("is_match_pred")),
        upstream=["s4_pairs"],
    )
    clusters = ck.run_stage(
        "s6_clusters",
        lambda: cluster.clusters_table(mentions, components),
        upstream=["s6_components", "s1_mentions"],
    )

    metrics: dict = {"stages": ck.summary(), "wall_sec": round(time.time() - t0, 2)}

    if with_lbp:
        cand = ck.run_stage(
            "s5_candidates",
            lambda: resolve.mention_candidates(mentions, name_stats, ent_stats, top_k),
            upstream=["s1_mentions", "s2_name_stats", "s2_entity_stats"],
        )
        assignments = ck.run_stage(
            "s5_assignments",
            lambda: resolve.resolve_entities(
                cand,
                resolve.conv_lambda_pairs(cand, lam),
                max_product=True,
                scalars=scalars,
            ),
            upstream=["s5_candidates", "s2_lambda"],
        )
        metrics["lbp"] = {
            "n_assignments": assignments.count(),
            "pct_converged": assignments.agg(
                F.avg(F.col("converged").cast("int"))
            ).collect()[0][0],
        }

    metrics["n_pairs_scored"] = scored.count()
    metrics["n_matches"] = scored.where("is_match_pred").count()
    metrics["n_clusters"] = clusters.select("cluster_id").distinct().count()
    metrics["text_equality_violations"] = normalize.verify_text_equality(
        transcripts, normalize.normalize_turns(transcripts)
    )
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser(description="pboh_spark record-linkage pipeline")
    ap.add_argument("--input", help="transcripts parquet/iceberg path (default: synth)")
    ap.add_argument("--anchors", help="anchor corpus path (default: synth)")
    ap.add_argument("--out", required=True, help="checkpoint/output dir")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--n-conversations", type=int, default=2000)
    ap.add_argument("--threshold", type=float, default=0.65)
    ap.add_argument("--evaluate", action="store_true", help="pairwise F1 vs synth gold")
    args = ap.parse_args()

    spark = get_spark(cores=args.cores, app_name="pboh_pipeline")
    uni = synth.EntityUniverse()
    if args.input:
        transcripts = spark.read.parquet(args.input)
        gold = None
    else:
        transcripts, gold = synth.generate_transcripts(
            spark, args.n_conversations, universe=uni
        )
    anchors = (
        spark.read.parquet(args.anchors)
        if args.anchors
        else synth.generate_anchors(spark, max(args.n_conversations * 2, 4000), universe=uni)
    )
    metrics = run_pipeline(spark, transcripts, anchors, args.out, args.threshold)

    if args.evaluate and gold is not None:
        ck = StageCheckpointer(spark, args.out)
        blocked = spark.read.parquet(str(ck._paths("s3_blocked")[0]))
        comp = spark.read.parquet(str(ck._paths("s6_components")[0]))
        lp = evaluate.build_labeled_pairs(gold, blocked)
        metrics["pairwise"] = evaluate.pairwise_f1(lp, comp)
    print(json.dumps(metrics, indent=1, default=str))


if __name__ == "__main__":
    main()
