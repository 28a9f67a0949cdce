"""Parameter-table scale stress (VERDICT r4 #4).

SCALE.md claims the per-parameter fit's update joins are driven by
PARAMETER-TABLE size, not corpus size, with zero driver-side parameter
traffic. This tool turns that claim into a measured datapoint: it runs
``param_learning.learn_param_tables`` on the FIXED seeded contract
corpus while inflating the initial parameter tables with synthetic keys
(distinct surfaces/pairs the corpus never mentions), and reports
seconds/round at each key count.

The synthetic keys are invisible to the gradient job (the candidate ⋈
rho_params probe is an inner join on observed keys; the synthetic λ
pairs never appear in the conv-pair probe) but flow through the two
keyed AdaGrad update joins every round — exactly the cost component the
claim is about. Because their grad is NULL and w == w0, AdaGrad leaves
them untouched, so the fit restricted to REAL keys must be
bit-identical at every inflation level; the tool asserts that with a
fixed-point checksum and reports ``checksum_ok``.

Usage::

    python tools/param_scale_bench.py [--extra 0 30000 100000 300000]
                                      [--rounds 3] [--cores 32]

Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _inflate(df, extra: int, kind: str):
    """Union `extra` synthetic parameter keys onto an init table. Keys
    use id ranges no corpus entity/surface occupies (entity ≥ 10^7,
    ngram prefix 'zz_syn_'), initialized at w == w0 so the proximal
    AdaGrad update is a provable no-op for them."""
    from pyspark.sql import functions as F

    if extra <= 0:
        return df
    spark = df.sparkSession
    base = spark.range(extra)
    if kind == "rho":
        ex = base.select(
            F.concat(F.lit("zz_syn_"), F.col("id")).alias("ngram"),
            (F.col("id") + F.lit(10_000_000)).cast("long").alias("entity"),
            F.lit(-5.0).alias("w0"), F.lit(-5.0).alias("w"),
            F.lit(0.0).alias("sq"),
        )
    else:
        ex = base.select(
            (F.col("id") + F.lit(10_000_000)).cast("long").alias("e1"),
            (F.col("id") + F.lit(20_000_000)).cast("long").alias("e2"),
            F.lit(0.5).alias("w0"), F.lit(0.5).alias("w"),
            F.lit(0.0).alias("sq"),
        )
    return df.unionByName(ex)


def _real_checksum(rho_p, lam_p) -> int:
    """Fixed-point checksum of the fitted values on REAL keys only."""
    from pyspark.sql import functions as F

    r = rho_p.where(~F.col("ngram").startswith("zz_syn_")).agg(
        F.sum(F.round(F.col("w") * 1e6).cast("long")).alias("s")
    ).collect()[0]["s"]
    l = lam_p.where(F.col("e1") < 10_000_000).agg(
        F.sum(F.round(F.col("w") * 1e6).cast("long")).alias("s")
    ).collect()[0]["s"]
    return int(r or 0) * 31 + int(l or 0)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--extra", type=int, nargs="+",
                    default=[0, 30_000, 100_000, 300_000],
                    help="synthetic keys added to EACH table per run")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from pboh_spark import learning, param_learning, resolve
    from pboh_spark.session import get_spark

    spark = get_spark(cores=args.cores, app_name="param_scale_bench")
    gold, mentions, cand, lam, scalars = entry._seeded_resolve_inputs(spark)
    cand_gold = learning.learning_candidates(cand, mentions, gold)
    cand_gold = cand_gold.localCheckpoint()  # inputs off the clock
    lam = lam.localCheckpoint()
    lam_const = resolve.backoff_lam_const(scalars)

    orig_rho, orig_lam = (
        param_learning.init_rho_params, param_learning.init_lambda_params
    )
    rows, baseline_ck = [], None
    for extra in args.extra:
        param_learning.init_rho_params = lambda cg, e=extra: _inflate(
            orig_rho(cg), e, "rho"
        )
        param_learning.init_lambda_params = lambda lt, mc=4, e=extra: _inflate(
            orig_lam(lt, mc), e, "lam"
        )
        try:
            t0 = time.time()
            rho_p, lam_p, hist = param_learning.learn_param_tables(
                cand_gold, lam, n_rounds=args.rounds, lam_const=lam_const
            )
            dt = time.time() - t0
            # counts OFF the clock: they scan the (inflated) tables and
            # would contaminate exactly the slope this tool measures
            n_rho, n_lam = rho_p.count(), lam_p.count()
        finally:
            param_learning.init_rho_params = orig_rho
            param_learning.init_lambda_params = orig_lam
        ck = _real_checksum(rho_p, lam_p)
        if baseline_ck is None:
            baseline_ck = ck
        rows.append({
            "extra_keys_per_table": extra,
            "rho_keys": n_rho,
            "lam_keys": n_lam,
            "total_sec": round(dt, 2),
            "sec_per_round": round(dt / max(len(hist), 1), 2),
            "rounds_run": len(hist),
            "checksum_ok": ck == baseline_ck,
        })
        print(f"extra={extra}: {rows[-1]}", file=sys.stderr)
    print(json.dumps({
        "metric": "param_scale_bench",
        "rounds": args.rounds,
        "corpus": "seeded 40-conv contract corpus (fixed)",
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
