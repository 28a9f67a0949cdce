"""Interleaved A/B bench harness: HEAD vs a reference commit.

Regression triage tool. Box drift on this machine swings absolute
timings 10-40% across a day, so a BENCH_rN vs BENCH_r(N-1) delta alone
cannot distinguish "code got slower" from "box got slower". This tool
answers that question in one command by running the SAME job in
interleaved subprocess trials (ref, head, ref, head, ...) inside one
session, so both sides see the same box state, then reporting each
side's trials, best, median, and the best-vs-best ratio with the
per-side noise band.

Each trial is a fresh subprocess (fresh JVM): the clock inside
``linkage_pairs_throughput`` already excludes synth/session setup, and a
fresh JVM per trial removes JIT/cache carry-over as a confounder between
the two sides.

Usage::

    python tools/bench_ab.py 868e495 --n-conversations 2000 --trials 3
    python tools/bench_ab.py <commit> --inner-trials 3 --surface

The measured job is the full ``linkage_pairs_throughput`` path (the
suite's only cross-round headline with its own protocol); A/B-ing a
different suite query means pointing ``_TRIAL_SCRIPT`` at it.

The ref commit is materialized as a git worktree under /tmp (reused if
it already exists) and each ref trial runs with cwd + sys.path pointed
at that tree, so the ref side imports its OWN bench.py and pboh_spark.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Runs inside each trial subprocess with cwd at the tree under test.
_TRIAL_SCRIPT = """
import json, sys
sys.path.insert(0, ".")
import bench
from pboh_spark.session import get_spark

cfg = json.loads(sys.argv[1])
spark = get_spark(cores=cfg["cores"], shuffle_partitions=cfg["shuffle_partitions"])
inner = []
for _ in range(cfg["inner_trials"]):
    pairs, secs = bench.linkage_pairs_throughput(
        spark, cfg["n_conversations"], block_cap=cfg["block_cap"],
        surface_mode=cfg["surface"],
    )
    inner.append(round(secs, 3))
print("TRIAL_RESULT " + json.dumps(
    {"pairs": pairs, "secs": min(inner), "inner_sec": inner}))
spark.stop()
"""


def _worktree_for(commit: str) -> Path:
    """Materialize (or reuse) a read-only worktree at ``commit``."""
    sha = subprocess.run(
        ["git", "rev-parse", "--short", commit],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    path = Path(f"/tmp/bench_ab_{sha}")
    if not (path / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(path), sha],
            cwd=REPO, check=True,
        )
    return path


def _run_trial(tree: Path, cfg: dict) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _TRIAL_SCRIPT, json.dumps(cfg)],
        cwd=tree, capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("TRIAL_RESULT "):
            return json.loads(line[len("TRIAL_RESULT "):])
    raise RuntimeError(
        f"trial in {tree} produced no result:\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )


def _side_stats(trials: list[dict]) -> dict:
    secs = sorted(t["secs"] for t in trials)
    return {
        "trials_sec": secs,
        "best_sec": secs[0],
        "median_sec": statistics.median(secs),
        # spread of the side's own trials — the noise band a cross-side
        # ratio must exceed to mean anything
        "noise_band_pct": round(100 * (secs[-1] - secs[0]) / secs[0], 1),
        "pairs": trials[0]["pairs"],
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ref_commit", help="commit to A/B against HEAD")
    ap.add_argument("--trials", type=int, default=3,
                    help="interleaved subprocess rounds per side")
    ap.add_argument("--inner-trials", type=int, default=1,
                    help="warm repeats inside one subprocess; each round "
                         "reports its best (BENCH's warm best-of-N protocol)")
    ap.add_argument("--n-conversations", type=int, default=2000)
    ap.add_argument("--block-cap", type=int, default=64)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--surface", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from pboh_spark.session import DEFAULT_CPUS

    cores = args.cores or DEFAULT_CPUS
    cfg = {
        "cores": cores,
        "shuffle_partitions": args.shuffle_partitions or max(2 * cores, 8),
        "n_conversations": args.n_conversations,
        "block_cap": args.block_cap,
        "surface": args.surface,
        "inner_trials": args.inner_trials,
    }
    ref_tree = _worktree_for(args.ref_commit)
    sides = {"ref": ref_tree, "head": REPO}
    results: dict[str, list[dict]] = {"ref": [], "head": []}
    for i in range(args.trials):
        for name, tree in sides.items():
            r = _run_trial(tree, cfg)
            results[name].append(r)
            print(
                f"[trial {i + 1}/{args.trials}] {name:4s} "
                f"{r['secs']:8.3f}s  {r['pairs']} pairs",
                file=sys.stderr,
            )

    ref, head = _side_stats(results["ref"]), _side_stats(results["head"])
    if ref["pairs"] != head["pairs"]:
        print(
            f"WARNING: pair counts differ (ref {ref['pairs']} vs head "
            f"{head['pairs']}) — sides are not computing the same job",
            file=sys.stderr,
        )
    out = {
        "metric": "bench_ab",
        "job": "linkage_pairs_throughput"
        + ("(surface)" if args.surface else ""),
        "ref_commit": args.ref_commit,
        "config": cfg,
        "ref": ref,
        "head": head,
        "head_over_ref_best": round(head["best_sec"] / ref["best_sec"], 3),
        "head_over_ref_median": round(
            head["median_sec"] / ref["median_sec"], 3
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
