"""Run every driver-contract query at two parallelism levels and diff
order-insensitive value hashes — proves the whole contract is
partitioning-deterministic (the driver's correctness gate hashes values,
so any partition-order dependence would show up as a flaky round).

    python tools/determinism_sweep.py          # local[8]/16 vs local[32]/64

Each level runs in its own subprocess (one SparkSession per JVM).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_RUNNER = r"""
import hashlib, json, sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from pboh_spark.session import get_spark

cores, parts = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(cores=cores, shuffle_partitions=parts)
sf = "/root/testdata/sf0.01"
out = {{}}
for name, fn in e.queries().items():
    df = fn(spark, sf).toPandas()
    cols = sorted(df.columns)
    rows = sorted(
        tuple(str(round(v, 8)) if isinstance(v, float) else str(v) for v in r)
        for r in df[cols].itertuples(index=False, name=None)
    )
    out[name] = hashlib.md5(repr(rows).encode()).hexdigest()
print(json.dumps(out))
"""


def _run(cores: int, parts: int) -> dict[str, str]:
    script = _RUNNER.format(repo=str(REPO))
    res = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(parts)],
        capture_output=True, text=True, cwd=str(REPO), check=True,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    print("level 1: local[8], 16 shuffle partitions ...", flush=True)
    a = _run(8, 16)
    print("level 2: local[32], 64 shuffle partitions ...", flush=True)
    b = _run(32, 64)
    diff = sorted(k for k in a if a[k] != b[k])
    if diff:
        print(f"NONDETERMINISTIC ({len(diff)}): {diff}")
        sys.exit(1)
    print(f"{len(a)} queries — all hashes identical across levels")


if __name__ == "__main__":
    main()
