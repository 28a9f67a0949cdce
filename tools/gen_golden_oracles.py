"""Generate golden-row DuckDB oracles for the driver-contract queries
whose outputs are deterministic (seeded synthetic corpora, no sf_dir
dependence) but not SQL-expressible: the iterative max-product LBP
resolver, the two end-to-end clustering pipelines, and the binary
mapInPandas multimodal extractor.

Determinism proof baked into generation: each query runs in TWO separate
Spark subprocesses at different parallelism (local[8]/16 shuffle
partitions vs local[32]/64) and the sorted row sets must be identical —
otherwise generation aborts. The emitted module holds one
``SELECT ... FROM (VALUES ...)`` statement per query with explicit casts
matching the Spark schema.

Regenerate after any change to pboh_spark.synth / the pipeline stages /
ops.multimodal:

    python tools/gen_golden_oracles.py
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "pboh_spark" / "_golden_oracles.py"

# query name → (column, CAST type) pairs in Spark column order
SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "pboh_resolve_lbp": [
        ("conv_id", "VARCHAR"), ("mention_id", "BIGINT"),
        ("entity", "BIGINT"), ("converged", "BOOLEAN"),
    ],
    "pboh_resolve_lbp_sumprod": [
        ("conv_id", "VARCHAR"), ("mention_id", "BIGINT"),
        ("entity", "BIGINT"), ("converged", "BOOLEAN"),
    ],
    "pboh_e2e_clusters": [
        ("mention_id", "BIGINT"), ("conv_id", "VARCHAR"),
        ("turn_idx", "INT"), ("ngram", "VARCHAR"), ("cluster_id", "BIGINT"),
    ],
    "pboh_surface_clusters": [
        ("mention_id", "BIGINT"), ("conv_id", "VARCHAR"),
        ("turn_idx", "INT"), ("ngram", "VARCHAR"), ("cluster_id", "BIGINT"),
    ],
    "multimodal_features": [
        ("media_id", "BIGINT"), ("kind", "VARCHAR"), ("n_bytes", "INT"),
    ],
    "pboh_threshold_grid": [
        ("threshold", "DOUBLE"), ("tp", "BIGINT"), ("fp", "BIGINT"),
        ("fn", "BIGINT"), ("precision", "DOUBLE"), ("recall", "DOUBLE"),
        ("f1", "DOUBLE"),
    ],
    "pboh_learn_weights": [
        ("round", "INT"), ("n_convs", "INT"), ("loss", "DOUBLE"),
        ("f", "DOUBLE"), ("g", "DOUBLE"), ("h", "DOUBLE"),
        ("b", "DOUBLE"),
    ],
    "pboh_resolve_lbp_fitted": [
        ("conv_id", "VARCHAR"), ("mention_id", "BIGINT"),
        ("entity", "BIGINT"), ("converged", "BOOLEAN"),
    ],
    "pboh_convergence_report": [
        ("bucket", "VARCHAR"), ("n_convs", "BIGINT"),
        ("n_mentions", "BIGINT"), ("avg_iters", "DOUBLE"),
        ("max_iters", "INT"), ("pct_converged", "DOUBLE"),
    ],
    "pboh_learn_param_tables": [
        ("kind", "VARCHAR"), ("ngram", "VARCHAR"), ("e1", "BIGINT"),
        ("e2", "BIGINT"), ("w0", "DOUBLE"), ("w", "DOUBLE"),
    ],
    "pboh_resolve_lbp_params": [
        ("conv_id", "VARCHAR"), ("mention_id", "BIGINT"),
        ("entity", "BIGINT"), ("converged", "BOOLEAN"),
    ],
    "link_stem_trigram": [
        ("ngram", "VARCHAR"), ("next_ngram", "VARCHAR"),
        ("stem", "VARCHAR"), ("sim", "DOUBLE"),
    ],
    "gold_aida_eval": [
        ("conv_id", "VARCHAR"), ("surface", "VARCHAR"),
        ("resolved_entity", "BIGINT"), ("numeric_gold", "BIGINT"),
        ("agree", "BOOLEAN"), ("argmax_entity", "BIGINT"),
        ("correct", "BOOLEAN"),
    ],
}

_RUNNER = r"""
import json, sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from pboh_spark.session import get_spark

cores, parts = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(cores=cores, shuffle_partitions=parts)
qs = e.queries()
out = {{}}
for name in {names!r}:
    df = qs[name](spark, "/root/testdata/sf0.001")
    rows = [[None if v is None else v for v in r] for r in df.collect()]
    out[name] = sorted(rows, key=lambda r: [str(x) for x in r])
print(json.dumps(out))
"""


def _collect(cores: int, parts: int) -> dict[str, list[list]]:
    script = _RUNNER.format(repo=str(REPO), names=list(SCHEMAS))
    res = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(parts)],
        capture_output=True, text=True, cwd=str(REPO), check=True,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def _sql(name: str, rows: list[list]) -> str:
    cols = SCHEMAS[name]
    anon = ", ".join(f"c{i}" for i in range(len(cols)))
    sel = ", ".join(
        f"CAST(c{i} AS {typ}) AS {col}" for i, (col, typ) in enumerate(cols)
    )
    vals = ",\n    ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    return f"SELECT {sel}\nFROM (VALUES\n    {vals}\n) AS t({anon})"


def main() -> None:
    print("run 1: local[8], 16 shuffle partitions ...", flush=True)
    a = _collect(8, 16)
    print("run 2: local[32], 64 shuffle partitions ...", flush=True)
    b = _collect(32, 64)
    for name in SCHEMAS:
        assert a[name] == b[name], (
            f"{name}: output differs across parallelism levels — "
            "NOT deterministic, refusing to emit a golden oracle"
        )
        assert len(a[name]) > 0, f"{name}: empty output"
        print(f"  {name}: {len(a[name])} rows, identical across runs")
    body = ",\n".join(
        f"    {name!r}: '''\n{_sql(name, a[name])}\n'''"
        for name in SCHEMAS
    )
    OUT.write_text(
        '"""AUTO-GENERATED by tools/gen_golden_oracles.py - DO NOT EDIT.\n'
        "\n"
        "Golden-row DuckDB oracles for the deterministic,\n"
        "non-SQL-expressible driver-contract queries. The generator ran\n"
        "each query at two parallelism levels (local[8]/16 partitions and\n"
        "local[32]/64) and asserted identical sorted outputs before\n"
        "emitting these rows. The queries take no input tables (seeded\n"
        "synthetic corpora), so the rows are valid at every sf.\n"
        "\n"
        "Regenerate: python tools/gen_golden_oracles.py\n"
        '"""\n\n'
        "GOLDEN_SQL: dict[str, str] = {\n" + body + ",\n}\n"
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
