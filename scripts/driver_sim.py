"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on a BARE SparkSession (no
engine confs — same as the driver's own session) at sf0.01, runs the
matching oracle_sql() on DuckDB over the same parquet, and compares:
row count, sorted column names, and values (columns sorted by name,
rows sorted, doubles at ~1e-9 relative tolerance).

Usage: python scripts/driver_sim.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


class NonScalarColumn(Exception):
    """The driver's pandas-based canonicalizer crashes on list/dict cells
    (unhashable in its sort) — so the replica must treat them as a hard
    FAIL, not quietly tuple-ize them (that is exactly how q34 slipped
    through the r02 local gate while failing the real driver)."""


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # ~1e-12 relative: STRICTER than r02's 1e-9 — the driver's hash
        # flipped on q28/q39/q41 noise that .9g absorbed. Queries must
        # ROUND float aggregates at the source instead of relying on
        # gate tolerance.
        return float(f"{v:.12g}")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, dict, set)):
        raise NonScalarColumn(f"non-scalar cell {type(v).__name__}")
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is not None, str(x)) for x in t))


# dtype parity (the q41 HUGEINT seam, closed as a class) — shared with
# tests/test_oracle.py; see module docstring there.
from dbt_icebreaker_spark.oracle_parity import dtype_parity_problems  # noqa: E402


def main():
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = [n for n in sorted(qs) if not FILTERS or any(f in n for f in FILTERS)]
    n_pass = n_fail = n_ro = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ro   {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_ro += 1
            continue
        try:
            res = duck.execute(oracles[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {str(ex)[:300]}")
            n_fail += 1
            continue
        problems = dtype_parity_problems(
            duck, oracles[name], {c.lower(): t for c, t in sdf.dtypes}
        )
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            try:
                sn, dn = norm_rows(scols, srows), norm_rows(dcols, drows)
            except NonScalarColumn as ex:
                sn = dn = None
                problems.append(
                    f"{ex} — the driver's canonicalizer cannot sort this; "
                    "stringify the column (array_join) on both sides"
                )
            if sn is not None and sn != dn:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:3]
                problems.append(f"values, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)[:500]}")
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_ro} run-only, {n_fail} FAIL of {len(names)}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


def _wrapped_main() -> None:
    """Re-exec with stderr folded into stdout and enforce the T83
    zero-ERROR criterion (r12 verdict task 8): Spark 4.1's
    ExecutionListenerBus logs ERROR-level lines when a registered
    listener sees a failed analysis — the engine's listener-silent
    probe sessions (runner.py:88) keep the bus quiet, and this check
    makes any regression fail the replica run itself instead of
    waiting for a judge to grep the log. Our own gate lines say
    FAIL/ok, never ERROR, so the grep cannot self-trigger."""
    import subprocess

    env = dict(os.environ, DRIVER_SIM_NO_WRAP="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env,
    )
    err_lines = []
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        if " ERROR " in line or line.startswith("ERROR"):
            err_lines.append(line.rstrip())
    rc = proc.wait()
    if err_lines:
        print(f"\nREPLICA LOG CHECK: {len(err_lines)} ERROR-level "
              "lines — T83 zero-ERROR criterion VIOLATED:")
        for line in err_lines[:10]:
            print("  " + line)
        sys.exit(rc or 2)
    print("\nREPLICA LOG CHECK: zero ERROR-level lines "
          "(T83 criterion met)")
    sys.exit(rc)


if __name__ == "__main__":
    if os.environ.get("DRIVER_SIM_NO_WRAP"):
        main()
    else:
        _wrapped_main()
