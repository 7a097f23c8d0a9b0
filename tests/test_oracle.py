"""DuckDB-oracle differential tests (SURVEY §5.2 item 2) — mirrors
the driver's t2 gate: run each corpus query on Spark AND its oracle
SQL on DuckDB over the same parquet, compare row counts + sorted
values (doubles rounded to 9 significant digits, NULLs first).

Runs at sf0.001 for speed; the driver re-checks at sf0.01.
"""

from __future__ import annotations

import math

import pytest

from dbt_icebreaker_spark import queries as corpus
from dbt_icebreaker_spark.oracle_parity import (
    describe_oracle,
    duck_family,
    dtype_parity_problems,
)

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _register_duck(duck):
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # 6 significant digits: looser than the driver's ~1e-9 so that
        # float-accumulation-order noise landing exactly on a rounding
        # boundary doesn't flake the local harness
        return float(f"{v:.6g}")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(cols, rows):
    # driver sorts columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_value(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is not None, str(x)) for x in t))


ORACLES = corpus.oracle_sql()
QUERIES = corpus.queries()
CHECKED = sorted(ORACLES)
NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_match(spark, duck, name):
    _register_duck(duck)
    sdf = QUERIES[name](spark, SF_DIR)
    # dtype parity (the r03 q41 HUGEINT seam, closed as a class): the
    # driver's hash is pandas-dtype-sensitive, so an oracle HUGEINT /
    # DECIMAL column or an int-vs-float family mismatch flips the gate
    # even when every value is identical.
    dtype_problems = dtype_parity_problems(
        duck, ORACLES[name], {c.lower(): t for c, t in sdf.dtypes}
    )
    assert not dtype_problems, f"{name}: {dtype_problems}"
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sn = _norm_rows(spark_cols, spark_rows)
    dn = _norm_rows(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ][:5]
    assert sn == dn, f"{name}: value mismatch, first diffs: {mismatches}"


def test_all_oracles_dtype_clean(duck):
    """One-shot DESCRIBE audit over the ENTIRE oracle corpus (bind-only,
    no execution): zero HUGEINT/UHUGEINT/DECIMAL output columns anywhere,
    so no future driver rotation can hit the q41-class hash flip."""
    _register_duck(duck)
    bad = {}
    for name in CHECKED:
        cols = [
            (c, t) for c, t in describe_oracle(duck, ORACLES[name])
            if duck_family(t) in ("int128", "decimal")
        ]
        if cols:
            bad[name] = cols
    assert not bad, f"int128/decimal oracle columns: {bad}"


def test_parity_check_flags_hugeint(duck):
    """The parity check itself must flag a deliberately-HUGEINT oracle
    (regression test for the detector, per the r03 verdict)."""
    _register_duck(duck)
    sql = "SELECT o_orderkey, SUM(1) OVER (ORDER BY o_orderkey) AS c FROM orders"
    probs = dtype_parity_problems(duck, sql, {"o_orderkey": "bigint", "c": "bigint"})
    assert any("HUGEINT" in p for p in probs), probs
    # and the family comparison catches int-vs-float even without int128
    probs2 = dtype_parity_problems(
        duck,
        "SELECT CAST(1 AS DOUBLE) AS c",
        {"c": "bigint"},
    )
    assert any("family mismatch" in p for p in probs2), probs2


@pytest.mark.parametrize("name", NO_ORACLE)
def test_no_oracle_runs(spark, name):
    """Queries without oracles (approximate/stub ops) must still run
    and return a stable schema."""
    sdf = QUERIES[name](spark, SF_DIR)
    rows = sdf.collect()
    assert sdf.columns  # non-empty schema
    assert isinstance(rows, list)
