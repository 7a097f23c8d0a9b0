"""Dtype-parity audit between DuckDB oracle SQL and Spark query schemas.

The driver's correctness gate canonicalizes both result sets through
pandas before hashing, so the hash is sensitive to the pandas dtype of
every column, not just the values.  Two asymmetric seams exist:

- DuckDB's SUM(INTEGER) (plain or windowed) returns HUGEINT; pandas has
  no int128 so it lands as float64 (``3.0``) against Spark's int64
  (``3``) — rows+schema match, hash flips.  (Root cause of the r03
  q41_window_ratio red row, judge-verified.)
- DECIMAL: Spark ``toPandas`` yields object-dtype ``decimal.Decimal``
  while DuckDB ``.df()`` yields float64 — same flip from the other side.

This module closes the *class*: every oracle is DESCRIBEd (bind-only,
no execution) and its numeric family compared against the Spark schema.
Used by ``scripts/driver_sim.py`` (gate replica) and
``tests/test_oracle.py`` (per-entry CI audit).
"""

from __future__ import annotations

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}


def duck_family(t: str) -> str | None:
    """Numeric family of a DuckDB type name as pandas would see it."""
    t = t.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "int128"
    if t in _DUCK_INT:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "BOOLEAN":
        return "bool"
    return None  # string/temporal/nested: pandas-symmetric, skip


def spark_family(t: str) -> str | None:
    t = t.lower()
    if t in _SPARK_INT:
        return "int"
    if t in ("float", "double"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "boolean":
        return "bool"
    return None


def describe_oracle(duck, sql):
    """[(col, duckdb_type)] for an oracle without executing it."""
    return [(r[0].lower(), r[1]) for r in duck.execute("DESCRIBE " + sql).fetchall()]


def dtype_parity_problems(duck, sql, spark_dtypes=None):
    """List of dtype-parity problems for one oracle.

    ``spark_dtypes``: optional dict of lowercase column name -> Spark
    type string (from ``df.dtypes``).  Without it only the one-sided
    checks (int128 / decimal on the oracle) run.
    """
    problems = []
    try:
        desc = describe_oracle(duck, sql)
    except Exception as ex:  # malformed SQL surfaces in the main run
        return [f"describe error {str(ex)[:120]}"]
    for col, dtyp in desc:
        fam = duck_family(dtyp)
        if fam == "int128":
            problems.append(
                f"oracle col {col} is {dtyp} -> pandas float64 vs Spark int64;"
                " CAST(... AS BIGINT) in the oracle SQL"
            )
            continue
        if fam == "decimal":
            problems.append(
                f"oracle col {col} is {dtyp} -> DuckDB pandas float64 vs Spark"
                " object Decimal; CAST to DOUBLE (or BIGINT) on both sides"
            )
            continue
        if spark_dtypes is None:
            continue
        sfam = spark_family(spark_dtypes.get(col, ""))
        if fam and sfam and fam != sfam:
            problems.append(
                f"dtype family mismatch on {col}: oracle {dtyp} ({fam})"
                f" vs spark {spark_dtypes.get(col)} ({sfam})"
            )
    for col, styp in (spark_dtypes or {}).items():
        if spark_family(styp) == "decimal":
            problems.append(
                f"spark col {col} is {styp} -> toPandas object Decimal;"
                " cast to DOUBLE/BIGINT in the Spark query"
            )
    return problems
