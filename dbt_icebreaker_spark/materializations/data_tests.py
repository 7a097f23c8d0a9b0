"""dbt generic data tests (unique / not_null / accepted_values /
relationships) — the test half of a dbt adapter's contract. The
reference inherits these from dbt-core's default SQL implementations
(each test compiles to a SELECT returning VIOLATING rows; the test
passes when it returns zero rows — dbt-adapters' generic test
macros); here each is the equivalent declarative DataFrame query, so
Catalyst plans them like any other aggregation/join.

Scale notes: `unique` is one hash-aggregate on the tested column;
`relationships` is an anti-join whose parent side is the
key-distinct projection (broadcast when small, AQE otherwise);
`not_null`/`accepted_values` are scan-level filters that push down to
parquet. `store_failures` mirrors dbt's flag: violating rows persist
to an audit table for debugging instead of only being counted.
dbt's `where` config is supported per spec (the filter composes
before the test query, exactly like dbt's jinja-rendered subquery).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _base(spark: SparkSession, table: str, where: Optional[str]) -> DataFrame:
    df = spark.table(table)
    return df.filter(F.expr(where)) if where else df


def unique_violations(
    spark: SparkSession, table: str, column: str, where: Optional[str] = None
) -> DataFrame:
    """Values appearing more than once (dbt `unique`). NULLs are
    excluded — dbt's default__test_unique filters `where column is
    not null` (NULL keys are not_null's job)."""
    return (
        _base(spark, table, where)
        .filter(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("value"))
        .count()
        .filter(F.col("count") > 1)
    )


def not_null_violations(
    spark: SparkSession, table: str, column: str, where: Optional[str] = None
) -> DataFrame:
    return _base(spark, table, where).filter(F.col(column).isNull())


def accepted_values_violations(
    spark: SparkSession,
    table: str,
    column: str,
    values: Sequence[Any],
    where: Optional[str] = None,
) -> DataFrame:
    """Non-NULL values outside the accepted set (dbt ignores NULLs
    here — not_null is a separate test)."""
    return (
        _base(spark, table, where)
        .filter(F.col(column).isNotNull() & ~F.col(column).isin(list(values)))
        .groupBy(F.col(column).alias("value"))
        .count()
    )


def relationships_violations(
    spark: SparkSession,
    table: str,
    column: str,
    to_table: str,
    to_column: str,
    where: Optional[str] = None,
) -> DataFrame:
    """Child values with no matching parent (referential integrity).
    NULL children pass, per dbt. Parent side reduced to its distinct
    keys before the anti-join."""
    child = _base(spark, table, where).filter(F.col(column).isNotNull())
    parent = spark.table(to_table).select(
        F.col(to_column).alias(column)
    ).distinct()
    return child.join(parent, column, "left_anti")


_TESTS = {
    "unique": (unique_violations, {"table", "column", "where"}),
    "not_null": (not_null_violations, {"table", "column", "where"}),
    "accepted_values": (
        accepted_values_violations,
        {"table", "column", "values", "where"},
    ),
    "relationships": (
        relationships_violations,
        {"table", "column", "to_table", "to_column", "where"},
    ),
}


def _default_name(spec: dict) -> str:
    parts = [spec["test"], spec["table"].replace(".", "_"), spec["column"]]
    if spec["test"] == "relationships":
        # two relationships tests on the same (table, column) against
        # different parents must not collide (names key audit tables)
        parts.append(spec["to_table"].replace(".", "_"))
    return "_".join(parts)


def run_data_tests(
    spark: SparkSession,
    specs: Sequence[dict],
    store_failures_schema: Optional[str] = None,
    limit: int = 100,
) -> list[dict]:
    """Run a list of test specs, dbt-style. Each spec:
    ``{"test": "unique", "table": t, "column": c, ...kwargs}`` plus
    optional ``name`` and dbt's ``where``. Returns one result dict
    per spec (name, status pass/fail, failures count, sample). With
    ``store_failures_schema``, violating rows persist to
    ``<schema>.<name>`` (dbt's --store-failures)."""
    results = []
    for spec in specs:
        kind = spec.get("test")
        if kind not in _TESTS:
            raise ValueError(
                f"unknown test {kind!r}; supported: {sorted(_TESTS)}"
            )
        fn, allowed = _TESTS[kind]
        kwargs = {k: v for k, v in spec.items() if k not in ("test", "name")}
        unknown = set(kwargs) - allowed
        if unknown:
            raise ValueError(
                f"test {kind!r}: unsupported spec key(s) {sorted(unknown)}; "
                f"allowed: {sorted(allowed)}"
            )
        violations = fn(spark, **kwargs)
        n = violations.count()
        name = spec.get("name", _default_name(spec))
        res = {
            "name": name,
            "test": kind,
            "status": "pass" if n == 0 else "fail",
            "failures": n,
        }
        if n > 0:
            res["sample"] = [r.asDict() for r in violations.limit(limit).collect()]
            if store_failures_schema:
                target = f"{store_failures_schema}.{name}"
                spark.sql(
                    f"CREATE DATABASE IF NOT EXISTS {store_failures_schema}"
                )
                violations.write.mode("overwrite").saveAsTable(target)
                res["failures_table"] = target
        results.append(res)
    return results
