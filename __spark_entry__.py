"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1 shape) on sf0.001.
queries()     — one callable per implemented operator (SURVEY §2).
oracle_sql()  — DuckDB-equivalent SQL per query for the t2 gate.

Implementations live in dbt_icebreaker_spark/ — see SURVEY.md for the
blueprint and dbt_icebreaker_spark/queries.py for the corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_icebreaker_spark import queries as _corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = _corpus.queries()["q01_pricing_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _corpus.queries()


def oracle_sql() -> dict[str, str]:
    return _corpus.oracle_sql()
