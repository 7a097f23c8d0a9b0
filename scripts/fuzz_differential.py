"""Differential SQL fuzzer: generate deterministic random queries
from a grammar the engine AND DuckDB both accept, run both on the
same parquet tables, and compare sorted results — a randomized
extension of the per-entry oracle gate. Any mismatch is a real
wrong-answer bug; the seed reproduces it.

Grammar (kept inside the engine's documented surface and DuckDB's
shared SQL): single-table aggregations / GROUP BY over orders or
lineitem with filters, scalar expression columns, HAVING, windows
under QUALIFY-free subselects, and two-table equi-joins. Floats are
rounded at the source so accumulation order can't flip the compare.

Usage: python scripts/fuzz_differential.py [n_queries] [seed] [sf_dir]
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 1106
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

rng = random.Random(SEED)

ORDERS_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
ORDERS_STR = ["o_orderstatus", "o_orderpriority"]
LINEITEM_NUM = ["l_orderkey", "l_partkey", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
                "l_suppkey", "l_linenumber"]
LINEITEM_STR = ["l_returnflag", "l_linestatus"]

TABLES = {
    "orders": (ORDERS_NUM, ORDERS_STR),
    "lineitem": (LINEITEM_NUM, LINEITEM_STR),
}


def scalar_num(cols):
    c = rng.choice(cols)
    return rng.choice([
        c,
        f"{c} + 1",
        f"{c} * 2",
        f"ABS({c})",
        f"COALESCE({c}, 0)",
        f"CASE WHEN {c} > 10 THEN {c} ELSE 0 END",
        f"GREATEST({c}, 5)",
        f"LEAST({c}, 100)",
    ])


def agg(cols):
    e = scalar_num(cols)
    fn = rng.choice(["SUM", "MIN", "MAX", "COUNT", "AVG"])
    if fn == "AVG":
        return f"CAST(ROUND(AVG(CAST({e} AS DOUBLE)), 4) AS DOUBLE)"
    if fn == "SUM":
        return f"CAST(ROUND(SUM(CAST({e} AS DOUBLE)), 3) AS DOUBLE)"
    if fn == "COUNT":
        return f"CAST(COUNT({e}) AS BIGINT)"
    return f"CAST({fn}(CAST({e} AS DOUBLE)) AS DOUBLE)"


def predicate(num_cols, str_cols):
    kind = rng.randrange(4)
    if kind == 0:
        return f"{rng.choice(num_cols)} > {rng.randrange(0, 2000)}"
    if kind == 1:
        return (f"{rng.choice(num_cols)} BETWEEN "
                f"{rng.randrange(0, 500)} AND {rng.randrange(500, 5000)}")
    if kind == 2:
        return f"{rng.choice(str_cols)} IS NOT NULL"
    return f"{rng.choice(num_cols)} % {rng.randrange(2, 9)} = 0"


def gen_query() -> str:
    table = rng.choice(list(TABLES))
    num_cols, str_cols = TABLES[table]
    shape = rng.randrange(3)
    if shape == 0:
        # grouped aggregation
        g = rng.choice(str_cols)
        aggs = ", ".join(f"{agg(num_cols)} AS a{k}"
                         for k in range(rng.randrange(1, 4)))
        q = (f"SELECT {g} AS g, {aggs} FROM {table} "
             f"WHERE {predicate(num_cols, str_cols)} GROUP BY {g}")
        if rng.random() < 0.4:
            q += " HAVING COUNT(*) > 1"
        return q
    if shape == 1:
        # global aggregation with several measures
        aggs = ", ".join(f"{agg(num_cols)} AS a{k}"
                         for k in range(rng.randrange(2, 5)))
        return (f"SELECT {aggs} FROM {table} "
                f"WHERE {predicate(num_cols, str_cols)}")
    # two-table equi-join aggregation
    g = rng.choice(ORDERS_STR)
    a1 = agg(LINEITEM_NUM)
    return (
        f"SELECT {g} AS g, {a1} AS a0, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        f"WHERE {predicate(ORDERS_NUM, ORDERS_STR)} GROUP BY {g}"
    )


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return float(f"{v:.10g}")
    return v


def main() -> None:
    import duckdb

    from dbt_icebreaker_spark.runner import IcebreakerEngine
    from dbt_icebreaker_spark.session import get_spark
    from dbt_icebreaker_spark.sources import register_dir

    spark = get_spark(app_name="diff_fuzz", shuffle_partitions=4)
    register_dir(spark, SF)
    eng = IcebreakerEngine(spark)
    duck = duckdb.connect()
    for t in ("orders", "lineitem"):
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    fails = 0
    for k in range(N):
        q = gen_query()
        try:
            srows = sorted(
                tuple(norm(v) for v in r) for r in eng.execute(q).collect())
        except Exception as e:
            print(f"FAIL[{k}] spark error: {q}\n  {str(e)[:200]}")
            fails += 1
            continue
        try:
            drows = sorted(
                tuple(norm(v) for v in r)
                for r in duck.execute(q).fetchall())
        except Exception as e:
            print(f"SKIP[{k}] duckdb rejected: {q} ({str(e)[:80]})")
            continue
        if srows != drows:
            diffs = [
                (a, b) for a, b in zip(srows, drows) if a != b
            ][:2]
            print(f"FAIL[{k}] MISMATCH: {q}\n  rows {len(srows)} vs "
                  f"{len(drows)}; first diffs: {diffs}")
            fails += 1
        else:
            print(f"ok[{k}] rows={len(srows)} :: {q[:90]}")
    print(f"\n{N - fails} ok, {fails} FAIL (seed={SEED})")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
