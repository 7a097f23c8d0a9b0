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

import tempfile as _tempfile

_FUZZ_CSV = _tempfile.mktemp(suffix=".csv", prefix="fuzz_stage_")

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


def dialect_scalar(num_cols, str_cols):
    """(snowflake_expr, duckdb_expr) pairs exercising TRANSPILED
    spellings — a mismatch here is a transpiler bug, not a Spark
    bug."""
    c = rng.choice(num_cols)
    s = rng.choice(str_cols)
    lit = rng.randrange(1, 500)
    choices = [
        (f"IFF({c} > {lit}, 1, 0)",
         f"CASE WHEN {c} > {lit} THEN 1 ELSE 0 END"),
        (f"NVL({c}, 0)", f"COALESCE({c}, 0)"),
        (f"ZEROIFNULL({c})", f"COALESCE({c}, 0)"),
        # NOTE the explicit ROUND: Spark CAST(double AS int-type)
        # TRUNCATES while Snowflake/DuckDB ROUND — a documented
        # deviation the reference shares (sqlglot also leaves int
        # casts untouched); the engine's TO_NUMBER family is immune
        # (DECIMAL casts round in Spark too)
        (f"CAST(ROUND({c}::DOUBLE) AS BIGINT)",
         f"CAST(ROUND(CAST({c} AS DOUBLE)) AS BIGINT)"),
        (f"DECODE({s}, 'F', 1, 'O', 2, 0)",
         f"CASE {s} WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 0 END"),
        (f"LEN({s})", f"LENGTH({s})"),
        (f"CHARINDEX('E', {s})", f"CASE WHEN strpos({s}, 'E') IS NULL "
         f"THEN 0 ELSE strpos({s}, 'E') END"),
        (f"LENGTH(SPLIT_PART({s}, '-', 1))",
         f"LENGTH(SPLIT_PART({s}, '-', 1))"),
        (f"TRY_TO_NUMBER(CAST({c} AS VARCHAR))",
         f"CAST(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE) AS DOUBLE)"),
        (f"WIDTH_BUCKET({c}, 0, 1000, 10)",
         f"CAST(CASE WHEN {c} < 0 THEN 0 WHEN {c} >= 1000 THEN 11 "
         f"ELSE FLOOR({c} / 100) + 1 END AS BIGINT)"),
    ]
    return rng.choice(choices)


# Snowflake format model ↔ DuckDB strftime/strptime codes — the
# r12 TO_DATE prefix-truncation class: every pair round-trips
# format → parse on both engines so the whole family stays closed
DATE_FMTS = [
    ("DD Mon YYYY", "%d %b %Y"),
    ("YYYY-MM-DD", "%Y-%m-%d"),
    ("MM/DD/YYYY", "%m/%d/%Y"),
    ("DD/MM/YYYY", "%d/%m/%Y"),
    ("YYYY.MM.DD", "%Y.%m.%d"),
    ("DD-Mon-YYYY", "%d-%b-%Y"),
]

# non-ASCII literals: accented Latin, CJK, mixed — LENGTH is
# char-based in both engines; functions below are locale-free
NONASCII = ["éàü", "漢字テスト", "Ωπß", "día-año", "Ñandú"]


def window_qualify(table, num_cols, str_cols):
    """Window functions under QUALIFY (both engines native)."""
    g = rng.choice(str_cols)
    k = rng.choice(num_cols)
    tie = num_cols[0]
    n = rng.randrange(1, 4)
    fn = rng.choice([
        f"ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {k}, {tie})",
        f"RANK() OVER (PARTITION BY {g} ORDER BY {k}, {tie})",
        f"DENSE_RANK() OVER (PARTITION BY {g} ORDER BY {k}, {tie})",
    ])
    q = (f"SELECT {g} AS g, CAST({k} AS DOUBLE) AS k FROM {table} "
         f"WHERE {predicate(num_cols, str_cols)} "
         f"QUALIFY {fn} <= {n}")
    return q, q


def gen_query():
    """Returns (engine_sql, duck_sql) — identical text for the
    pass-through shapes, paired dialect renderings otherwise."""
    table = rng.choice(list(TABLES))
    num_cols, str_cols = TABLES[table]
    shape = rng.randrange(14)
    if shape == 13:
        # staged-file query (r13 stage registry): SELECT $N over a
        # CSV staged at startup; DuckDB reads the same CSV directly.
        # Locks the positional read + $N mapping + transpiled
        # expressions over staged data into the loop permanently.
        expr_sf, expr_dk = rng.choice([
            ("$1::BIGINT", "column0::BIGINT"),
            ("LENGTH($2)", "LENGTH(column1)"),
            ("IFF($3::DOUBLE > 100000, 1, 0)",
             "CASE WHEN column2::DOUBLE > 100000 THEN 1 ELSE 0 END"),
            ("TRY_TO_NUMBER($3, '9999999.99')::DOUBLE",
             "TRY_CAST(column2 AS DOUBLE)"),
        ])
        lim = rng.randrange(1, 2000)
        sf = (f"SELECT CAST(SUM({expr_sf}) AS DOUBLE) AS a0, "
              f"CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM @fuzz_stage WHERE $1::BIGINT <= {lim}")
        dk = (f"SELECT CAST(SUM({expr_dk}) AS DOUBLE) AS a0, "
              f"CAST(COUNT(*) AS BIGINT) AS n "
              f"FROM read_csv('{_FUZZ_CSV}', header = false) "
              f"WHERE column0::BIGINT <= {lim}")
        return sf, dk
    if shape == 10:
        # signed numeric TO_CHAR (the r12 sign-drop class): negatives
        # flow through every format family; DuckDB renders the same
        # Snowflake semantics (leading '-', no fill spaces) with
        # format(). Inputs keep ≤2 decimals so the format scale never
        # rounds (ties would split on rounding mode, a separate axis).
        c = rng.choice(num_cols)
        mid = rng.randrange(100, 5000)
        v_sf = f"({c} - {mid})"
        # DuckDB format() refuses ',' grouping on non-integers —
        # build the grouped body from integer/fraction parts
        a = f"abs(CAST({v_sf} AS DECIMAL(38,2)))"
        grouped = (
            f"format('{{:,}}', CAST(floor({a}) AS BIGINT)) || '.' || "
            f"lpad(CAST(CAST({a} * 100 AS BIGINT) % 100 AS VARCHAR), "
            f"2, '0')")
        fmt_sf, dk_expr = rng.choice([
            ("9,999,999,999.99",
             f"CASE WHEN {v_sf} < 0 THEN '-' ELSE '' END || "
             f"{grouped}"),
            ("9999999999.99",
             f"CASE WHEN {v_sf} < 0 THEN '-' ELSE '' END || "
             f"format('{{:.2f}}', abs(CAST({v_sf} AS "
             f"DECIMAL(38,2))))"),
            ("$9,999,999,999.99",
             f"CASE WHEN {v_sf} < 0 THEN '-' ELSE '' END || '$' || "
             f"{grouped}"),
        ])
        g = rng.choice(str_cols)
        w = predicate(num_cols, str_cols)
        sf = (f"SELECT {g} AS g, MIN(TO_CHAR({v_sf}, '{fmt_sf}')) "
              f"AS s1, MAX(TO_VARCHAR({v_sf}, '{fmt_sf}')) AS s2 "
              f"FROM {table} WHERE {w} GROUP BY {g}")
        dk = (f"SELECT {g} AS g, MIN({dk_expr}) AS s1, "
              f"MAX({dk_expr}) AS s2 "
              f"FROM {table} WHERE {w} GROUP BY {g}")
        return sf, dk
    if shape == 11:
        # DATEADD return-type parity (the r12 DATE-vs-TIMESTAMP
        # class): project the result BARE — Python date != datetime
        # even at midnight, so the row compare IS the schema check.
        # Static DATE input + day-or-coarser unit must come back DATE.
        sf_unit, dk_iv, sf_amt, dk_amt = rng.choice([
            ("day", "DAY", 7, 7), ("'week'", "WEEK", 2, 2),
            ("month", "MONTH", 3, 3), ("quarter", "MONTH", 1, 3),
            ("years", "YEAR", 1, 1),
        ])
        w = predicate(ORDERS_NUM, ORDERS_STR)
        sf = (f"SELECT o_orderkey, DATEADD({sf_unit}, {sf_amt}, "
              f"o_orderdate::DATE) AS d2 FROM orders WHERE {w}")
        dk = (f"SELECT o_orderkey, (o_orderdate + INTERVAL {dk_amt} "
              f"{dk_iv})::DATE AS d2 FROM orders WHERE {w}")
        return sf, dk
    if shape == 12:
        # quantified comparison subqueries with NULL-bearing and
        # empty subquery sides (locks the T82 matrix into the loop):
        # identical text — DuckDB's ANY/ALL semantics match
        # Snowflake's three-valued logic
        op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        quant = rng.choice(["ANY", "ALL", "SOME"])
        neg = rng.random() < 0.3
        sub = rng.choice([
            # NULL-bearing subquery side
            ("(SELECT CASE WHEN l_orderkey % 7 = 0 THEN NULL "
             "ELSE l_quantity END FROM lineitem "
             "WHERE l_orderkey < 200)"),
            # plain values
            "(SELECT l_quantity FROM lineitem WHERE l_orderkey < 100)",
            # empty set
            "(SELECT l_quantity FROM lineitem WHERE l_orderkey < 0)",
        ])
        pred = f"o_totalprice {op} {quant} {sub}"
        if neg:
            pred = f"NOT ({pred})"
        q = (f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
             f"CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS s "
             f"FROM orders WHERE o_orderkey < 500 AND ({pred})")
        return q, q
    if shape == 9:
        # date arithmetic: DATEADD with random unit spellings
        # (singular/plural/abbreviated — the r12 bare-word surface)
        # and boundary-counting DATEDIFF, paired with DuckDB interval
        # arithmetic / date_diff (DuckDB counts part boundaries like
        # Snowflake)
        # (sf_unit, duck_unit, sf_amount, duck_amount) — quarter has
        # no DuckDB interval unit, so 1 quarter pairs with 3 months
        sf_unit, dk_unit, sf_amt, dk_amt = rng.choice([
            ("day", "DAY", 7, 7), ("'days'", "DAY", 3, 3),
            ("week", "WEEK", 2, 2), ("weeks", "WEEK", 1, 1),
            ("'month'", "MONTH", 2, 2), ("mons", "MONTH", 5, 5),
            ("qtrs", "MONTH", 1, 3),
            ("'year'", "YEAR", 1, 1), ("yrs", "YEAR", 2, 2),
            ("hrs", "HOUR", 36, 36),
        ])
        diff_u_sf, diff_u_dk = rng.choice([
            ("day", "day"), ("'week'", "week"), ("month", "month"),
            ("'quarter'", "quarter"), ("year", "year"),
            ("hours", "hour"), ("mins", "minute"),
        ])
        w = predicate(ORDERS_NUM, ORDERS_STR)
        sf = (
            "SELECT o_orderkey, "
            f"CAST(DATEADD({sf_unit}, {sf_amt}, o_orderdate) "
            "AS TIMESTAMP) AS d2, "
            f"CAST(DATEDIFF({diff_u_sf}, o_orderdate, "
            f"DATEADD({sf_unit}, {sf_amt}, o_orderdate)) "
            "AS BIGINT) AS dd "
            f"FROM orders WHERE {w}"
        )
        dk = (
            "SELECT o_orderkey, "
            f"CAST(o_orderdate + INTERVAL {dk_amt} {dk_unit} "
            "AS TIMESTAMP) AS d2, "
            f"CAST(date_diff('{diff_u_dk}', o_orderdate, "
            f"o_orderdate + INTERVAL {dk_amt} {dk_unit}) "
            "AS BIGINT) AS dd "
            f"FROM orders WHERE {w}"
        )
        return sf, dk
    if shape == 5:
        # date-format round-trip (the r12 TO_DATE truncation class):
        # format an orders date, parse it back, aggregate
        sf_fmt, dk_fmt = rng.choice(DATE_FMTS)
        w = predicate(ORDERS_NUM, ORDERS_STR)
        sf = (
            "SELECT DATE_TRUNC('month', o_orderdate) AS m, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            f"MIN(TO_DATE(TO_CHAR(o_orderdate, '{sf_fmt}'), "
            f"'{sf_fmt}')) AS d "
            f"FROM orders WHERE {w} GROUP BY 1"
        )
        dk = (
            "SELECT CAST(DATE_TRUNC('month', o_orderdate) AS "
            "TIMESTAMP) AS m, CAST(COUNT(*) AS BIGINT) AS n, "
            f"MIN(strptime(strftime(o_orderdate, '{dk_fmt}'), "
            f"'{dk_fmt}')::DATE) AS d "
            f"FROM orders WHERE {w} GROUP BY 1"
        )
        return sf, dk
    if shape == 6:
        # window under QUALIFY
        return window_qualify(table, num_cols, str_cols)
    if shape == 7:
        # non-ASCII string functions (char-length semantics, concat,
        # replace, split over multibyte text)
        s = rng.choice(str_cols)
        lit = rng.choice(NONASCII)
        expr = rng.choice([
            f"CAST(LENGTH({s} || '{lit}') AS BIGINT)",
            f"CAST(LENGTH(REPLACE({s}, 'O', '{lit}')) AS BIGINT)",
            f"CAST(LENGTH(SUBSTR('{lit}' || {s}, 2)) AS BIGINT)",
            f"CAST(LENGTH(REVERSE('{lit}')) AS BIGINT) + "
            f"CAST(LENGTH({s}) AS BIGINT)",
            f"CAST(LENGTH(SPLIT_PART('{lit}-' || {s}, '-', 1)) "
            f"AS BIGINT)",
        ])
        w = predicate(num_cols, str_cols)
        q = (f"SELECT {s} AS g, CAST(SUM({expr}) AS BIGINT) AS a0, "
             f"CAST(COUNT(*) AS BIGINT) AS n FROM {table} "
             f"WHERE {w} GROUP BY {s}")
        return q, q
    if shape == 8:
        # GROUP BY ALL (both engines native): grouping keys inferred
        # from the non-aggregate select items, incl. a computed one
        g = rng.choice(str_cols)
        k = rng.choice(num_cols)
        a = agg(num_cols)
        # FLOOR keeps the bucket integral pre-cast: bare
        # CAST(double AS BIGINT) truncates in Spark and rounds in
        # DuckDB (the documented int-cast deviation)
        q = (f"SELECT {g} AS g, CAST(FLOOR({k} % 5) AS BIGINT) AS b, "
             f"{a} AS a0 FROM {table} "
             f"WHERE {predicate(num_cols, str_cols)} GROUP BY ALL")
        return q, q
    if shape == 0:
        # grouped aggregation
        g = rng.choice(str_cols)
        aggs = ", ".join(f"{agg(num_cols)} AS a{k}"
                         for k in range(rng.randrange(1, 4)))
        q = (f"SELECT {g} AS g, {aggs} FROM {table} "
             f"WHERE {predicate(num_cols, str_cols)} GROUP BY {g}")
        if rng.random() < 0.4:
            q += " HAVING COUNT(*) > 1"
        return q, q
    if shape == 1:
        # global aggregation with several measures
        aggs = ", ".join(f"{agg(num_cols)} AS a{k}"
                         for k in range(rng.randrange(2, 5)))
        q = (f"SELECT {aggs} FROM {table} "
             f"WHERE {predicate(num_cols, str_cols)}")
        return q, q
    if shape == 2:
        # two-table equi-join aggregation
        g = rng.choice(ORDERS_STR)
        a1 = agg(LINEITEM_NUM)
        q = (
            f"SELECT {g} AS g, {a1} AS a0, "
            f"CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
            f"WHERE {predicate(ORDERS_NUM, ORDERS_STR)} GROUP BY {g}"
        )
        return q, q
    if shape == 3:
        # DIALECT scalars grouped: engine gets Snowflake spellings,
        # duck gets the equivalent rendering
        g = rng.choice(str_cols)
        pairs = [dialect_scalar(num_cols, str_cols)
                 for _ in range(rng.randrange(1, 3))]
        sf_aggs = ", ".join(
            f"CAST(SUM({sf}) AS DOUBLE) AS a{k}"
            for k, (sf, _d) in enumerate(pairs))
        dk_aggs = ", ".join(
            f"CAST(SUM({dk}) AS DOUBLE) AS a{k}"
            for k, (_s, dk) in enumerate(pairs))
        w = predicate(num_cols, str_cols)
        return (
            f"SELECT {g} AS g, {sf_aggs} FROM {table} WHERE {w} "
            f"GROUP BY {g}",
            f"SELECT {g} AS g, {dk_aggs} FROM {table} WHERE {w} "
            f"GROUP BY {g}",
        )
    # QUALIFY top-1 per group (DuckDB supports QUALIFY natively)
    g = rng.choice(str_cols)
    k = rng.choice(num_cols)
    n = rng.randrange(1, 4)
    q = (f"SELECT {g} AS g, CAST({k} AS DOUBLE) AS k FROM {table} "
         f"WHERE {predicate(num_cols, str_cols)} "
         f"QUALIFY ROW_NUMBER() OVER (PARTITION BY {g} "
         f"ORDER BY {k}, {num_cols[0]}) <= {n}")
    return q, q


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
    # staged CSV fixture for shape 13: orders subset, no header —
    # engine reads the gzipped stage copy, DuckDB the original file
    import duckdb as _ddb

    _ddb.connect().execute(
        f"COPY (SELECT o_orderkey, o_orderstatus, o_totalprice "
        f"FROM read_parquet('{SF}/orders.parquet') "
        f"ORDER BY o_orderkey LIMIT 3000) TO '{_FUZZ_CSV}' "
        "(FORMAT CSV, HEADER false)")
    eng.execute("CREATE STAGE fuzz_stage")
    eng.execute(f"PUT file://{_FUZZ_CSV} @fuzz_stage")
    duck = duckdb.connect()
    for t in ("orders", "lineitem"):
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    fails = 0
    for k in range(N):
        q_sf, q_dk = gen_query()
        try:
            drows = sorted(
                tuple(norm(v) for v in r)
                for r in duck.execute(q_dk).fetchall())
        except Exception as e:
            # oracle can't express it — not a comparison point
            print(f"SKIP[{k}] duckdb rejected: {q_dk} ({str(e)[:80]})")
            continue
        try:
            srows = sorted(
                tuple(norm(v) for v in r)
                for r in eng.execute(q_sf).collect())
        except Exception as e:
            print(f"FAIL[{k}] spark error: {q_sf}\n  {str(e)[:200]}")
            fails += 1
            continue
        if srows != drows:
            diffs = [
                (a, b) for a, b in zip(srows, drows) if a != b
            ][:2]
            print(f"FAIL[{k}] MISMATCH: {q_sf}\n  rows {len(srows)} "
                  f"vs {len(drows)}; first diffs: {diffs}")
            fails += 1
        else:
            print(f"ok[{k}] rows={len(srows)} :: {q_sf[:90]}")
    print(f"\n{N - fails} ok, {fails} FAIL (seed={SEED})")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
