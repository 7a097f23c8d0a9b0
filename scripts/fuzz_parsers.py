"""Deterministic mutation fuzz over the transpiler and every
engine-layer statement parser: any input may be REFUSED
(TranspileError/ValueError) but must never crash with an internal
error (IndexError/KeyError/AttributeError/...).

Usage: python scripts/fuzz_parsers.py [rounds_per_seed]
Prints one summary line; exits non-zero on any crash.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark.materializations.copy_into import parse_copy_into
from dbt_icebreaker_spark.materializations.create_table import (
    parse_create_or_replace_table,
    parse_swap_with,
)
from dbt_icebreaker_spark.materializations.insert_all import parse_insert_all
from dbt_icebreaker_spark.materializations.merge_stmt import (
    parse_alter_columns,
    parse_delete,
    parse_merge,
    parse_update,
)
from dbt_icebreaker_spark.scripting import is_scripting_block
from dbt_icebreaker_spark.transpiler import Transpiler
from dbt_icebreaker_spark.transpiler.core import TranspileError
from dbt_icebreaker_spark.transpiler.match_recognize_sql import (
    parse_match_recognize,
)

SEEDS = [
    "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1",
    "SELECT LISTAGG(x, ',') WITHIN GROUP (ORDER BY y DESC) FROM t",
    "SELECT * FROM t PIVOT (SUM(v) FOR k IN ('a','b') DEFAULT ON NULL (0))",
    "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v",
    "SELECT f.value FROM t, LATERAL FLATTEN(input => t.arr) f",
    "CREATE OR REPLACE FUNCTION f(x INT) RETURNS INT AS 'x + 1'",
    "SELECT DATEADD('day', 1, d) FROM t",
    "SELECT ARRAY_AGG(x) WITHIN GROUP (ORDER BY y NULLS FIRST) FROM t",
    "SELECT col:path.a[0]::STRING FROM t",
    "INSERT FIRST WHEN a > 1 THEN INTO x VALUES (a) ELSE INTO y SELECT a FROM t",
    "SELECT SEQ4() FROM TABLE(GENERATOR(ROWCOUNT => 5))",
    "SELECT * FROM a ASOF JOIN b MATCH_CONDITION(a.t >= b.t) ON a.k = b.k",
    "WITH c AS (SELECT 1 AS x) SELECT x FROM c CONNECT BY PRIOR x = x",
    "SELECT NTH_VALUE(v, 2) FROM FIRST OVER (ORDER BY k) FROM t",
    "SELECT TO_CHAR(d, 'YYYY-DDD'), PARSE_IP(s, 'INET') FROM t",
    "SELECT MINHASH(32, x) FROM t GROUP BY g",
    "BEGIN LET x := 1; RETURN x; END",
    "CREATE OR REPLACE TABLE db.t (x BIGINT) CLUSTER BY (x) AS SELECT 1",
    "ALTER TABLE a SWAP WITH b",
    "DELETE FROM t AS x WHERE x.k IN (SELECT k FROM d)",
    "COPY INTO t FROM '/tmp/x' FILE_FORMAT = (TYPE = CSV)",
    "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY k ORDER BY ts "
    "MEASURES COUNT(*) AS n PATTERN (A B+) DEFINE B AS v > PREV(v))",
    # round-10 surface: dynamic DEFINE, FINAL/empty-match modifiers,
    # FLATTEN recursive/mode, SHOW dialect, non-equi MERGE, dynamic
    # VARIANT subscripts
    "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY k ORDER BY ts "
    "MEASURES FINAL COUNT(*) AS n, RUNNING LAST(v) AS l "
    "ALL ROWS PER MATCH OMIT EMPTY MATCHES PATTERN (A*) "
    "DEFINE A AS v > FIRST(v) * 1.5 AND COUNT(*) <= 4)",
    "SELECT f.path FROM TABLE(FLATTEN(input => j, recursive => true, "
    "mode => 'ARRAY', outer => true)) f",
    "SHOW TERSE TABLES IN SCHEMA db . sch LIKE 'x%'",
    "SHOW FUTURE GRANTS IN SCHEMA s",
    "MERGE INTO t USING s ON t.v BETWEEN s.lo AND s.hi "
    "WHEN MATCHED THEN UPDATE SET b = s.label",
    "SELECT PARSE_JSON(j)[k], arr[i + 1] FROM t",
    "SELECT node, LEVEL FROM h CONNECT BY NOCYCLE PRIOR node = parent "
    "ORDER SIBLINGS BY ord",
    # round-11 surface: 4-arg TO_NUMBER, sequences, SIBLINGS DESC,
    # ISCYCLE, SUM/AVG DEFINE caps, external-table passthrough
    "SELECT TO_NUMBER(s, '$9,999.99', 10, 2), "
    "TRY_TO_DECIMAL(s, '99.9', 5, 1) FROM t",
    "CREATE OR REPLACE SEQUENCE IF NOT EXISTS sq START WITH 100 "
    "INCREMENT BY -5 NOORDER COMMENT = 'x'",
    "SELECT sq.NEXTVAL, t.k FROM t",
    "SELECT id FROM h START WITH p IS NULL CONNECT BY PRIOR id = p "
    "ORDER SIBLINGS BY k DESC NULLS LAST, id ASC",
    "SELECT id, CONNECT_BY_ISCYCLE FROM h START WITH id = 1 "
    "CONNECT BY NOCYCLE PRIOR id = p",
    "SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY k ORDER BY ts "
    "MEASURES SUM(v) AS sv PATTERN (B+) "
    "DEFINE B AS SUM(v) <= 499.995 AND v > 0)",
    "CREATE EXTERNAL TABLE e (c INT) USING parquet LOCATION '/tmp/x'",
]
TOKENS = [
    "SELECT", "FROM", "(", ")", ",", "'a'", "1", "OVER", "QUALIFY",
    "PIVOT", "IN", "FOR", "WITHIN", "GROUP", "ORDER", "BY", "::", ":",
    ".", "=>", "FLATTEN", "TABLE", "ANY", "$$", "DEFAULT", "ON", "NULL",
    "AS", "END", "CASE", "WHEN", "THEN", ";", "*", "MATCH_CONDITION",
    "GENERATOR", "ROWCOUNT", "=", "x", "t", "INSERT", "INTO", "VALUES",
    "MERGE", "USING", "MATCHED", "NOT", "UPDATE", "SET", "DELETE",
    "WHERE", "CREATE", "OR", "REPLACE", "CLUSTER", "SWAP", "WITH",
    "ALTER", "DROP", "COLUMN", "IF", "EXISTS", "BEGIN", "LET", ":=",
    "RECURSIVE", "MODE", "FINAL", "RUNNING", "OMIT", "EMPTY",
    "MATCHES", "SHOW", "TERSE", "GRANTS", "ROLES", "COUNT", "FIRST",
    "LAST", "BETWEEN", "CHANGES", "INFORMATION", "SIBLINGS", "PRIOR",
    "DECLARE", "RETURN",
]


def run(rounds_per_seed: int = 120, seed: int = 42) -> int:
    rng = random.Random(seed)
    t = Transpiler()
    parsers = [
        t.to_spark, parse_insert_all, parse_create_or_replace_table,
        parse_swap_with, parse_merge, parse_delete, parse_update,
        parse_alter_columns, parse_copy_into, parse_match_recognize,
        is_scripting_block,
    ]
    crashes = total = 0

    def attempt(sql: str) -> None:
        nonlocal crashes, total
        for p in parsers:
            total += 1
            try:
                p(sql)
            except (TranspileError, ValueError, RecursionError):
                pass
            except Exception as e:  # noqa: BLE001 - the fuzz contract
                crashes += 1
                if crashes <= 10:
                    name = getattr(p, "__name__", str(p))
                    print(f"CRASH {name} {type(e).__name__}: {sql[:100]!r}")
                    print("   ", str(e)[:120])

    for s in SEEDS:
        words = s.split(" ")
        for _ in range(rounds_per_seed):
            w = list(words)
            op = rng.random()
            if op < 0.35 and len(w) > 2:
                del w[rng.randrange(len(w))]
            elif op < 0.6:
                w.insert(rng.randrange(len(w) + 1), rng.choice(TOKENS))
            elif op < 0.85 and len(w) > 2:
                i1, i2 = rng.randrange(len(w)), rng.randrange(len(w))
                w[i1], w[i2] = w[i2], w[i1]
            else:
                w[rng.randrange(len(w))] = rng.choice(TOKENS)
            attempt(" ".join(w))
    for _ in range(rounds_per_seed * 4):
        attempt(" ".join(
            rng.choice(TOKENS) for _ in range(rng.randrange(2, 22))
        ))
    print(f"{total} parse attempts, {crashes} crashes")
    return crashes


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    sys.exit(1 if run(n) else 0)
