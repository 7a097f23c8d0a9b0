"""Round-6b execution probe: semi-structured deep seams + DDL/statement
surface. Every case runs through IcebreakerEngine.execute with an
expected value; statement cases assert end-state. Schema is unique per
run (the on-disk warehouse outlives the in-memory metastore).

Usage: python scripts/probe_sweep_r6b.py
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark import get_spark
from dbt_icebreaker_spark.runner import IcebreakerEngine

SCH = f"s6b_{uuid.uuid4().hex[:8]}"

# (sql, expected list of first-column values ordered)
CASES = [
    # FLATTEN path argument
    ("SELECT f.value FROM TABLE(FLATTEN(input => "
     "PARSE_JSON('{\"a\": [1, 2]}'), path => 'a')) f", ["1", "2"]),
    # FLATTEN index/key on objects
    ("SELECT f.key FROM TABLE(FLATTEN(input => "
     "PARSE_JSON('{\"b\": 1, \"a\": 2}'))) f", ["a", "b"]),
    # nested OBJECT_CONSTRUCT
    ("SELECT OBJECT_CONSTRUCT('a', OBJECT_CONSTRUCT('b', 1)) AS r",
     ['{"a":{"b":1}}']),
    # TYPEOF over the variant model
    ("SELECT TYPEOF(PARSE_JSON('1')) AS r", ["INTEGER"]),
    ("SELECT TYPEOF(PARSE_JSON('[1]')) AS r", ["ARRAY"]),
    ("SELECT TYPEOF(PARSE_JSON('{}')) AS r", ["OBJECT"]),
    ("SELECT TYPEOF(PARSE_JSON('\"x\"')) AS r", ["VARCHAR"]),
    # JSON null vs SQL NULL
    ("SELECT IS_NULL_VALUE(PARSE_JSON('null')) AS r", [True]),
    ("SELECT TRY_PARSE_JSON('{bad') AS r", [None]),
    # GET_PATH with array step
    ("SELECT GET_PATH(PARSE_JSON('{\"a\": [{\"b\": 7}]}'), 'a[0].b') AS r",
     ["7"]),
    # aggregation seams
    ("SELECT COUNT(DISTINCT k % 2, k % 3) AS r FROM p", [6]),
    ("SELECT SUM(DISTINCT k % 3) AS r FROM p", [3]),
    ("SELECT GROUPING(g) AS r FROM (SELECT 'a' AS g, 1 AS v) "
     "GROUP BY ROLLUP(g) ORDER BY r", [0, 1]),
    # numeric division yields decimal-ish, not floor
    ("SELECT 5 / 2 AS r", [2.5]),
]

# statement scenarios: (list of sqls, final check sql, expected);
# {SCH} is substituted with the unique run schema
STMT_CASES = [
    (["CREATE OR REPLACE TABLE {SCH}.t1 AS SELECT 1 AS a, 'x' AS b",
      "CREATE OR REPLACE TABLE {SCH}.t2 LIKE {SCH}.t1",
      "INSERT INTO {SCH}.t2 VALUES (2, 'y'), (3, 'z')"],
     "SELECT COUNT(*) FROM {SCH}.t2", [2]),
    (["CREATE OR REPLACE TABLE {SCH}.t3 (a INT, b STRING)",
      "INSERT INTO {SCH}.t3 (b, a) VALUES ('m', 9)"],
     "SELECT a FROM {SCH}.t3", [9]),
    (["CREATE OR REPLACE TABLE {SCH}.t4 AS SELECT 1 AS a",
      "ALTER TABLE {SCH}.t4 RENAME TO t4r"],
     "SELECT a FROM {SCH}.t4r", [1]),
    (["CREATE OR REPLACE TABLE {SCH}.t5 AS SELECT 1 AS a",
      "COMMENT ON TABLE {SCH}.t5 IS 'hello'"],
     "SELECT a FROM {SCH}.t5", [1]),
    (["CREATE OR REPLACE VIEW {SCH}.v1 (x, y) AS SELECT 1, 2"],
     "SELECT y FROM {SCH}.v1", [2]),
    # UPDATE ... FROM (Snowflake multi-table update)
    (["CREATE OR REPLACE TABLE {SCH}.t6 AS SELECT 1 AS k, 10 AS v",
      "CREATE OR REPLACE TEMP VIEW r6b_src AS SELECT 1 AS k, 99 AS nv",
      "UPDATE {SCH}.t6 t SET v = s.nv FROM r6b_src s WHERE t.k = s.k"],
     "SELECT v FROM {SCH}.t6", [99]),
    # DESCRIBE / SHOW surfaces execute
    (["CREATE OR REPLACE TABLE {SCH}.t7 AS SELECT 1 AS a"],
     "DESCRIBE TABLE {SCH}.t7", None),
    ([], "SHOW TABLES IN {SCH}", None),
    ([], "SHOW COLUMNS IN {SCH}.t7", None),
]


def main():
    spark = get_spark(app_name="probe_r6b")
    eng = IcebreakerEngine(spark, schema=SCH)
    spark.sql("CREATE OR REPLACE TEMP VIEW p AS SELECT id AS k FROM RANGE(1, 7)")
    ok = bad = 0
    for sql, expect in CASES:
        try:
            rows = eng.execute(sql).collect()
            got = [r[0] for r in rows]
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"FAIL  {sql[:100]}")
            print(f"      -> {str(e).splitlines()[0][:160]}")
            continue
        norm = [round(x, 9) if isinstance(x, float) else x for x in got]
        if norm == expect:
            ok += 1
        else:
            bad += 1
            print(f"WRONG {sql[:100]}")
            print(f"      -> got {norm!r}, want {expect!r}")
    for setup, check, expect in STMT_CASES:
        setup = [s.replace("{SCH}", SCH) for s in setup]
        check = check.replace("{SCH}", SCH)
        label = (setup[-1] if setup else check)[:90]
        try:
            for s in setup:
                eng.execute(s)
            rows = eng.execute(check).collect()
            got = [r[0] for r in rows]
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"FAIL  {label}")
            print(f"      -> {str(e).splitlines()[0][:160]}")
            continue
        if expect is None or got == expect:
            ok += 1
        else:
            bad += 1
            print(f"WRONG {label}")
            print(f"      -> got {got!r}, want {expect!r}")
    print(f"\n{ok} ok, {bad} bad of {len(CASES) + len(STMT_CASES)}")
    spark.stop()


if __name__ == "__main__":
    main()
