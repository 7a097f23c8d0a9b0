"""Round-9 second probe sweep: adversarial edges over THIS round's
additions —

1. expression measures composed with the round's other features
   (under nested CTEs, ALL ROWS + unmatched, alternation patterns,
   exclusions, SKIP TO);
2. statement batches 2/3 through scripting blocks and procedures
   (USE/SHOW GRANTS/ALTER SESSION inside a block);
3. UNDROP/retention interplay with swaps, clones, and incremental
   materializations;
4. the promoted gate entries re-run through a bare engine.

Run: python scripts/probe_sweep_r9b.py
Findings get fixed and locked into the permanent suites."""

import shutil
import sys

sys.path.insert(0, "/root/repo")

wh = "/tmp/r9b_sweep_wh"
shutil.rmtree(wh, ignore_errors=True)
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from dbt_icebreaker_spark.runner import IcebreakerEngine  # noqa: E402

eng = IcebreakerEngine(spark, schema="r9b")

ok = fail = 0
failures = []


def check(name, sql, expect=None, err=None, pre=None, rows=None):
    global ok, fail
    try:
        if pre:
            for p in pre:
                eng.execute(p)
        r = eng.execute(sql).collect()
        got = r[0][0] if r else None
        if err is not None:
            fail += 1
            failures.append((name, f"expected error {err!r}, got {got!r}"))
            return
        if rows is not None and len(r) != rows:
            fail += 1
            failures.append((name, f"got {len(r)} rows expected {rows}"))
            return
        if expect is not None and got != expect:
            fail += 1
            failures.append((name, f"got {got!r} expected {expect!r}"))
            return
        ok += 1
    except Exception as e:
        if err is not None and err.lower() in str(e).lower():
            ok += 1
        else:
            fail += 1
            failures.append((name, f"{type(e).__name__}: {str(e)[:160]}"))


PRE = ["""
CREATE OR REPLACE TABLE r9b.em AS
SELECT g, seq, v FROM VALUES
  (1, 1, 10.0), (1, 2, 12.0), (1, 3, 15.0), (1, 4, 9.0),
  (2, 1, 5.0), (2, 2, 7.0), (2, 3, 8.0) t(g, seq, v)
"""]

# ------------------------------------------------ 1. expression
# measures composed with other MR features
check("expr_measures_in_cte", """
    WITH m AS (SELECT * FROM r9b.em MATCH_RECOGNIZE (
      PARTITION BY g ORDER BY seq
      MEASURES LAST(v) - FIRST(v) AS d
      ONE ROW PER MATCH PATTERN (A B+) DEFINE B AS v > PREV(v)))
    SELECT CAST(SUM(d) AS DOUBLE) FROM m
""", expect=8.0, pre=PRE)
check("expr_measures_all_rows_unmatched", """
    SELECT COUNT(*) FROM (
      SELECT * FROM r9b.em MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MAX(v) - MIN(v) AS rng
        ALL ROWS PER MATCH WITH UNMATCHED ROWS
        PATTERN (A B+) DEFINE B AS v > PREV(v)))
""", expect=7)
check("expr_measures_unmatched_rows_null", """
    SELECT COUNT(*) FROM (
      SELECT * FROM r9b.em MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES MAX(v) - MIN(v) AS rng
        ALL ROWS PER MATCH WITH UNMATCHED ROWS
        PATTERN (A B+) DEFINE B AS v > PREV(v)))
    WHERE rng IS NULL
""", expect=1)
check("expr_measures_with_exclusion", """
    SELECT CAST(SUM(d) AS DOUBLE) FROM (
      SELECT * FROM r9b.em MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES LAST(v) - FIRST(v) AS d
        ONE ROW PER MATCH
        PATTERN (A {- B+ -} C) DEFINE B AS v > PREV(v),
               C AS v < PREV(v)))
""", expect=-1.0)
check("expr_measures_alternation", """
    SELECT COUNT(*) FROM (
      SELECT * FROM r9b.em MATCH_RECOGNIZE (
        PARTITION BY g ORDER BY seq
        MEASURES SUM(v + 0) AS sv
        ONE ROW PER MATCH PATTERN (U+ | D+)
        DEFINE U AS v > PREV(v), D AS v < PREV(v)))
""", rows=1)
check("expr_measure_count_star_in_formula", """
    SELECT mx FROM (SELECT * FROM r9b.em MATCH_RECOGNIZE (
      PARTITION BY g ORDER BY seq
      MEASURES COUNT(*) * 10 + COUNT(v) AS mx
      ONE ROW PER MATCH PATTERN (A B+) DEFINE B AS v > PREV(v)))
    WHERE g = 1
""", expect=33)
check("expr_measure_classifier_concat", """
    SELECT c2 FROM (SELECT * FROM r9b.em MATCH_RECOGNIZE (
      PARTITION BY g ORDER BY seq
      MEASURES CLASSIFIER() || '!' AS c2
      ALL ROWS PER MATCH PATTERN (A B+) DEFINE B AS v > PREV(v)))
    WHERE g = 1 AND seq = 1
""", expect="A!")

# ------------------------------------------------ 2. batch 2/3
# statements through scripting
check("use_role_in_block", """
    BEGIN
      USE ROLE sysadmin;
      RETURN 'ok';
    END
""", expect="ok")
check("alter_session_tz_in_block", """
    BEGIN
      ALTER SESSION SET TIMEZONE = 'UTC';
      RETURN (SELECT 1);
    END
""", expect=1)
check("show_grants_in_procedure", """
    CREATE OR REPLACE PROCEDURE r9b_g()
    RETURNS STRING LANGUAGE SQL AS
    $$ BEGIN
      LET n INT := (SELECT COUNT(*) FROM TABLE(RESULT_SCAN(
        LAST_QUERY_ID())));
      RETURN 'done';
    END $$;
    SHOW GRANTS ON TABLE r9b.em;
    CALL r9b_g()
""", expect="done")

# ------------------------------------------------ 3. retention
# interplay
check("undrop_after_swap", """
    CREATE OR REPLACE TABLE r9b.sa AS SELECT 1 AS x;
    CREATE OR REPLACE TABLE r9b.sb AS SELECT 2 AS x;
    ALTER TABLE r9b.sa SWAP WITH r9b.sb;
    DROP TABLE r9b.sa;
    UNDROP TABLE r9b.sa;
    SELECT x FROM r9b.sa
""", expect=2)
check("clone_then_drop_undrop", """
    CREATE OR REPLACE TABLE r9b.c1 AS SELECT 7 AS x;
    CREATE OR REPLACE TABLE r9b.c2 CLONE r9b.c1;
    DROP TABLE r9b.c2;
    UNDROP TABLE r9b.c2;
    SELECT x FROM r9b.c2
""", expect=7)
check("drop_undrop_bucketed_layout_survives", """
    SELECT COUNT(*) FROM r9b.sa
""", expect=1)

# ------------------------------------------------ 4. promoted gate
# entries through a bare engine (same callables the driver grades)
import importlib  # noqa: E402

entry = importlib.import_module("__spark_entry__")
qs, oracles = entry.queries(), entry.oracle_sql()
for nm in ("q27_count_distinct", "q33_fn_surface"):
    try:
        df = qs[nm](spark, "/root/testdata/sf0.001")
        n = df.count()
        if n > 0 and nm in oracles:
            ok += 1
        else:
            fail += 1
            failures.append((nm, f"rows={n} oracle={'yes' if nm in oracles else 'no'}"))
    except Exception as e:  # noqa: BLE001
        fail += 1
        failures.append((nm, str(e)[:160]))

print(f"\n{ok} ok, {fail} FAIL")
for name, why in failures:
    print(f"  FAIL {name}: {why}")
sys.exit(1 if fail else 0)
