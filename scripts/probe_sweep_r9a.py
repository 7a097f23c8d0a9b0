"""Round-9 probe sweep (VERDICT r8 task 4): executed battery over the
round-8 additions plus this round's statement surface —

1. sketch pipelines THROUGH TABLES: write APPROX_PERCENTILE_ACCUMULATE
   / APPROX_TOP_K_ACCUMULATE states to a table, read back, COMBINE +
   ESTIMATE (dtype/canonicalization seams live at the parquet
   boundary);
2. TO_QUERY templates that themselves carry `?` binds (EXECUTE
   IMMEDIATE USING) and session variables;
3. SEARCH over multi-language / mixed-script documents;
4. round-9 features adversarially: SHOW quoting edges, UNDROP through
   scripting blocks and procedures, MATERIALIZED VIEW + SHOW
   interplay, nested MATCH_RECOGNIZE edge shapes (alias forms, UNION,
   column-list CTEs, WHERE tails).

Run: python scripts/probe_sweep_r9a.py
Findings get fixed and locked into the permanent suites."""

import shutil
import sys

sys.path.insert(0, "/root/repo")

wh = "/tmp/r9a_sweep_wh"
shutil.rmtree(wh, ignore_errors=True)
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from dbt_icebreaker_spark.runner import IcebreakerEngine  # noqa: E402

eng = IcebreakerEngine(spark, schema="r9sw")

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


# ---------------------------------------------------------------- 1.
# sketch pipelines through TABLES (persisted partials)
check("pct_accumulate_to_table", """
    CREATE OR REPLACE TABLE r9sw.pct_states AS
    SELECT grp, APPROX_PERCENTILE_ACCUMULATE(v) AS state
    FROM (SELECT id % 2 AS grp, CAST(id AS DOUBLE) AS v
          FROM RANGE(101)) GROUP BY grp;
    SELECT CAST(APPROX_PERCENTILE_ESTIMATE(
             APPROX_PERCENTILE_COMBINE(state), 0.5) AS BIGINT)
    FROM r9sw.pct_states
""", expect=50)
check("pct_estimate_single_persisted_state", """
    SELECT CAST(APPROX_PERCENTILE_ESTIMATE(state, 0.0) AS BIGINT)
    FROM r9sw.pct_states WHERE grp = 0
""", expect=0)
check("topk_accumulate_to_table", """
    CREATE OR REPLACE TABLE r9sw.topk_states AS
    SELECT id % 3 AS grp, APPROX_TOP_K_ACCUMULATE(x, 2) AS state
    FROM (SELECT id, CASE WHEN id % 10 = 0 THEN 'hot' ELSE
                 CONCAT('c', id) END AS x
          FROM RANGE(60)) GROUP BY grp;
    SELECT APPROX_TOP_K_ESTIMATE(APPROX_TOP_K_COMBINE(state), 1)[0][0]
    FROM r9sw.topk_states
""", expect="hot")
check("pct_numeric_items_survive_parquet", """
    CREATE OR REPLACE TABLE r9sw.topk_num AS
    SELECT APPROX_TOP_K_ACCUMULATE(v, 3) AS state
    FROM (SELECT CAST(id % 4 AS INT) AS v FROM RANGE(40));
    SELECT APPROX_TOP_K_ESTIMATE(state, 1)[0][0] FROM r9sw.topk_num
""", expect="0")

# ---------------------------------------------------------------- 2.
# TO_QUERY with ? binds and session variables
check("to_query_with_question_binds", """
    EXECUTE IMMEDIATE 'SELECT c FROM TABLE(TO_QUERY(
      ''SELECT :x + 5 AS c'', x => 10)) WHERE c = ?' USING (15)
""", expect=15)
check("to_query_qmark_in_template_not_a_bind", """
    EXECUTE IMMEDIATE 'SELECT c FROM TABLE(TO_QUERY(
      ''SELECT ''''?'''' AS c''))' USING ()
""", expect="?")
check("to_query_template_from_session_var", """
    SET r9_tpl = 'SELECT :a * 2 AS c';
    SELECT c FROM TABLE(TO_QUERY($r9_tpl, a => 21))
""", expect=42)
check("to_query_bind_from_session_var", """
    SET r9_v = 7;
    SELECT c FROM TABLE(TO_QUERY('SELECT :b + 1 AS c', b => $r9_v))
""", expect=8)

# ---------------------------------------------------------------- 3.
# SEARCH over multi-language / mixed-script text
check("search_cyrillic_token", """
    SELECT SEARCH('привет мир hello', 'мир')
""", expect=True)
check("search_cjk_no_space_tokens", """
    SELECT SEARCH('日本語テキスト hello world', 'hello')
""", expect=True)
check("search_accented_exact", """
    SELECT SEARCH('café au lait', 'café')
""", expect=True)
check("search_accent_mismatch_false", """
    SELECT SEARCH('café au lait', 'cafe')
""", expect=False)
check("search_mixed_punct_split", """
    SELECT SEARCH('uno,dos;tres', 'dos')
""", expect=True)

# ---------------------------------------------------------------- 4a.
# SHOW edges
check("show_like_underscore_literal", """
    CREATE OR REPLACE TABLE r9sw.sw_a1 AS SELECT 1 AS x;
    SHOW TABLES LIKE 'sw_a%' IN SCHEMA r9sw
""", rows=1)
check("show_tables_missing_schema_native_error",
      "SHOW TABLES IN SCHEMA no_such_schema_r9", err="no_such_schema")
check("show_columns_on_table_form",
      "SHOW COLUMNS ON TABLE r9sw.sw_a1", rows=1)
check("show_starts_with_actionable",
      "SHOW TABLES STARTS WITH 'sw'", err="STARTS WITH")

# ---------------------------------------------------------------- 4b.
# UNDROP through scripting / procedures
check("undrop_inside_scripting_block", """
    CREATE OR REPLACE TABLE r9sw.sw_u1 AS SELECT 17 AS x;
    BEGIN
      DROP TABLE r9sw.sw_u1;
      UNDROP TABLE r9sw.sw_u1;
      RETURN (SELECT x FROM r9sw.sw_u1);
    END
""", expect=17)
check("drop_in_procedure_then_undrop_outside", """
    CREATE OR REPLACE PROCEDURE r9sw_dropper()
    RETURNS STRING LANGUAGE SQL AS
    $$ BEGIN DROP TABLE r9sw.sw_u2; RETURN 'gone'; END $$;
    CREATE OR REPLACE TABLE r9sw.sw_u2 AS SELECT 23 AS x;
    CALL r9sw_dropper();
    UNDROP TABLE r9sw.sw_u2;
    SELECT x FROM r9sw.sw_u2
""", expect=23)
check("undrop_unqualified_uses_current_schema", """
    CREATE OR REPLACE TABLE r9sw.sw_u3 AS SELECT 5 AS x
""", expect=None)

# ---------------------------------------------------------------- 4c.
# MATERIALIZED VIEW interplay
check("mv_shows_as_table", """
    CREATE OR REPLACE MATERIALIZED VIEW r9sw.sw_mv AS SELECT 9 AS x;
    SHOW TABLES LIKE 'sw_mv' IN r9sw
""", rows=1)
check("mv_then_undrop", """
    DROP MATERIALIZED VIEW r9sw.sw_mv;
    UNDROP TABLE r9sw.sw_mv;
    SELECT x FROM r9sw.sw_mv
""", expect=9)

# ---------------------------------------------------------------- 4d.
# nested MATCH_RECOGNIZE edge shapes
MR = """MATCH_RECOGNIZE (
    PARTITION BY g ORDER BY seq
    MEASURES COUNT(*) AS n, FIRST(seq) AS lo
    ONE ROW PER MATCH
    PATTERN (A B+)
    DEFINE B AS v > PREV(v)
)"""
PRE = ["""
CREATE OR REPLACE TABLE r9sw.sw_mr AS
SELECT g, seq, v FROM VALUES
  (1, 1, 10), (1, 2, 20), (1, 3, 30), (1, 4, 5),
  (2, 1, 50), (2, 2, 40), (2, 3, 60), (2, 4, 70) t(g, seq, v)
"""]
check("mr_cte_with_as_alias", f"""
    WITH m AS (SELECT * FROM r9sw.sw_mr {MR} AS mr_out)
    SELECT SUM(n) FROM m
""", expect=6, pre=PRE)
check("mr_under_union", f"""
    SELECT n FROM (SELECT * FROM r9sw.sw_mr {MR}) WHERE g = 1
    UNION ALL
    SELECT n FROM (SELECT * FROM r9sw.sw_mr {MR}) WHERE g = 2
""", rows=2)
check("mr_cte_column_list", f"""
    WITH m (grp, cnt) AS (SELECT g, n FROM r9sw.sw_mr {MR})
    SELECT SUM(cnt) FROM m
""", expect=6)
check("mr_cte_where_tail_inside", f"""
    WITH m AS (SELECT * FROM r9sw.sw_mr {MR} WHERE lo = 1)
    SELECT COUNT(*) FROM m
""", expect=1)
check("mr_in_scripting_block", f"""
    BEGIN
      LET total INT := (WITH m AS (SELECT * FROM r9sw.sw_mr {MR})
                        SELECT SUM(n) FROM m);
      RETURN total;
    END
""", expect=6)
check("mr_join_two_sources", f"""
    SELECT a.n + b.n FROM
      (SELECT * FROM (SELECT * FROM r9sw.sw_mr WHERE g = 1) {MR}) a
      JOIN
      (SELECT * FROM (SELECT * FROM r9sw.sw_mr WHERE g = 2) {MR}) b
      ON a.n = b.n
""", expect=6)
check("mr_body_error_specific_in_cte", f"""
    WITH m AS (SELECT * FROM r9sw.sw_mr MATCH_RECOGNIZE (
        ORDER BY seq MEASURES COUNT(*) AS n PATTERN (A+)
        DEFINE A AS v > 0))
    SELECT * FROM m
""", err="PARTITION BY")

# ---------------------------------------------------------------- 4e.
# CONNECT BY + new statement heads interplay
check("connect_by_into_mv", """
    CREATE OR REPLACE TABLE r9sw.sw_tree AS
    SELECT * FROM VALUES (1, NULL), (2, 1), (3, 1), (4, 2)
      t(id, parent_id);
    CREATE OR REPLACE MATERIALIZED VIEW r9sw.sw_tree_mv AS
    SELECT id, LEVEL AS lvl FROM r9sw.sw_tree
    START WITH parent_id IS NULL
    CONNECT BY PRIOR id = parent_id;
    SELECT CAST(MAX(lvl) AS INT) FROM r9sw.sw_tree_mv
""", expect=3)

print(f"\n{ok} ok, {fail} FAIL")
for name, why in failures:
    print(f"  FAIL {name}: {why}")
sys.exit(1 if fail else 0)
