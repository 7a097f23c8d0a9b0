"""Round-7 probe sweep: Snowflake Scripting / stored-procedure shapes
executed through the public engine surface (VERDICT r6 task 4 — the
two r6 judge findings lived in this layer). Run:

    python scripts/probe_sweep_r7a.py

Each case executes and compares values; findings get fixed and locked
into tests/test_scripting.py (TestR7aSweep)."""

import shutil
import sys

sys.path.insert(0, "/root/repo")

wh = "/tmp/r7a_sweep_wh"
shutil.rmtree(wh, ignore_errors=True)
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from dbt_icebreaker_spark.runner import IcebreakerEngine  # noqa: E402

eng = IcebreakerEngine(spark, schema="r7sw")
eng.execute("CREATE OR REPLACE TABLE r7sw.t AS SELECT * FROM VALUES "
            "(1, 10.0), (2, 20.0), (3, 30.0) t(k, v)")

ok = fail = 0
failures = []


def check(name, sql, expect=None, err=None, is_call_seq=None):
    global ok, fail
    try:
        if is_call_seq:
            for pre in is_call_seq:
                eng.execute(pre)
        r = eng.execute(sql).collect()
        got = r[0][0] if r else None
        if err is not None:
            fail += 1
            failures.append((name, f"expected error {err!r}, got {got!r}"))
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


# --- 1. variable/column collisions in every expression position
check("coll-return", "DECLARE v INT DEFAULT 9; BEGIN RETURN (SELECT MAX(v) FROM r7sw.t); END", 30.0)
check("coll-let", "DECLARE v INT DEFAULT 9; BEGIN LET w := (SELECT COUNT(v) FROM r7sw.t); RETURN w; END", 3)
check("coll-if", "DECLARE v INT DEFAULT 9; BEGIN IF ((SELECT MIN(v) FROM r7sw.t) = 10) THEN RETURN 1; END IF; RETURN 0; END", 1)
check("coll-while", "DECLARE v INT DEFAULT 0; BEGIN WHILE (v < (SELECT COUNT(v) FROM r7sw.t)) DO LET v := v + 1; END WHILE; RETURN v; END", 3)
check("coll-for-bounds", "DECLARE k INT DEFAULT 99; DECLARE s INT DEFAULT 0; BEGIN FOR i IN 1 TO (SELECT MAX(k) FROM r7sw.t) DO LET s := s + i; END FOR; RETURN s; END",
      err="ONE declaration")  # two DECLAREs — refusal (r7 fix); real form below
check("coll-for-bounds2", "DECLARE s INT DEFAULT 0; BEGIN FOR i IN 1 TO (SELECT MAX(k) FROM r7sw.t) DO LET s := s + i; END FOR; RETURN s; END", 6)
check("coll-declare-default", "DECLARE v INT DEFAULT (SELECT SUM(v) FROM r7sw.t); BEGIN RETURN v; END", 60.0)
check("coll-case-expr", "DECLARE v INT DEFAULT 9; BEGIN RETURN CASE WHEN (SELECT MAX(v) FROM r7sw.t) > 20 THEN 'big' ELSE 'small' END; END", "big")
check("coll-assign", "DECLARE v INT DEFAULT 9; DECLARE w INT; BEGIN w := (SELECT AVG(v) FROM r7sw.t); RETURN w; END",
      err="ONE declaration")
check("coll-assign2", "DECLARE w INT DEFAULT 0; BEGIN w := (SELECT MAX(v) FROM r7sw.t) + w; RETURN w; END", 30.0)
check("coll-sql-stmt", "DECLARE v INT DEFAULT 9; BEGIN CREATE OR REPLACE TABLE r7sw.o1 AS SELECT k, v FROM r7sw.t WHERE v > 15; RETURN (SELECT COUNT(*) FROM r7sw.o1); END", 2)

# --- 2. cursors parameterized by variables
check("cursor-bind-at-open",
      "DECLARE lim INT DEFAULT 15; c CURSOR FOR SELECT k FROM r7sw.t WHERE v > :lim ORDER BY k; k1 INT; BEGIN "
      "OPEN c; FETCH c INTO k1; RETURN k1; END", 2)
check("cursor-reopen-new-bind",
      "DECLARE lim INT DEFAULT 15; c CURSOR FOR SELECT COUNT(*) AS n FROM r7sw.t WHERE v > :lim; n1 INT; n2 INT; BEGIN "
      "OPEN c; FETCH c INTO n1; CLOSE c; LET lim := 25; OPEN c; FETCH c INTO n2; RETURN n1 * 10 + n2; END", 21)
check("cursor-bare-col-not-substituted",
      "DECLARE v INT DEFAULT 999; c CURSOR FOR SELECT MAX(v) AS m FROM r7sw.t; m INT; BEGIN OPEN c; FETCH c INTO m; RETURN m; END", 30.0)
check("cursor-for-loop-bind",
      "DECLARE lim INT DEFAULT 15; c CURSOR FOR SELECT k, v FROM r7sw.t WHERE v > :lim ORDER BY k; s DOUBLE DEFAULT 0; BEGIN "
      "FOR r IN c DO LET s := s + r.v; END FOR; RETURN s; END", 50.0)

# --- 3. CALL inside loops / exceptions across CALL
pre = ["CREATE OR REPLACE PROCEDURE r7sw_double(x INT) RETURNS INT LANGUAGE SQL AS $$ BEGIN RETURN x * 2; END $$"]
check("call-inside-for",
      "DECLARE s INT DEFAULT 0; BEGIN FOR i IN 1 TO 3 DO CALL r7sw_double(:i); LET s := s + i; END FOR; RETURN s; END",
      6, is_call_seq=pre)
pre2 = ["CREATE OR REPLACE PROCEDURE r7sw_boom() RETURNS INT LANGUAGE SQL AS $$ DECLARE e EXCEPTION (-20001, 'boom'); BEGIN RAISE e; END $$"]
check("call-exception-caught-in-loop",
      "DECLARE n INT DEFAULT 0; BEGIN FOR i IN 1 TO 3 DO "
      "BEGIN CALL r7sw_boom(); EXCEPTION WHEN OTHER THEN LET n := n + 1; END; "
      "END FOR; RETURN n; END", 3, is_call_seq=pre2)
check("call-exception-by-name-across-call",
      "DECLARE e EXCEPTION (-20001, 'boom'); BEGIN CALL r7sw_boom(); "
      "EXCEPTION WHEN e THEN RETURN 'caught'; END", "caught", is_call_seq=pre2)

# --- 4. RESULTSET reassignment
check("rs-reassign",
      "DECLARE rs RESULTSET; BEGIN rs := (SELECT 1 AS a); rs := (SELECT 2 AS a); RETURN TABLE(rs); END", 2)
check("rs-for-after-reassign",
      "DECLARE rs RESULTSET; s INT DEFAULT 0; BEGIN rs := (SELECT k FROM r7sw.t); rs := (SELECT k FROM r7sw.t WHERE k > 1); "
      "FOR r IN rs DO LET s := s + r.k; END FOR; RETURN s; END", 5)
check("rs-var-bind",
      "DECLARE lim INT DEFAULT 1; rs RESULTSET DEFAULT (SELECT COUNT(*) AS n FROM r7sw.t WHERE k > :lim); BEGIN RETURN TABLE(rs); END", 2)

# --- 5. handler scoping across nested blocks
check("inner-handler-catches-outer-continues",
      "DECLARE n INT DEFAULT 0; BEGIN "
      "BEGIN LET x := 1/0; EXCEPTION WHEN EXPRESSION_ERROR THEN LET n := 1; END; "
      "LET n := n + 10; RETURN n; END", 11)
check("bare-raise-rethrows-to-outer",
      "BEGIN BEGIN LET x := 1/0; EXCEPTION WHEN EXPRESSION_ERROR THEN RAISE; END; "
      "RETURN 'no'; EXCEPTION WHEN EXPRESSION_ERROR THEN RETURN 'outer'; END", "outer")
check("sqlerrm-in-nested-handler",
      "DECLARE e EXCEPTION (-20002, 'mymsg'); BEGIN "
      "BEGIN RAISE e; EXCEPTION WHEN e THEN RETURN sqlerrm; END; END", "mymsg")
check("declared-exc-inner-no-match-outer-other",
      "DECLARE e1 EXCEPTION (-20001, 'a'); e2 EXCEPTION (-20002, 'b'); BEGIN "
      "BEGIN RAISE e1; EXCEPTION WHEN e2 THEN RETURN 'wrong'; END; "
      "EXCEPTION WHEN e1 THEN RETURN 'right'; END", "right")
check("handler-sqlcode-user", "DECLARE e EXCEPTION (-20009, 'x'); BEGIN RAISE e; EXCEPTION WHEN e THEN RETURN sqlcode; END", -20009)

# --- 6. loop seams
check("for-shadow-restored",
      "DECLARE i INT DEFAULT 77; s INT DEFAULT 0; BEGIN FOR i IN 1 TO 3 DO LET s := s + i; END FOR; RETURN i * 100 + s; END",
      7706)
check("for-shadow-restored2",
      "DECLARE i INT DEFAULT 77; BEGIN FOR i IN 1 TO 3 DO LET x2 := i; END FOR; RETURN i; END", 77)
check("break-in-rs-for-inside-while",
      "DECLARE n INT DEFAULT 0; w INT DEFAULT 0; BEGIN "
      "WHILE (w < 2) DO LET w := w + 1; "
      "FOR r IN (SELECT k FROM r7sw.t ORDER BY k) DO LET n := n + 1; IF (r.k = 2) THEN BREAK; END IF; END FOR; "
      "END WHILE; RETURN n; END", 4)
check("continue-in-for",
      "DECLARE s INT DEFAULT 0; BEGIN FOR i IN 1 TO 5 DO IF (i = 3) THEN CONTINUE; END IF; LET s := s + i; END FOR; RETURN s; END", 12)
check("nested-for-same-var-refused-or-shadowed",
      "DECLARE s INT DEFAULT 0; BEGIN FOR i IN 1 TO 2 DO FOR j IN 1 TO 2 DO LET s := s + i * 10 + j; END FOR; END FOR; RETURN s; END", 66)

# --- 7. procedures: defaults, named args, table returns
pre3 = ["CREATE OR REPLACE PROCEDURE r7sw_tab(lim INT DEFAULT 1) RETURNS TABLE(k INT, v DOUBLE) LANGUAGE SQL AS "
        "$$ DECLARE rs RESULTSET; BEGIN rs := (SELECT k, v FROM r7sw.t WHERE k > :lim ORDER BY k); RETURN TABLE(rs); END $$"]
check("proc-table-default-arg", "CALL r7sw_tab()", 2, is_call_seq=pre3)
check("proc-table-named-arg", "CALL r7sw_tab(lim => 2)", 3, is_call_seq=pre3)
check("proc-arg-expr", "CALL r7sw_double(1 + 2)", 6, is_call_seq=pre)
check("proc-arg-subquery", "CALL r7sw_double((SELECT MAX(k) FROM r7sw.t))", 6, is_call_seq=pre)
pre4 = ["CREATE OR REPLACE PROCEDURE r7sw_rec(n INT) RETURNS INT LANGUAGE SQL AS "
        "$$ BEGIN IF (n <= 1) THEN RETURN 1; END IF; LET m := n - 1; LET sub := (SELECT * FROM TABLE(RESULT_SCAN(LAST_QUERY_ID()))); RETURN n; END $$"]
check("proc-arg-var-from-block",
      "DECLARE x INT DEFAULT 4; BEGIN CALL r7sw_double(:x); RETURN (SELECT * FROM TABLE(RESULT_SCAN(LAST_QUERY_ID()))); END", 8,
      is_call_seq=pre)

# --- 8. misc seams
check("let-null-then-use", "BEGIN LET a := NULL; RETURN COALESCE(a, 5); END", 5)
check("if-null-cond-false", "BEGIN IF (NULL) THEN RETURN 1; END IF; RETURN 0; END", 0)
check("string-var-quoting", "BEGIN LET s := 'o''brien'; RETURN s || '!'; END", "o'brien!")
check("bool-var", "BEGIN LET b := TRUE; IF (b) THEN RETURN 'y'; END IF; RETURN 'n'; END", "y")
check("var-in-string-literal-untouched",
      "DECLARE v INT DEFAULT 5; BEGIN RETURN 'v is not subst'; END", "v is not subst")
check("colon-bind-in-plain-sql",
      "DECLARE lim DOUBLE DEFAULT 15; BEGIN CREATE OR REPLACE TABLE r7sw.o2 AS SELECT * FROM r7sw.t WHERE v > :lim; "
      "RETURN (SELECT COUNT(*) FROM r7sw.o2); END", 2)
check("return-table-subquery-bind",
      "DECLARE lim INT DEFAULT 2; BEGIN RETURN TABLE(SELECT k FROM r7sw.t WHERE k >= :lim ORDER BY k); END", 2)
check("exec-immediate-inside-block",
      "BEGIN EXECUTE IMMEDIATE 'SELECT 41'; RETURN (SELECT * FROM TABLE(RESULT_SCAN(LAST_QUERY_ID()))) + 1; END", 42)

# --- 9. second batch: nastier seams
check("let-empty-subquery-null", "BEGIN LET a := (SELECT k FROM r7sw.t WHERE k > 99); RETURN COALESCE(a, -1); END", -1)
check("fetch-after-close", "DECLARE c CURSOR FOR SELECT 1 AS a; x INT; BEGIN OPEN c; CLOSE c; FETCH c INTO x; RETURN x; END",
      err="not OPEN")
check("reopen-resets-position",
      "DECLARE c CURSOR FOR SELECT k FROM r7sw.t ORDER BY k; a INT; b INT; BEGIN "
      "OPEN c; FETCH c INTO a; OPEN c; FETCH c INTO b; RETURN a * 10 + b; END", 11)
check("cursor-in-nested-block-shared",
      "DECLARE c CURSOR FOR SELECT 7 AS a; x INT; BEGIN BEGIN OPEN c; FETCH c INTO x; END; RETURN x; END", 7)
check("nested-declare-shadow-persists",
      "DECLARE x INT DEFAULT 1; BEGIN BEGIN DECLARE x INT DEFAULT 2; BEGIN LET x := x + 1; END; END; RETURN x; END", 3)
check("handler-when-or-names",
      "DECLARE e1 EXCEPTION (-1, 'a'); e2 EXCEPTION (-2, 'b'); BEGIN RAISE e2; "
      "EXCEPTION WHEN e1 OR e2 THEN RETURN 'either'; END", "either")
check("raise-in-for-restores-and-handles",
      "DECLARE e EXCEPTION (-3, 'x'); n INT DEFAULT 5; BEGIN "
      "FOR n IN 1 TO 3 DO IF (n = 2) THEN RAISE e; END IF; END FOR; RETURN 0; "
      "EXCEPTION WHEN e THEN RETURN n; END", 5)
check("limit-bind", "DECLARE lim INT DEFAULT 2; BEGIN RETURN TABLE(SELECT k FROM r7sw.t ORDER BY k LIMIT :lim); END", 1)
check("order-by-bind-expr",
      "DECLARE srt INT DEFAULT 1; BEGIN LET top := (SELECT k FROM r7sw.t ORDER BY v * :srt DESC LIMIT 1); RETURN top; END", 3)
check("proc-too-many-args", "CALL r7sw_double(1, 2, 3)", err="no overload", is_call_seq=pre)
check("proc-wrong-named-arg", "CALL r7sw_double(y => 1)", err="no overload", is_call_seq=pre)
check("return-in-handler-casts",
      None if False else "BEGIN LET q := 1/0; EXCEPTION WHEN EXPRESSION_ERROR THEN RETURN 123; END", 123)
check("while-false-never-runs", "BEGIN LET n := 0; WHILE (1 = 2) DO LET n := 9; END WHILE; RETURN n; END", 0)
check("for-zero-range", "BEGIN LET s := 0; FOR i IN 5 TO 1 DO LET s := s + 1; END FOR; RETURN s; END", 0)
check("for-reverse", "BEGIN LET s := ''; FOR i IN REVERSE 1 TO 3 DO LET s := s || i; END FOR; RETURN s; END", "321")
check("uncaught-user-exc-msg",
      "DECLARE e EXCEPTION (-20077, 'custom msg'); BEGIN RAISE e; END", err="custom msg")
check("exception-section-no-match-propagates",
      "DECLARE e1 EXCEPTION (-1,'a'); BEGIN LET x := 1/0; EXCEPTION WHEN e1 THEN RETURN 'wrong'; END",
      err="divide")
check("scripting-error-not-caught-by-statement-error",
      "BEGIN FETCH nosuch INTO x; EXCEPTION WHEN STATEMENT_ERROR THEN RETURN 'caught'; END",
      err="not a DECLAREd cursor")
check("var-double-colon-cast-not-bind",
      "DECLARE v INT DEFAULT 3; BEGIN LET s := (SELECT COUNT(*) FROM r7sw.t WHERE k <= '3'::INT); RETURN s; END", 3)
check("bind-json-path-untouched",
      "BEGIN LET j := PARSE_JSON('{\"a\": 5}'); RETURN j:a::INT; END", 5)
check("rs-in-return-table-query",
      "DECLARE rs RESULTSET; BEGIN rs := (SELECT 1 AS a UNION ALL SELECT 2); RETURN (SELECT COUNT(*) FROM TABLE(rs)); END", 2)
check("rs-in-insert-select",
      "DECLARE rs RESULTSET; BEGIN rs := (SELECT k + 100 AS k, v FROM r7sw.t); "
      "CREATE OR REPLACE TABLE r7sw.rst AS SELECT * FROM TABLE(rs) WHERE k > 101; "
      "RETURN (SELECT COUNT(*) FROM r7sw.rst); END", 2)
check("call-result-scan-chain",
      "BEGIN CALL r7sw_double(21); LET got := (SELECT * FROM TABLE(RESULT_SCAN(LAST_QUERY_ID()))); RETURN got; END", 42,
      is_call_seq=pre)
check("update-with-binds",
      "DECLARE nv DOUBLE DEFAULT 111.0; BEGIN CREATE OR REPLACE TABLE r7sw.u1 AS SELECT * FROM r7sw.t; "
      "UPDATE r7sw.u1 SET v = :nv WHERE k = 1; RETURN (SELECT v FROM r7sw.u1 WHERE k = 1); END", 111.0)
check("merge-with-binds",
      "DECLARE thr DOUBLE DEFAULT 15.0; BEGIN CREATE OR REPLACE TABLE r7sw.m1 AS SELECT * FROM r7sw.t; "
      "MERGE INTO r7sw.m1 t USING (SELECT 2 AS k) s ON t.k = s.k WHEN MATCHED AND t.v > :thr THEN UPDATE SET v = v + :thr; "
      "RETURN (SELECT v FROM r7sw.m1 WHERE k = 2); END", 35.0)

print(f"\n{ok} ok, {fail} FAIL")
for name, msg in failures:
    print(f"  FAIL {name}: {msg}")
