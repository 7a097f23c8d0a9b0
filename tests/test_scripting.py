"""Snowflake Scripting anonymous blocks (dbt_icebreaker_spark/
scripting.py): control flow interpreted on the driver, every SQL
statement through the engine."""

from __future__ import annotations

import pytest

from dbt_icebreaker_spark.runner import IcebreakerEngine
from dbt_icebreaker_spark.scripting import ScriptingError, is_scripting_block


@pytest.fixture(scope="module")
def engine(spark):
    return IcebreakerEngine(spark, schema="scripting_test")


class TestDetection:
    def test_block_detected(self):
        assert is_scripting_block("BEGIN RETURN 1; END")
        assert is_scripting_block("DECLARE x INT; BEGIN RETURN x; END;")

    def test_transaction_noops_not_blocks(self):
        assert not is_scripting_block("BEGIN")
        assert not is_scripting_block("BEGIN TRANSACTION")
        assert not is_scripting_block("BEGIN WORK")

    def test_plain_sql_not_block(self):
        assert not is_scripting_block("SELECT 1")
        assert not is_scripting_block("SELECT 'BEGIN x END'")


class TestBlocks:
    def test_let_and_return(self, spark, engine):
        r = engine.execute("BEGIN LET x := 2 + 3; RETURN x * 10; END")
        assert r.collect()[0].value == 50

    def test_declare_default_and_if_chain(self, spark, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 7; BEGIN "
            "IF (v > 10) THEN RETURN 'big'; "
            "ELSEIF (v > 5) THEN RETURN 'mid'; "
            "ELSE RETURN 'small'; END IF; END"
        )
        assert r.collect()[0].value == "mid"

    def test_for_loop_accumulates(self, spark, engine):
        r = engine.execute(
            "BEGIN LET total := 0; "
            "FOR i IN 1 TO 5 DO total := total + i; END FOR; "
            "RETURN total; END"
        )
        assert r.collect()[0].value == 15

    def test_for_reverse(self, spark, engine):
        r = engine.execute(
            "BEGIN LET s := ''; "
            "FOR i IN REVERSE 1 TO 3 DO s := s || i; END FOR; "
            "RETURN s; END"
        )
        assert r.collect()[0].value == "321"

    def test_while_with_break(self, spark, engine):
        r = engine.execute(
            "BEGIN LET n := 0; WHILE (TRUE) DO LET n := n + 1; "
            "IF (n >= 3) THEN BREAK; END IF; END WHILE; RETURN n; END"
        )
        assert r.collect()[0].value == 3

    def test_sql_statements_with_binds_and_return_table(self, spark, engine):
        rows = engine.execute(
            "BEGIN LET lim := 2; "
            "CREATE OR REPLACE TABLE scripting_test.t1 AS "
            "SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3; "
            "RETURN TABLE(SELECT k FROM scripting_test.t1 "
            "WHERE k <= :lim ORDER BY k); END"
        ).collect()
        assert [r.k for r in rows] == [1, 2]

    def test_bind_does_not_clobber_matching_column(self, spark, engine):
        # a bare column named like a variable stays a column; only
        # :name substitutes in SQL-statement scope
        rows = engine.execute(
            "BEGIN LET k := 99; "
            "RETURN TABLE(SELECT k FROM scripting_test.t1 "
            "WHERE k < :k ORDER BY k); END"
        ).collect()
        assert [r.k for r in rows] == [1, 2, 3]

    def test_let_from_subquery_snowflake_dialect(self, spark, engine):
        r = engine.execute(
            "BEGIN LET mx := (SELECT MAX(k) FROM scripting_test.t1); "
            "RETURN IFF(mx = 3, 'three', 'other'); END"
        )
        assert r.collect()[0].value == "three"

    def test_case_expression_in_skipped_branch(self, spark, engine):
        r = engine.execute(
            "BEGIN IF (FALSE) THEN "
            "LET z := CASE WHEN 1 = 1 THEN 'a' ELSE 'b' END; RETURN z; "
            "ELSE RETURN 'took-else'; END IF; END"
        )
        assert r.collect()[0].value == "took-else"

    def test_via_execute_immediate(self, spark, engine):
        r = engine.execute(
            "EXECUTE IMMEDIATE $$ BEGIN LET a := 4; RETURN a; END $$"
        )
        assert r.collect()[0].value == 4

    def test_nested_for_in_if(self, spark, engine):
        r = engine.execute(
            "BEGIN LET s := 0; IF (TRUE) THEN "
            "FOR i IN 1 TO 3 DO LET s := s + i; END FOR; END IF; "
            "RETURN s; END"
        )
        assert r.collect()[0].value == 6

    def test_completes_without_return(self, spark, engine):
        r = engine.execute("BEGIN LET x := 1; END").collect()[0]
        assert r.status == "completed"

    def test_json_path_not_clobbered_by_bind(self, spark, engine):
        # "payload":field and arr[0]:field are JSON paths, not binds
        from dbt_icebreaker_spark.scripting import _Block
        from dbt_icebreaker_spark.transpiler.tokenizer import tokenize

        b = _Block(engine, "BEGIN END")
        b.vars["lim"] = 2
        assert ":lim" in b._sub_binds(
            tokenize('SELECT "payload":lim FROM t'))
        assert ":lim" in b._sub_binds(tokenize("SELECT arr[0]:lim FROM t"))

    def test_control_probes_not_in_result_history(self, spark, engine):
        # IF-condition/LET probes are interpreter internals — the
        # RESULT_SCAN history must keep pointing at user statements
        engine.execute("SELECT 123 AS probe_target")
        engine.execute("BEGIN LET x := 1; IF (x > 0) THEN LET x := 2; "
                       "END IF; END")
        got = engine.execute(
            "SELECT probe_target FROM TABLE(RESULT_SCAN(LAST_QUERY_ID(-2)))"
        ).collect()
        assert got[0][0] == 123


class TestRefusals:
    def test_cursor_without_for_refused(self, spark, engine):
        # cursors are SUPPORTED since round 6; a malformed declaration
        # (no FOR <query>) still gets an actionable error
        with pytest.raises(ScriptingError, match="CURSOR FOR"):
            engine.execute("DECLARE c CURSOR; BEGIN RETURN 1; END")

    def test_call_unknown_procedure_actionable(self, spark, engine):
        # CALL now routes to the procedure registry; an unknown name
        # gets the registry's actionable error, not a parse failure
        from dbt_icebreaker_spark.procedures import ProcedureError

        with pytest.raises(ProcedureError, match="no such procedure"):
            engine.execute("BEGIN CALL tp_never_defined(); END")

    def test_declare_inside_body_refused(self, spark, engine):
        with pytest.raises(ScriptingError, match="LET"):
            engine.execute("BEGIN DECLARE x INT; RETURN 1; END")

    def test_declare_without_begin_refused(self, spark, engine):
        with pytest.raises(ScriptingError, match="nested block"):
            engine.execute("BEGIN DECLARE x INT; LET y := 1; END")

    def test_for_over_cursor_name_refused(self, spark, engine):
        # a bare cursor name (no range, no subquery) stays refused
        with pytest.raises(ScriptingError, match="resultset"):
            engine.execute(
                "BEGIN FOR r IN c DO RETURN 1; END FOR; END"
            )


class TestForResultset:
    def test_row_fields_in_both_scopes(self, spark, engine):
        r = engine.execute(
            "DECLARE total DOUBLE DEFAULT 0; BEGIN "
            "FOR rec IN (SELECT id AS k, id * 1.5 AS v "
            "FROM RANGE(4) ORDER BY id) DO "
            "total := total + rec.v + :rec.k; END FOR; "
            "RETURN total; END"
        )
        assert r.collect()[0][0] == 15.0

    def test_break_and_shadow_restore(self, spark, engine):
        r = engine.execute(
            "DECLARE rec INT DEFAULT 9; n INT DEFAULT 0; BEGIN "
            "FOR rec IN (SELECT id FROM RANGE(100) ORDER BY id) DO "
            "n := n + 1; IF (n >= 3) THEN BREAK; END IF; END FOR; "
            "RETURN n * 100 + rec; END"  # rec restored to 9 after loop
        )
        assert r.collect()[0][0] == 309

    def test_unknown_field_actionable(self, spark, engine):
        with pytest.raises(ScriptingError, match="no column"):
            engine.execute(
                "BEGIN FOR r IN (SELECT 1 AS a) DO "
                "LET x := r.nope; END FOR; RETURN 1; END"
            )

    def test_row_var_without_field_actionable(self, spark, engine):
        with pytest.raises(ScriptingError, match="field access"):
            engine.execute(
                "BEGIN FOR r IN (SELECT 1 AS a) DO "
                "LET x := r + 1; END FOR; RETURN 1; END"
            )


class TestExceptions:
    def test_statement_error_caught(self, spark, engine):
        r = engine.execute(
            "BEGIN SELECT * FROM no_such_table_xyz; RETURN 'no'; "
            "EXCEPTION WHEN STATEMENT_ERROR THEN "
            "RETURN 'caught:' || :sqlerrm; END"
        )
        assert r.collect()[0][0].startswith("caught:")

    def test_user_exception_and_sqlcode(self, spark, engine):
        r = engine.execute(
            "DECLARE my_ex EXCEPTION (-20101, 'boom'); BEGIN "
            "IF (1 = 1) THEN RAISE my_ex; END IF; RETURN 'no'; "
            "EXCEPTION WHEN my_ex THEN RETURN :sqlcode || '/' || :sqlerrm; "
            "WHEN OTHER THEN RETURN 'other'; END"
        )
        assert r.collect()[0][0] == "-20101/boom"

    def test_other_catches_everything(self, spark, engine):
        r = engine.execute(
            "BEGIN LET x := 1 / 0; RETURN 'no'; "
            "EXCEPTION WHEN OTHER THEN RETURN 'div'; END"
        )
        assert r.collect()[0][0] == "div"

    def test_no_match_reraises_as_uncaught(self, spark, engine):
        with pytest.raises(ScriptingError, match="uncaught exception A"):
            engine.execute(
                "DECLARE a EXCEPTION; b EXCEPTION; BEGIN RAISE a; "
                "EXCEPTION WHEN b THEN RETURN 'wrong'; END"
            )

    def test_clean_body_skips_handlers(self, spark, engine):
        r = engine.execute(
            "BEGIN RETURN 'ok'; "
            "EXCEPTION WHEN OTHER THEN RETURN 'handler'; END"
        )
        assert r.collect()[0][0] == "ok"

    def test_bare_raise_reraises(self, spark, engine):
        with pytest.raises(Exception, match="nope_xyz|not found|NOT_FOUND"):
            engine.execute(
                "BEGIN SELECT * FROM nope_xyz; "
                "EXCEPTION WHEN OTHER THEN RAISE; END"
            )

    def test_bare_raise_outside_handler_refused(self, spark, engine):
        with pytest.raises(ScriptingError, match="bare RAISE"):
            engine.execute("BEGIN RAISE; END")

    def test_raise_undeclared_refused(self, spark, engine):
        with pytest.raises(ScriptingError, match="not a DECLAREd"):
            engine.execute("BEGIN RAISE ghost; END")

    def test_merge_when_inside_handler_not_a_boundary(self, spark, engine):
        # a MERGE statement's WHEN clauses must not be mistaken for
        # handler boundaries while scanning an unentered handler
        engine.execute("CREATE OR REPLACE TEMP VIEW ts AS SELECT 1 AS k")
        r = engine.execute(
            "BEGIN RETURN 'ok'; "
            "EXCEPTION WHEN OTHER THEN "
            "MERGE INTO ts t USING ts s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET k = 2; RETURN 'm'; END"
        )
        assert r.collect()[0][0] == "ok"


class TestProcedures:
    """CREATE PROCEDURE … LANGUAGE SQL + CALL (procedures.py)."""

    def test_create_call_scalar(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_add(x NUMBER, y NUMBER) "
            "RETURNS BIGINT LANGUAGE SQL AS "
            "$$ BEGIN RETURN x + y; END $$"
        )
        df = engine.execute("CALL tp_add(2, 40)")
        assert df.columns == ["TP_ADD"]
        assert df.collect()[0][0] == 42

    def test_named_and_default_args(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_fmt(n NUMBER, "
            "pre VARCHAR DEFAULT '#') RETURNS VARCHAR LANGUAGE SQL AS "
            "$$ BEGIN RETURN pre || n; END $$"
        )
        assert engine.execute("CALL tp_fmt(5)").collect()[0][0] == "#5"
        assert engine.execute(
            "CALL tp_fmt(5, pre => '@')").collect()[0][0] == "@5"
        assert engine.execute(
            "CALL tp_fmt(n => 7, pre => '!')").collect()[0][0] == "!7"

    def test_control_flow_and_binds(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_cls(n NUMBER) "
            "RETURNS VARCHAR LANGUAGE SQL AS $$ "
            "DECLARE msg VARCHAR; BEGIN "
            "IF (n > 10) THEN msg := 'big'; "
            "ELSE msg := 'small'; END IF; "
            "RETURN msg; END $$"
        )
        assert engine.execute("CALL tp_cls(15)").collect()[0][0] == "big"
        assert engine.execute("CALL tp_cls(3)").collect()[0][0] == "small"

    def test_returns_table(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_top(lim NUMBER) "
            "RETURNS TABLE(k BIGINT) LANGUAGE SQL AS $$ BEGIN "
            "RETURN TABLE(SELECT id AS k FROM RANGE(10) "
            "ORDER BY id DESC LIMIT :lim); END $$"
        )
        rows = engine.execute("CALL tp_top(3)").collect()
        assert [r.k for r in rows] == [9, 8, 7]

    def test_unquoted_body_whole_input(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_unq(a NUMBER)\n"
            "RETURNS BIGINT\nLANGUAGE SQL\nAS\n"
            "DECLARE t NUMBER DEFAULT 0;\nBEGIN\n"
            "  FOR i IN 1 TO 3 DO\n    t := t + a;\n  END FOR;\n"
            "  RETURN t;\nEND"
        )
        assert engine.execute("CALL tp_unq(5)").collect()[0][0] == 15

    def test_call_inside_block_and_nested_proc(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_inner(v NUMBER) "
            "RETURNS BIGINT LANGUAGE SQL AS "
            "$$ BEGIN RETURN v * 2; END $$"
        )
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_outer(v NUMBER) "
            "RETURNS BIGINT LANGUAGE SQL AS $$ BEGIN "
            "CALL tp_inner(:v); "
            "LET w := (SELECT TP_INNER FROM "
            "TABLE(RESULT_SCAN(LAST_QUERY_ID()))); "
            "RETURN w + 1; END $$"
        )
        assert engine.execute("CALL tp_outer(10)").collect()[0][0] == 21

    def test_overload_by_arity(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_ov(a NUMBER) "
            "RETURNS VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'one'; END $$"
        )
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_ov(a NUMBER, b NUMBER) "
            "RETURNS VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'two'; END $$"
        )
        assert engine.execute("CALL tp_ov(1)").collect()[0][0] == "one"
        assert engine.execute("CALL tp_ov(1, 2)").collect()[0][0] == "two"

    def test_drop_and_missing_errors(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_gone() RETURNS VARCHAR "
            "LANGUAGE SQL AS $$ BEGIN RETURN 'x'; END $$"
        )
        engine.execute("DROP PROCEDURE tp_gone()")
        with pytest.raises(ProcedureError, match="no such procedure"):
            engine.execute("CALL tp_gone()")
        # IF EXISTS tolerates absence
        engine.execute("DROP PROCEDURE IF EXISTS tp_gone()")
        with pytest.raises(ProcedureError, match="not a registered"):
            engine.execute("DROP PROCEDURE tp_gone()")

    def test_wrong_arity_and_language_refusal(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_one(a NUMBER) "
            "RETURNS VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'x'; END $$"
        )
        with pytest.raises(ProcedureError, match="no overload"):
            engine.execute("CALL tp_one(1, 2, 3)")
        with pytest.raises(ProcedureError, match="LANGUAGE JAVASCRIPT"):
            engine.execute(
                "CREATE PROCEDURE tp_js() RETURNS VARCHAR "
                "LANGUAGE JAVASCRIPT AS $$ return 1; $$"
            )

    def test_recursion_cap(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_rec(n NUMBER) "
            "RETURNS BIGINT LANGUAGE SQL AS $$ BEGIN "
            "CALL tp_rec(:n); RETURN 0; END $$"
        )
        with pytest.raises(ProcedureError, match="depth"):
            engine.execute("CALL tp_rec(1)")

    def test_show_procedures(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE tp_shown(a VARCHAR) "
            "RETURNS VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN a; END $$"
        )
        names = [r.name for r in engine.execute("SHOW PROCEDURES").collect()]
        assert "TP_SHOWN" in names


class TestReviewRegressionsR6:
    """Round-6 code-review findings, pinned."""

    def test_execute_as_with_dollar_body_multi_statement(self, spark, engine):
        # EXECUTE AS CALLER must not trip the unquoted-body whole-input
        # path: the trailing statement after the $$ body must still run
        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.rr_t")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE rr_p() RETURNS VARCHAR "
            "EXECUTE AS CALLER AS $$ BEGIN RETURN 'x'; END $$; "
            f"CREATE TABLE {sch}.rr_t AS SELECT 1 AS k;"
        )
        assert spark.table(f"{sch}.rr_t").count() == 1
        assert engine.execute("CALL rr_p()").collect()[0][0] == "x"

    def test_caller_catches_callee_exception(self, spark, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE rr_raises() RETURNS VARCHAR "
            "LANGUAGE SQL AS $$ DECLARE boom EXCEPTION (-20007, 'pow'); "
            "BEGIN RAISE boom; END $$"
        )
        r = engine.execute(
            "BEGIN CALL rr_raises(); RETURN 'no'; "
            "EXCEPTION WHEN boom THEN RETURN 'by-name:' || :sqlcode; END"
        )
        assert r.collect()[0][0] == "by-name:-20007"
        r = engine.execute(
            "BEGIN CALL rr_raises(); RETURN 'no'; "
            "EXCEPTION WHEN OTHER THEN RETURN 'other'; END"
        )
        assert r.collect()[0][0] == "other"

    def test_exception_column_name_not_a_section(self, spark, engine):
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW rr_errlog AS "
            "SELECT 'e1' AS exception"
        )
        r = engine.execute(
            "BEGIN SELECT exception FROM rr_errlog; LET x := 1/0; "
            "RETURN 'no'; "
            "EXCEPTION WHEN OTHER THEN RETURN 'caught'; END"
        )
        assert r.collect()[0][0] == "caught"

    def test_or_replace_with_leading_comment(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE rr_cmt() RETURNS VARCHAR "
            "LANGUAGE SQL AS $$ BEGIN RETURN 'a'; END $$"
        )
        engine.execute(
            "/* redeploy */ CREATE OR REPLACE PROCEDURE rr_cmt() "
            "RETURNS VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'b'; END $$"
        )
        assert engine.execute("CALL rr_cmt()").collect()[0][0] == "b"

    def test_loop_var_restored_into_handler(self, spark, engine):
        r = engine.execute(
            "DECLARE rec INT DEFAULT 9; BEGIN "
            "FOR rec IN (SELECT 1 AS a) DO LET z := 1/0; END FOR; "
            "RETURN 'no'; "
            "EXCEPTION WHEN OTHER THEN RETURN rec; END"
        )
        assert r.collect()[0][0] == 9

    def test_greatest_with_subquery_arg(self, spark, engine):
        v = engine.execute(
            "SELECT GREATEST((SELECT MAX(id) FROM RANGE(5)), 2) AS r"
        ).collect()[0][0]
        assert v == 4


class TestCursorsResultsets:
    """DECLARE CURSOR FOR / OPEN-FETCH-CLOSE / RESULTSET variables."""

    def test_cursor_for_loop(self, engine):
        r = engine.execute(
            "DECLARE c CURSOR FOR SELECT id AS k FROM RANGE(4) "
            "ORDER BY id; total INT DEFAULT 0; BEGIN "
            "FOR rec IN c DO total := total + rec.k; END FOR; "
            "RETURN total; END"
        )
        assert r.collect()[0][0] == 6

    def test_open_fetch_close_and_exhaustion_nulls(self, engine):
        r = engine.execute(
            "DECLARE c CURSOR FOR SELECT id, id * 10 FROM RANGE(2) "
            "ORDER BY id; a INT; b INT; s INT DEFAULT 0; BEGIN "
            "OPEN c; FETCH c INTO a, b; s := s + a + b; "
            "FETCH c INTO a, b; s := s + a + b; "
            "FETCH c INTO a, b; CLOSE c; "
            "RETURN s || '/' || COALESCE(a, -1); END"
        )
        assert r.collect()[0][0] == "11/-1"

    def test_cursor_binds_resolved_at_open(self, engine):
        r = engine.execute(
            "DECLARE cap INT DEFAULT 3; c CURSOR FOR SELECT id FROM "
            "RANGE(10) WHERE id < :cap; n INT DEFAULT 0; BEGIN "
            "FOR x IN c DO n := n + 1; END FOR; RETURN n; END"
        )
        assert r.collect()[0][0] == 3

    def test_resultset_default_and_return_table(self, engine):
        r = engine.execute(
            "DECLARE rs RESULTSET DEFAULT (SELECT id AS k FROM RANGE(3) "
            "ORDER BY id DESC); BEGIN RETURN TABLE(rs); END"
        )
        assert [x.k for x in r.collect()] == [2, 1, 0]

    def test_resultset_assign_and_loop(self, engine):
        r = engine.execute(
            "DECLARE rs RESULTSET; n INT DEFAULT 0; BEGIN "
            "LET lim := 2; rs := (SELECT id FROM RANGE(10) "
            "WHERE id < :lim); FOR x IN rs DO n := n + 1; END FOR; "
            "RETURN n; END"
        )
        assert r.collect()[0][0] == 2

    def test_let_resultset(self, engine):
        r = engine.execute(
            "BEGIN LET rs RESULTSET := (SELECT 42 AS v); "
            "RETURN TABLE(rs); END"
        )
        assert r.collect()[0][0] == 42

    def test_fetch_unopened_and_unknown_errors(self, engine):
        with pytest.raises(ScriptingError, match="not OPEN"):
            engine.execute(
                "DECLARE c CURSOR FOR SELECT 1; x INT; BEGIN "
                "FETCH c INTO x; RETURN 1; END"
            )
        with pytest.raises(ScriptingError, match="not a DECLAREd cursor"):
            engine.execute("BEGIN OPEN ghost; RETURN 1; END")

    def test_for_unknown_name_actionable(self, engine):
        with pytest.raises(ScriptingError, match="cursor or resultset"):
            engine.execute("BEGIN FOR r IN nothere DO RETURN 1; END FOR; END")


class TestNestedBlocks:
    def test_try_catch_idiom(self, engine):
        r = engine.execute(
            "DECLARE total INT DEFAULT 0; BEGIN "
            "BEGIN LET x := 1/0; "
            "EXCEPTION WHEN OTHER THEN total := total + 100; END; "
            "total := total + 1; RETURN total; END"
        )
        assert r.collect()[0][0] == 101

    def test_nested_declare_shares_outer_scope(self, engine):
        r = engine.execute(
            "DECLARE a INT DEFAULT 5; BEGIN "
            "DECLARE b INT DEFAULT 10; BEGIN a := a + b; END; "
            "RETURN a; END"
        )
        assert r.collect()[0][0] == 15

    def test_inner_return_exits_whole_block(self, engine):
        r = engine.execute(
            "BEGIN BEGIN RETURN 'inner'; END; RETURN 'outer'; END"
        )
        assert r.collect()[0][0] == "inner"

    def test_break_propagates_through_nested(self, engine):
        r = engine.execute(
            "BEGIN LET n := 0; FOR i IN 1 TO 10 DO BEGIN "
            "n := n + 1; IF (n >= 4) THEN BREAK; END IF; END; "
            "END FOR; RETURN n; END"
        )
        assert r.collect()[0][0] == 4

    def test_outer_handler_catches_inner_raise(self, engine):
        r = engine.execute(
            "DECLARE e EXCEPTION (-20021, 'inner boom'); BEGIN "
            "BEGIN RAISE e; END; RETURN 'no'; "
            "EXCEPTION WHEN e THEN RETURN 'outer ' || :sqlcode; END"
        )
        assert r.collect()[0][0] == "outer -20021"

    def test_three_deep(self, engine):
        r = engine.execute("BEGIN BEGIN BEGIN RETURN 3; END; END; END")
        assert r.collect()[0][0] == 3

    def test_skip_over_unentered_nested_block(self, engine):
        # a nested block inside a NOT-taken IF branch must be skipped
        # whole (its bare END is not the outer block's END)
        r = engine.execute(
            "BEGIN IF (FALSE) THEN BEGIN LET z := 1/0; END; "
            "RETURN 'no'; END IF; RETURN 'skipped'; END"
        )
        assert r.collect()[0][0] == "skipped"


class TestReviewRegressionsR6b:
    """Second code-review batch findings, pinned."""

    def test_begin_transaction_in_block_is_noop(self, spark, engine):
        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.txn_t")
        r = engine.execute(
            "BEGIN BEGIN TRANSACTION; "
            f"CREATE TABLE {sch}.txn_t AS SELECT 1 AS k; "
            "COMMIT; RETURN 'done'; END"
        )
        assert r.collect()[0][0] == "done"
        assert spark.table(f"{sch}.txn_t").count() == 1

    def test_stray_declare_does_not_swallow_statements(self, engine):
        # a DECLARE followed by a SQL verb (not a nested-block BEGIN)
        # must raise, never silently treat the SQL as declarations
        with pytest.raises(ScriptingError, match="DECLARE belongs"):
            engine.execute(
                "BEGIN DECLARE x INT; SELECT 1; RETURN 1; END"
            )

    def test_fetch_undeclared_and_arity_refused(self, engine):
        with pytest.raises(ScriptingError, match="not DECLAREd"):
            engine.execute(
                "DECLARE c CURSOR FOR SELECT 1 AS a; BEGIN OPEN c; "
                "FETCH c INTO typo_var; RETURN 1; END"
            )
        with pytest.raises(ScriptingError, match="column"):
            engine.execute(
                "DECLARE c CURSOR FOR SELECT 1 AS a; x INT; y INT; "
                "BEGIN OPEN c; FETCH c INTO x, y; RETURN 1; END"
            )

    def test_resultset_union_parens_not_stripped(self, engine):
        r = engine.execute(
            "BEGIN LET rs RESULTSET := "
            "((SELECT 1 AS a) UNION ALL (SELECT 2 AS a)); "
            "RETURN TABLE(rs); END"
        )
        assert sorted(x.a for x in r.collect()) == [1, 2]

    def test_nested_block_in_loop_reparses_once(self, engine):
        r = engine.execute(
            "BEGIN LET n := 0; FOR i IN 1 TO 5 DO "
            "BEGIN n := n + i; END; END FOR; RETURN n; END"
        )
        assert r.collect()[0][0] == 15


class TestSubqueryScopeR7:
    """Round-7 fix: _sub_expr must NOT substitute bare variable names
    inside (SELECT …)/(WITH …) subquery extents — those are QUERY
    scope where bare names are columns and variables need :name
    (judge-reproduced silent wrong answer, VERDICT r6 #1)."""

    @pytest.fixture(scope="class", autouse=True)
    def shadow(self, spark, engine):
        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.r7_shadow")
        spark.sql(
            f"CREATE TABLE {sch}.r7_shadow AS "
            "SELECT * FROM VALUES (1),(5),(9) AS t(v)"
        )
        yield sch

    def test_return_subquery_column_wins(self, engine, shadow):
        r = engine.execute(
            "DECLARE v INT DEFAULT 999; BEGIN RETURN "
            f"(SELECT MAX(v) FROM {shadow}.r7_shadow); END"
        )
        assert r.collect()[0][0] == 9

    def test_values_alias_column_not_replaced(self, engine):
        # the t(v) alias previously became t(999) — a parse error
        r = engine.execute(
            "DECLARE v INT DEFAULT 999; BEGIN RETURN "
            "(SELECT MAX(v) FROM VALUES (1),(4) AS t(v)); END"
        )
        assert r.collect()[0][0] == 4

    def test_let_from_subquery_colliding_name(self, engine, shadow):
        r = engine.execute(
            "DECLARE total INT DEFAULT 0; BEGIN "
            f"LET total := (SELECT SUM(v) FROM {shadow}.r7_shadow); "
            "RETURN total; END"
        )
        assert r.collect()[0][0] == 15

    def test_bind_still_substitutes_inside_subquery(self, engine, shadow):
        r = engine.execute(
            "DECLARE v INT DEFAULT 2; BEGIN RETURN "
            f"(SELECT MAX(x.v) + :v FROM {shadow}.r7_shadow x); END"
        )
        assert r.collect()[0][0] == 11

    def test_if_condition_subquery(self, engine, shadow):
        r = engine.execute(
            "DECLARE v INT DEFAULT 999; BEGIN IF "
            f"((SELECT COUNT(v) FROM {shadow}.r7_shadow) = 3) "
            "THEN RETURN 'col'; ELSE RETURN 'var'; END IF; END"
        )
        assert r.collect()[0][0] == "col"

    def test_while_condition_subquery(self, engine, shadow):
        r = engine.execute(
            "DECLARE v INT DEFAULT 0; BEGIN "
            f"WHILE (v < (SELECT MAX(v) FROM {shadow}.r7_shadow)) DO "
            "LET v := v + 4; END WHILE; RETURN v; END"
        )
        assert r.collect()[0][0] == 12

    def test_expression_scope_outside_subquery_still_substitutes(
            self, engine, shadow):
        r = engine.execute(
            "DECLARE v INT DEFAULT 7; BEGIN RETURN v + "
            f"(SELECT MIN(v) FROM {shadow}.r7_shadow); END"
        )
        assert r.collect()[0][0] == 8

    def test_nested_subquery_stays_bind_only(self, engine, shadow):
        r = engine.execute(
            "DECLARE v INT DEFAULT 999; BEGIN RETURN "
            "(SELECT MAX(q.v) FROM (SELECT v FROM "
            f"{shadow}.r7_shadow) q); END"
        )
        assert r.collect()[0][0] == 9


class TestDeclareRefusalsR7:
    """Round-7 fix: malformed DECLARE sections refuse actionably —
    never silently drop a declaration (VERDICT r6 #2 + ADVICE)."""

    def test_second_declare_keyword_refused(self, engine):
        with pytest.raises(ScriptingError, match="ONE declaration"):
            engine.execute(
                "DECLARE a INT DEFAULT 1; DECLARE b EXCEPTION "
                "(-20001, 'x'); BEGIN RETURN a; END"
            )

    def test_second_declare_names_line(self, engine):
        with pytest.raises(ScriptingError, match="line 2"):
            engine.execute(
                "DECLARE a INT DEFAULT 1;\n"
                "DECLARE b INT DEFAULT 2; BEGIN RETURN a; END"
            )

    def test_bare_name_declaration_refused(self, engine):
        with pytest.raises(ScriptingError, match="type and/or"):
            engine.execute("DECLARE foo; BEGIN RETURN 1; END")

    def test_empty_default_refused(self, engine):
        with pytest.raises(ScriptingError, match="without a value"):
            engine.execute(
                "DECLARE foo INT DEFAULT ; BEGIN RETURN 1; END")

    def test_verb_named_variable_declares(self, engine):
        # "open" is a cursor verb — shape classification must still
        # see a declaration (ADVICE scripting.py:666)
        r = engine.execute(
            "BEGIN DECLARE open INT DEFAULT 4; "
            "BEGIN RETURN open + 1; END; END"
        )
        assert r.collect()[0][0] == 5

    def test_verb_named_variable_with_precision(self, engine):
        r = engine.execute(
            "BEGIN DECLARE set NUMBER(10,2) DEFAULT 1.5; "
            "BEGIN RETURN set * 2; END; END"
        )
        assert float(r.collect()[0][0]) == 3.0

    def test_select_with_type_word_not_a_declaration(self, engine):
        # "SELECT date FROM …" must NOT classify as a declaration
        with pytest.raises(ScriptingError, match="DECLARE belongs"):
            engine.execute(
                "BEGIN DECLARE x INT DEFAULT 1; SELECT 2; "
                "BEGIN RETURN x; END; END"
            )

    def test_sqlerrm_restored_after_handler(self, engine, spark):
        sch = engine.effective_schema
        r = engine.execute(
            "DECLARE sqlerrm VARCHAR DEFAULT 'orig'; BEGIN "
            "BEGIN LET x := 1/0; EXCEPTION WHEN EXPRESSION_ERROR "
            "THEN LET y := 1; END; RETURN sqlerrm; END"
        )
        assert r.collect()[0][0] == "orig"

    def test_sqlerrm_not_leaked_after_handler(self, engine):
        # after the handler exits the builtin must be GONE — a bare
        # sqlerrm in the outer scope is an unknown column again
        from dbt_icebreaker_spark.errors import ExecutionError

        with pytest.raises((ExecutionError, Exception),
                           match="(?i)sqlerrm"):
            engine.execute(
                "BEGIN "
                "BEGIN LET x := 1/0; EXCEPTION WHEN EXPRESSION_ERROR "
                "THEN LET y := 1; END; RETURN sqlerrm; END"
            ).collect()


class TestOverloadResolutionR7:
    """Round-7: type-aware procedure overload resolution — exact
    family match beats implicit cast; genuine ties refuse
    (VERDICT r6 Missing #1)."""

    @pytest.fixture(scope="class", autouse=True)
    def procs(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7add(a INT, b INT DEFAULT 10) "
            "RETURNS INT LANGUAGE SQL AS $$ BEGIN RETURN a + b; END $$")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7add(a VARCHAR) "
            "RETURNS VARCHAR LANGUAGE SQL AS "
            "$$ BEGIN RETURN a || '!'; END $$")
        yield
        engine.execute("DROP PROCEDURE IF EXISTS r7add(INT, INT)")
        engine.execute("DROP PROCEDURE IF EXISTS r7add(VARCHAR)")

    def test_int_literal_picks_int_overload(self, engine):
        assert engine.execute("CALL r7add(5)").collect()[0][0] == 15

    def test_negative_int_literal(self, engine):
        assert engine.execute("CALL r7add(-5)").collect()[0][0] == 5

    def test_string_literal_picks_varchar(self, engine):
        assert engine.execute("CALL r7add('x')").collect()[0][0] == "x!"

    def test_float_literal_widens_to_int_sig(self, engine):
        # numeric family beats implicit varchar cast
        assert engine.execute("CALL r7add(2.5)").collect()[0][0] == 12

    def test_cast_expression_picks_type(self, engine):
        assert engine.execute(
            "CALL r7add(CAST(7 AS INT))").collect()[0][0] == 17

    def test_pg_cast_picks_type(self, engine):
        assert engine.execute(
            "CALL r7add('9'::INT)").collect()[0][0] == 19

    def test_unknown_expr_still_ambiguous(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        with pytest.raises(ProcedureError, match="ambiguous"):
            engine.execute("CALL r7add(RANDOM())")

    def test_exact_tie_still_refuses(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7tie(a INT) RETURNS INT "
            "LANGUAGE SQL AS $$ BEGIN RETURN 1; END $$")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7tie(a BIGINT, b INT "
            "DEFAULT 0) RETURNS INT LANGUAGE SQL AS "
            "$$ BEGIN RETURN 2; END $$")
        try:
            with pytest.raises(ProcedureError, match="ambiguous"):
                engine.execute("CALL r7tie(1)")
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7tie(INT)")
            engine.execute("DROP PROCEDURE IF EXISTS r7tie(BIGINT, INT)")

    def test_date_literal_picks_date_overload(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7d(a DATE) RETURNS VARCHAR "
            "LANGUAGE SQL AS $$ BEGIN RETURN 'date'; END $$")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7d(a INT, b INT DEFAULT 1) "
            "RETURNS VARCHAR LANGUAGE SQL AS "
            "$$ BEGIN RETURN 'int'; END $$")
        try:
            r = engine.execute("CALL r7d(DATE '2024-01-01')")
            assert r.collect()[0][0] == "date"
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7d(DATE)")
            engine.execute("DROP PROCEDURE IF EXISTS r7d(INT, INT)")

    def test_multiword_call_argument_renders_spaced(self, engine):
        # render over WS-stripped tokens used to concatenate words:
        # CAST(7 AS INT) became CAST(7ASINT)
        from dbt_icebreaker_spark.procedures import parse_call

        _, pos, _ = parse_call("CALL p(CAST(7 AS INT), DATE '2024-01-01')")
        assert pos == ["CAST(7 AS INT)", "DATE '2024-01-01'"]


class TestUnquotedProcTrailingR7:
    """Round-7 fix (ADVICE runner.py:321): statements after an
    unquoted CREATE PROCEDURE body's END must execute, not be
    silently absorbed into the stored body."""

    def test_trailing_insert_runs(self, engine, spark):
        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.r7_audit")
        spark.sql(
            f"CREATE TABLE {sch}.r7_audit (msg STRING) USING PARQUET")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7t1() RETURNS VARCHAR "
            "LANGUAGE SQL AS BEGIN RETURN 'hi'; END; "
            f"INSERT INTO {sch}.r7_audit VALUES ('after-create')"
        )
        assert spark.table(f"{sch}.r7_audit").count() == 1
        assert engine.execute("CALL r7t1()").collect()[0][0] == "hi"
        engine.execute("DROP PROCEDURE IF EXISTS r7t1()")

    def test_trailing_select_is_result(self, engine):
        r = engine.execute(
            "CREATE OR REPLACE PROCEDURE r7t2() RETURNS VARCHAR "
            "LANGUAGE SQL AS BEGIN RETURN 'x'; END; SELECT 42 AS n"
        )
        assert r.collect()[0][0] == 42
        engine.execute("DROP PROCEDURE IF EXISTS r7t2()")

    def test_nested_control_flow_body_splits_correctly(self, engine):
        r = engine.execute(
            "CREATE OR REPLACE PROCEDURE r7t3(n INT) RETURNS INT "
            "LANGUAGE SQL AS BEGIN IF (n > 0) THEN RETURN "
            "CASE WHEN n > 10 THEN 2 ELSE 1 END; END IF; "
            "BEGIN RETURN 0; END; END; SELECT 7 AS n"
        )
        assert r.collect()[0][0] == 7
        assert engine.execute("CALL r7t3(20)").collect()[0][0] == 2
        assert engine.execute("CALL r7t3(-1)").collect()[0][0] == 0
        engine.execute("DROP PROCEDURE IF EXISTS r7t3(INT)")

    def test_no_trailing_unchanged(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7t4() RETURNS INT "
            "LANGUAGE SQL AS BEGIN RETURN 3; END"
        )
        assert engine.execute("CALL r7t4()").collect()[0][0] == 3
        engine.execute("DROP PROCEDURE IF EXISTS r7t4()")

    def test_declare_body_with_trailing(self, engine):
        r = engine.execute(
            "CREATE OR REPLACE PROCEDURE r7t5() RETURNS INT "
            "LANGUAGE SQL AS DECLARE x INT DEFAULT 4; "
            "BEGIN RETURN x; END; SELECT 11 AS n"
        )
        assert r.collect()[0][0] == 11
        assert engine.execute("CALL r7t5()").collect()[0][0] == 4
        engine.execute("DROP PROCEDURE IF EXISTS r7t5()")


class TestR7aSweep:
    """Round-7 probe-sweep lock-ins (scripts/probe_sweep_r7a.py, 69
    executed shapes): variable/column collisions in every expression
    position, variable-parameterized cursors, CALL in loops, RESULTSET
    reassignment + TABLE(rs) in embedded SQL (sweep finding), VARIANT
    variables through json paths (sweep finding), handler scoping."""

    @pytest.fixture(scope="class", autouse=True)
    def tbl(self, spark, engine):
        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.sw_t")
        spark.sql(
            f"CREATE TABLE {sch}.sw_t AS SELECT k, CAST(v AS DOUBLE) "
            "AS v FROM VALUES (1, 10.0), (2, 20.0), (3, 30.0) t(k, v)"
        )
        yield sch

    def _v(self, engine, sql):
        return engine.execute(sql).collect()[0][0]

    # --- sweep findings (fixed round 7)
    def test_table_rs_in_subquery(self, engine):
        assert self._v(
            engine,
            "DECLARE rs RESULTSET; BEGIN rs := (SELECT 1 AS a UNION "
            "ALL SELECT 2); RETURN (SELECT COUNT(*) FROM TABLE(rs)); "
            "END") == 2

    def test_table_rs_in_ctas(self, engine, tbl):
        assert self._v(
            engine,
            "DECLARE rs RESULTSET; BEGIN "
            f"rs := (SELECT k + 100 AS k, v FROM {tbl}.sw_t); "
            f"CREATE OR REPLACE TABLE {tbl}.sw_rst AS "
            "SELECT * FROM TABLE(rs) WHERE k > 101; "
            f"RETURN (SELECT COUNT(*) FROM {tbl}.sw_rst); END") == 2

    def test_table_rs_unassigned_refused(self, engine):
        with pytest.raises(ScriptingError, match="no value yet"):
            engine.execute(
                "DECLARE rs RESULTSET; BEGIN LET n := "
                "(SELECT COUNT(*) FROM TABLE(rs)); RETURN n; END")

    def test_variant_variable_json_path(self, engine):
        assert self._v(
            engine,
            'BEGIN LET j := PARSE_JSON(\'{"a": 5}\'); '
            "RETURN j:a::INT; END") == 5

    def test_string_literal_json_path(self, engine):
        # the underlying transform: STRING-literal base for col:path
        assert self._v(
            engine, """SELECT '{"x": {"y": 7}}':x.y::INT AS r""") == 7

    # --- collisions / cursors / loops (behavior pins)
    def test_cursor_bind_resolved_at_open(self, engine, tbl):
        assert self._v(
            engine,
            "DECLARE lim INT DEFAULT 15; c CURSOR FOR SELECT "
            f"COUNT(*) AS n FROM {tbl}.sw_t WHERE v > :lim; "
            "n1 INT; n2 INT; BEGIN OPEN c; FETCH c INTO n1; CLOSE c; "
            "LET lim := 25; OPEN c; FETCH c INTO n2; "
            "RETURN n1 * 10 + n2; END") == 21

    def test_cursor_bare_column_not_substituted(self, engine, tbl):
        assert self._v(
            engine,
            "DECLARE v INT DEFAULT 999; c CURSOR FOR SELECT MAX(v) "
            f"AS m FROM {tbl}.sw_t; m INT; BEGIN OPEN c; "
            "FETCH c INTO m; RETURN m; END") == 30.0

    def test_reopen_resets_position(self, engine, tbl):
        assert self._v(
            engine,
            f"DECLARE c CURSOR FOR SELECT k FROM {tbl}.sw_t ORDER BY "
            "k; a INT; b INT; BEGIN OPEN c; FETCH c INTO a; OPEN c; "
            "FETCH c INTO b; RETURN a * 10 + b; END") == 11

    def test_fetch_after_close_refused(self, engine):
        with pytest.raises(ScriptingError, match="not OPEN"):
            engine.execute(
                "DECLARE c CURSOR FOR SELECT 1 AS a; x INT; BEGIN "
                "OPEN c; CLOSE c; FETCH c INTO x; RETURN x; END")

    def test_cursor_shared_with_nested_block(self, engine):
        assert self._v(
            engine,
            "DECLARE c CURSOR FOR SELECT 7 AS a; x INT; BEGIN "
            "BEGIN OPEN c; FETCH c INTO x; END; RETURN x; END") == 7

    def test_call_inside_for_loop(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE sw_double(x INT) RETURNS INT "
            "LANGUAGE SQL AS $$ BEGIN RETURN x * 2; END $$")
        assert self._v(
            engine,
            "DECLARE s INT DEFAULT 0; BEGIN FOR i IN 1 TO 3 DO "
            "CALL sw_double(:i); LET s := s + i; END FOR; "
            "RETURN s; END") == 6

    def test_call_exception_caught_per_iteration(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE sw_boom() RETURNS INT "
            "LANGUAGE SQL AS $$ DECLARE e EXCEPTION (-20001, 'boom'); "
            "BEGIN RAISE e; END $$")
        assert self._v(
            engine,
            "DECLARE n INT DEFAULT 0; BEGIN FOR i IN 1 TO 3 DO "
            "BEGIN CALL sw_boom(); EXCEPTION WHEN OTHER THEN "
            "LET n := n + 1; END; END FOR; RETURN n; END") == 3

    def test_callee_exception_caught_by_name(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE sw_boom() RETURNS INT "
            "LANGUAGE SQL AS $$ DECLARE e EXCEPTION (-20001, 'boom'); "
            "BEGIN RAISE e; END $$")
        assert self._v(
            engine,
            "DECLARE e EXCEPTION (-20001, 'boom'); BEGIN "
            "CALL sw_boom(); EXCEPTION WHEN e THEN RETURN 'caught'; "
            "END") == "caught"

    def test_resultset_reassignment_latest_wins(self, engine):
        assert self._v(
            engine,
            "DECLARE rs RESULTSET; BEGIN rs := (SELECT 1 AS a); "
            "rs := (SELECT 2 AS a); RETURN TABLE(rs); END") == 2

    def test_for_over_reassigned_resultset(self, engine, tbl):
        assert self._v(
            engine,
            "DECLARE rs RESULTSET; s INT DEFAULT 0; BEGIN "
            f"rs := (SELECT k FROM {tbl}.sw_t); "
            f"rs := (SELECT k FROM {tbl}.sw_t WHERE k > 1); "
            "FOR r IN rs DO LET s := s + r.k; END FOR; "
            "RETURN s; END") == 5

    def test_bare_raise_rethrows_to_outer(self, engine):
        assert self._v(
            engine,
            "BEGIN BEGIN LET x := 1/0; EXCEPTION WHEN "
            "EXPRESSION_ERROR THEN RAISE; END; RETURN 'no'; "
            "EXCEPTION WHEN EXPRESSION_ERROR THEN RETURN 'outer'; "
            "END") == "outer"

    def test_named_exception_skips_wrong_handler(self, engine):
        assert self._v(
            engine,
            "DECLARE e1 EXCEPTION (-20001, 'a'); e2 EXCEPTION "
            "(-20002, 'b'); BEGIN BEGIN RAISE e1; EXCEPTION WHEN e2 "
            "THEN RETURN 'wrong'; END; EXCEPTION WHEN e1 THEN "
            "RETURN 'right'; END") == "right"

    def test_handler_when_or_names(self, engine):
        assert self._v(
            engine,
            "DECLARE e1 EXCEPTION (-1, 'a'); e2 EXCEPTION (-2, 'b'); "
            "BEGIN RAISE e2; EXCEPTION WHEN e1 OR e2 THEN "
            "RETURN 'either'; END") == "either"

    def test_loop_var_restored_before_handler(self, engine):
        assert self._v(
            engine,
            "DECLARE e EXCEPTION (-3, 'x'); n INT DEFAULT 5; BEGIN "
            "FOR n IN 1 TO 3 DO IF (n = 2) THEN RAISE e; END IF; "
            "END FOR; RETURN 0; EXCEPTION WHEN e THEN RETURN n; "
            "END") == 5

    def test_nested_declare_shadow_persists(self, engine):
        # documented deviation: inner DECLARE of an outer name
        # overwrites (shared scope)
        assert self._v(
            engine,
            "DECLARE x INT DEFAULT 1; BEGIN BEGIN DECLARE x INT "
            "DEFAULT 2; BEGIN LET x := x + 1; END; END; "
            "RETURN x; END") == 3

    def test_limit_bind(self, engine, tbl):
        df = engine.execute(
            "DECLARE lim INT DEFAULT 2; BEGIN RETURN TABLE("
            f"SELECT k FROM {tbl}.sw_t ORDER BY k LIMIT :lim); END")
        assert [r.k for r in df.collect()] == [1, 2]

    def test_empty_subquery_assigns_null(self, engine, tbl):
        assert self._v(
            engine,
            f"BEGIN LET a := (SELECT k FROM {tbl}.sw_t WHERE k > 99); "
            "RETURN COALESCE(a, -1); END") == -1

    def test_scripting_error_not_masked_by_handler(self, engine):
        # interpreter errors (not SQL errors) must not be swallowed
        # by STATEMENT_ERROR handlers
        with pytest.raises(ScriptingError, match="not a DECLAREd"):
            engine.execute(
                "BEGIN FETCH nosuch INTO x; EXCEPTION WHEN "
                "STATEMENT_ERROR THEN RETURN 'caught'; END")

    def test_dml_with_binds(self, engine, tbl):
        assert self._v(
            engine,
            "DECLARE thr DOUBLE DEFAULT 15.0; BEGIN "
            f"CREATE OR REPLACE TABLE {tbl}.sw_m1 AS SELECT * FROM "
            f"{tbl}.sw_t; MERGE INTO {tbl}.sw_m1 t USING "
            "(SELECT 2 AS k) s ON t.k = s.k WHEN MATCHED AND "
            "t.v > :thr THEN UPDATE SET v = v + :thr; "
            f"RETURN (SELECT v FROM {tbl}.sw_m1 WHERE k = 2); "
            "END") == 35.0


class TestReviewRegressionsR7:
    """Round-7 code-review findings, pinned."""

    def test_sql_statement_in_declare_section_refused(self, engine):
        # would previously bind vars['insert']=None and silently DROP
        # the statement (same misparse class as the r6 judge finding)
        with pytest.raises(ScriptingError, match="not a declaration"):
            engine.execute(
                "DECLARE x INT DEFAULT 1; INSERT INTO nowhere VALUES "
                "(1); BEGIN RETURN x; END")

    def test_nvarchar_nested_declaration(self, engine):
        r = engine.execute(
            "BEGIN DECLARE x NVARCHAR DEFAULT 'a'; "
            "BEGIN RETURN x || 'b'; END; END")
        assert r.collect()[0][0] == "ab"

    def test_precision_cast_overload_resolution(self, engine):
        from dbt_icebreaker_spark.procedures import _arg_family

        assert _arg_family("x::DECIMAL(10,2)") == "num"
        assert _arg_family("CAST(x AS VARCHAR(20))") == "str"
        assert _arg_family("TRY_CAST(x AS NUMBER(38,0))") == "num"
        assert _arg_family("f(x)") is None

    def test_negative_literal_call_arg_no_comment(self, engine):
        # `3 - -1` stripped-rendered as `3--1` is a line comment
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7rv_id(x INT) RETURNS INT "
            "LANGUAGE SQL AS $$ BEGIN RETURN x; END $$")
        assert engine.execute(
            "CALL r7rv_id(3 - -1)").collect()[0][0] == 4
        engine.execute("DROP PROCEDURE IF EXISTS r7rv_id(INT)")

    def test_json_path_segment_colliding_with_variable(self, engine):
        r = engine.execute(
            'BEGIN LET a := 7; LET j := PARSE_JSON(\'{"a": 5}\'); '
            "RETURN j:a::INT; END")
        assert r.collect()[0][0] == 5

    def test_bind_still_substitutes_in_expression(self, engine):
        r = engine.execute("BEGIN LET a := 7; RETURN :a + 1; END")
        assert r.collect()[0][0] == 8

    def test_case_expr_in_unquoted_proc_body_splits(self, engine):
        from dbt_icebreaker_spark.procedures import (
            split_unquoted_procedure,
        )

        head, trailing = split_unquoted_procedure(
            "CREATE PROCEDURE p() RETURNS INT AS BEGIN LET x := CASE "
            "WHEN 1=1 THEN 2 ELSE 3 END; RETURN x; END; SELECT 9")
        assert trailing == "SELECT 9"
        assert head.rstrip().endswith("END;")

    def test_resultset_views_bounded_per_name(self, engine, spark):
        engine.execute(
            "DECLARE rs RESULTSET; BEGIN rs := (SELECT 1 AS a); "
            "LET n := (SELECT COUNT(*) FROM TABLE(rs)); "
            "rs := (SELECT 2 AS a UNION ALL SELECT 3); "
            "LET m := (SELECT COUNT(*) FROM TABLE(rs)); "
            "RETURN m * 10 + n; END")
        views = [v.name for v in spark.catalog.listTables()
                 if v.name.startswith("__rs_")]
        assert views == ["__rs_rs"]


class TestOverloadSignatureIdentityR7:
    """Round-7: overload identity is the per-position type-family
    signature — same-arity different-type overloads coexist, register
    conflicts/replaces only on an identical signature, and DROP
    PROCEDURE disambiguates same-arity overloads by type."""

    def test_same_arity_overloads_coexist_and_drop_by_type(self, engine):
        engine.execute(
            "CREATE PROCEDURE r7sg(a INT) RETURNS INT LANGUAGE SQL "
            "AS $$ BEGIN RETURN 1; END $$")
        engine.execute(
            "CREATE PROCEDURE r7sg(a VARCHAR) RETURNS INT LANGUAGE "
            "SQL AS $$ BEGIN RETURN 2; END $$")
        try:
            assert engine.execute("CALL r7sg(5)").collect()[0][0] == 1
            assert engine.execute("CALL r7sg('x')").collect()[0][0] == 2
            engine.execute("DROP PROCEDURE r7sg(VARCHAR)")
            assert engine.execute("CALL r7sg(5)").collect()[0][0] == 1
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7sg(INT)")
            engine.execute("DROP PROCEDURE IF EXISTS r7sg(VARCHAR)")

    def test_same_family_signature_conflicts(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE PROCEDURE r7sg2(a INT) RETURNS INT LANGUAGE SQL "
            "AS $$ BEGIN RETURN 1; END $$")
        try:
            with pytest.raises(ProcedureError, match="already exists"):
                engine.execute(
                    "CREATE PROCEDURE r7sg2(b BIGINT) RETURNS INT "
                    "LANGUAGE SQL AS $$ BEGIN RETURN 3; END $$")
            # identical signature + OR REPLACE replaces
            engine.execute(
                "CREATE OR REPLACE PROCEDURE r7sg2(a INT) RETURNS INT "
                "LANGUAGE SQL AS $$ BEGIN RETURN 9; END $$")
            assert engine.execute("CALL r7sg2(0)").collect()[0][0] == 9
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7sg2(INT)")


class TestReviewRegressionsR7b:
    """Second round-7 review batch, pinned."""

    def test_drop_mismatched_signature_refuses(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7dp(a VARCHAR) RETURNS INT "
            "LANGUAGE SQL AS $$ BEGIN RETURN 1; END $$")
        try:
            with pytest.raises(ProcedureError,
                               match="no overload with signature"):
                engine.execute("DROP PROCEDURE r7dp(NUMBER)")
            assert engine.execute("CALL r7dp('x')").collect()[0][0] == 1
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7dp(VARCHAR)")

    def test_unknown_type_overloads_coexist(self, engine):
        # OBJECT vs ARRAY have no family — identity falls back to the
        # type-name head, so they are DIFFERENT signatures
        engine.execute(
            "CREATE PROCEDURE r7uo(a OBJECT) RETURNS VARCHAR LANGUAGE "
            "SQL AS $$ BEGIN RETURN 'obj'; END $$")
        engine.execute(
            "CREATE PROCEDURE r7uo(a ARRAY) RETURNS VARCHAR LANGUAGE "
            "SQL AS $$ BEGIN RETURN 'arr'; END $$")
        try:
            engine.execute("DROP PROCEDURE r7uo(ARRAY)")
            engine.execute("DROP PROCEDURE r7uo(OBJECT)")
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7uo(OBJECT)")
            engine.execute("DROP PROCEDURE IF EXISTS r7uo(ARRAY)")

    def test_gzip_compress_deterministic(self, engine):
        r = engine.execute(
            "SELECT COMPRESS('abc', 'gzip') AS a, "
            "COMPRESS('abc', 'gzip') AS b").collect()[0]
        assert bytes(r.a) == bytes(r.b)

    def test_clone_named_column_not_mangled(self, engine, spark):
        # a column literally named `clone` in a CTAS with an AT-read
        # must not trip the CLONE-AT rewrite
        import datetime as dt

        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.r7cl_hist")
        engine.run_snapshot(
            "r7cl_hist", "SELECT 1 AS k, 'x' AS clone",
            unique_key="k", strategy="check", check_cols=["clone"],
            now=dt.datetime(2026, 1, 1))
        engine.execute(
            f"CREATE OR REPLACE TABLE {sch}.r7cl_out AS SELECT clone "
            f"FROM {sch}.r7cl_hist "
            "AT(TIMESTAMP => '2026-06-01'::TIMESTAMP)")
        assert spark.table(f"{sch}.r7cl_out").collect()[0].clone == "x"

    def test_transient_clone_at(self, engine, spark):
        import datetime as dt

        sch = engine.effective_schema
        spark.sql(f"DROP TABLE IF EXISTS {sch}.r7tr_hist")
        engine.run_snapshot(
            "r7tr_hist", "SELECT 1 AS k, 5.0 AS v",
            unique_key="k", strategy="check", check_cols=["v"],
            now=dt.datetime(2026, 1, 1))
        engine.execute(
            f"CREATE TRANSIENT TABLE {sch}.r7tr_out CLONE "
            f"{sch}.r7tr_hist AT(TIMESTAMP => '2026-06-01'::TIMESTAMP)")
        assert spark.table(f"{sch}.r7tr_out").count() == 1
        spark.sql(f"DROP TABLE IF EXISTS {sch}.r7tr_out")


class TestReviewRegressionsR7c:
    """Third round-7 review batch, pinned: Snowflake numeric aliasing
    (INT ≡ NUMBER(38,0)), callable unknown-head overloads, advisor/
    streaming capability parity."""

    def test_drop_number_matches_int(self, engine):
        # Snowflake: INT is an alias of NUMBER(38,0) — DROP p(NUMBER)
        # drops p(INT)
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7al(a INT) RETURNS INT "
            "LANGUAGE SQL AS $$ BEGIN RETURN 1; END $$")
        engine.execute("DROP PROCEDURE r7al(NUMBER)")
        from dbt_icebreaker_spark.procedures import ProcedureError

        with pytest.raises(ProcedureError, match="no such procedure"):
            engine.execute("CALL r7al(1)")

    def test_int_and_number_signatures_conflict(self, engine):
        from dbt_icebreaker_spark.procedures import ProcedureError

        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7al2(a INT) RETURNS INT "
            "LANGUAGE SQL AS $$ BEGIN RETURN 1; END $$")
        try:
            with pytest.raises(ProcedureError, match="already exists"):
                engine.execute(
                    "CREATE PROCEDURE r7al2(a NUMBER) RETURNS INT "
                    "LANGUAGE SQL AS $$ BEGIN RETURN 2; END $$")
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7al2(INT)")

    def test_float_is_distinct_from_number(self, engine):
        # FLOAT is NOT a NUMBER alias — both register, calls resolve
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7fl(a INT) RETURNS VARCHAR "
            "LANGUAGE SQL AS $$ BEGIN RETURN 'num'; END $$")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7fl(a FLOAT) RETURNS "
            "VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'float'; END $$")
        try:
            assert engine.execute(
                "CALL r7fl(5)").collect()[0][0] == "num"
            assert engine.execute(
                "CALL r7fl(CAST(2.5 AS FLOAT))").collect()[0][0] == "float"
            assert engine.execute(
                "CALL r7fl(1e3)").collect()[0][0] == "float"
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7fl(INT)")
            engine.execute("DROP PROCEDURE IF EXISTS r7fl(FLOAT)")

    def test_unknown_head_overloads_callable_via_cast(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7oh(a OBJECT) RETURNS "
            "VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'obj'; END $$")
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r7oh(a VARCHAR) RETURNS "
            "VARCHAR LANGUAGE SQL AS $$ BEGIN RETURN 'str'; END $$")
        try:
            assert engine.execute(
                "CALL r7oh('{}'::OBJECT)").collect()[0][0] == "obj"
            assert engine.execute(
                "CALL r7oh('plain')").collect()[0][0] == "str"
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r7oh(OBJECT)")
            engine.execute("DROP PROCEDURE IF EXISTS r7oh(VARCHAR)")

    def test_advisor_accepts_compress(self, spark):
        from dbt_icebreaker_spark.observability.advisor import Advisor

        adv = Advisor(spark)
        ok, _ = adv.transpiler.can_transpile(
            "SELECT COMPRESS(c, 'zlib') FROM t")
        assert ok


class TestRepeatR8:
    """Round-8: REPEAT … UNTIL (cond) END REPEAT — Snowflake's
    post-test loop. The r7 ADVICE found END REPEAT mis-split unquoted
    procedure bodies (_scan_block_end popped the enclosing BEGIN);
    r8 adds the interpreter construct itself (scripting.py
    _stmt_repeat)."""

    def test_repeat_basic(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; "
            "REPEAT LET i := i + 1; UNTIL (i >= 3) END REPEAT; "
            "RETURN i; END"
        )
        assert r.collect()[0].value == 3

    def test_repeat_body_runs_at_least_once(self, engine):
        # post-test semantics: condition already true → body still
        # runs exactly once
        r = engine.execute(
            "BEGIN LET i := 99; "
            "REPEAT LET i := i + 1; UNTIL (i >= 0) END REPEAT; "
            "RETURN i; END"
        )
        assert r.collect()[0].value == 100

    def test_repeat_break(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; LET s := 0; "
            "REPEAT LET i := i + 1; LET s := s + i; "
            "IF (s > 5) THEN BREAK; END IF; "
            "UNTIL (i >= 100) END REPEAT; "
            "RETURN s; END"
        )
        assert r.collect()[0].value == 6  # 1+2+3

    def test_repeat_continue_recycles_to_condition(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; LET odd_sum := 0; "
            "REPEAT LET i := i + 1; "
            "IF (i % 2 = 0) THEN CONTINUE; END IF; "
            "LET odd_sum := odd_sum + i; "
            "UNTIL (i >= 6) END REPEAT; "
            "RETURN odd_sum; END"
        )
        assert r.collect()[0].value == 9  # 1+3+5

    def test_repeat_nested(self, engine):
        r = engine.execute(
            "BEGIN LET total := 0; LET a := 0; "
            "REPEAT LET a := a + 1; LET b := 0; "
            "REPEAT LET b := b + 1; LET total := total + 1; "
            "UNTIL (b >= 2) END REPEAT; "
            "UNTIL (a >= 3) END REPEAT; "
            "RETURN total; END"
        )
        assert r.collect()[0].value == 6

    def test_repeat_unparenthesized_condition(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; "
            "REPEAT LET i := i + 1; UNTIL i >= 4 END REPEAT; "
            "RETURN i; END"
        )
        assert r.collect()[0].value == 4

    def test_repeat_in_unquoted_procedure_body(self, engine):
        # the r7 ADVICE scenario: END REPEAT inside an UNQUOTED
        # procedure body must not pop the enclosing BEGIN (mis-split
        # executed the UNTIL tail as top-level SQL)
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r8_rpt() RETURNS NUMBER "
            "LANGUAGE SQL AS BEGIN LET i := 0; "
            "REPEAT LET i := i + 1; UNTIL (i >= 3) END REPEAT; "
            "RETURN i; END;")
        try:
            assert engine.execute("CALL r8_rpt()").collect()[0][0] == 3
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r8_rpt()")

    def test_repeat_string_function_untouched(self, engine):
        r = engine.execute("SELECT REPEAT('ab', 3) AS r")
        assert r.collect()[0].r == "ababab"

    def test_return_char_is_unicode_codepoint(self, engine):
        # r8 (r7 ADVICE): RETURN CHAR(959) — RETURN is a statement
        # head, so CHAR( is the Unicode call, not a type
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r8_chr() RETURNS VARCHAR "
            "LANGUAGE SQL AS $$ BEGIN RETURN CHAR(959); END $$")
        try:
            assert engine.execute(
                "CALL r8_chr()").collect()[0][0] == "ο"
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r8_chr()")


class TestLoopAndCaseR8:
    """Round-8: bare LOOP … END LOOP (previously 'unsupported
    downstream'), the FOR/WHILE … LOOP body forms, and the CASE
    STATEMENT (simple + searched) — all executed through the engine."""

    def test_loop_with_break(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; LOOP LET i := i + 1; "
            "IF (i >= 4) THEN BREAK; END IF; END LOOP; RETURN i; END")
        assert r.collect()[0].value == 4

    def test_loop_continue_reenters(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; LET s := 0; LOOP LET i := i + 1; "
            "IF (i > 6) THEN BREAK; END IF; "
            "IF (i % 2 = 0) THEN CONTINUE; END IF; "
            "LET s := s + i; END LOOP; RETURN s; END")
        assert r.collect()[0].value == 9  # 1+3+5

    def test_while_loop_body_form(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; WHILE (i < 3) LOOP LET i := i + 1; "
            "END LOOP; RETURN i; END")
        assert r.collect()[0].value == 3

    def test_for_loop_body_form(self, engine):
        r = engine.execute(
            "BEGIN LET s := 0; FOR i IN 1 TO 4 LOOP s := s + i; "
            "END LOOP; RETURN s; END")
        assert r.collect()[0].value == 10

    def test_for_resultset_loop_body_form(self, engine):
        r = engine.execute(
            "BEGIN LET n := 0; FOR r IN (SELECT 1 AS x UNION ALL "
            "SELECT 2) LOOP LET n := n + r.x; END LOOP; RETURN n; END")
        assert r.collect()[0].value == 3

    def test_case_statement_simple_form(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 2; BEGIN CASE (v) "
            "WHEN 1 THEN RETURN 'one'; WHEN 2 THEN RETURN 'two'; "
            "ELSE RETURN 'other'; END CASE; END")
        assert r.collect()[0].value == "two"

    def test_case_statement_searched_form(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 7; BEGIN CASE "
            "WHEN v > 5 THEN RETURN 'big'; "
            "WHEN v > 2 THEN RETURN 'mid'; "
            "ELSE RETURN 'small'; END CASE; END")
        assert r.collect()[0].value == "big"

    def test_case_statement_no_match_is_noop(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 99; BEGIN CASE (v) "
            "WHEN 1 THEN RETURN 'one'; END CASE; "
            "RETURN 'fell through'; END")
        assert r.collect()[0].value == "fell through"

    def test_case_statement_null_operand_takes_else(self, engine):
        r = engine.execute(
            "DECLARE v INT; BEGIN CASE (v) WHEN 1 THEN RETURN 'one'; "
            "ELSE RETURN 'else'; END CASE; END")
        assert r.collect()[0].value == "else"

    def test_case_statement_multi_statement_branch(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 1; BEGIN LET s := 0; CASE (v) "
            "WHEN 1 THEN LET s := s + 10; LET s := s + 5; "
            "WHEN 2 THEN LET s := 99; END CASE; RETURN s; END")
        assert r.collect()[0].value == 15

    def test_case_statement_inside_for(self, engine):
        r = engine.execute(
            "BEGIN LET s := 0; FOR i IN 1 TO 3 DO CASE (i) "
            "WHEN 1 THEN s := s + 100; WHEN 2 THEN s := s + 20; "
            "ELSE s := s + 3; END CASE; END FOR; RETURN s; END")
        assert r.collect()[0].value == 123

    def test_case_statement_skipped_in_untaken_branch(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 1; BEGIN IF (v = 2) THEN "
            "CASE (v) WHEN 1 THEN RETURN 'x'; END CASE; END IF; "
            "RETURN 'skipped'; END")
        assert r.collect()[0].value == "skipped"

    def test_case_expression_untouched(self, engine):
        r = engine.execute(
            "SELECT CASE WHEN 1 > 0 THEN 'y' ELSE 'n' END AS c")
        assert r.collect()[0].c == "y"

    def test_loop_in_unquoted_procedure(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r8_lp() RETURNS NUMBER "
            "LANGUAGE SQL AS BEGIN LET i := 0; LOOP LET i := i + 1; "
            "IF (i >= 5) THEN BREAK; END IF; END LOOP; RETURN i; END;")
        try:
            assert engine.execute("CALL r8_lp()").collect()[0][0] == 5
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r8_lp()")

    def test_case_in_unquoted_procedure(self, engine):
        engine.execute(
            "CREATE OR REPLACE PROCEDURE r8_cs(v INT) RETURNS VARCHAR "
            "LANGUAGE SQL AS BEGIN CASE (v) WHEN 1 THEN RETURN 'one'; "
            "ELSE RETURN 'many'; END CASE; END;")
        try:
            assert engine.execute(
                "CALL r8_cs(1)").collect()[0][0] == "one"
            assert engine.execute(
                "CALL r8_cs(7)").collect()[0][0] == "many"
        finally:
            engine.execute("DROP PROCEDURE IF EXISTS r8_cs(INT)")


class TestLazySelectErrorsR8:
    """Round-8 probe finding: a bare SELECT inside a block returned a
    LAZY DataFrame, so its errors never surfaced and the EXCEPTION
    handler silently never fired (a BREAK-on-error loop spun forever).
    Plain queries now materialize through the noop sink — Snowflake
    materializes every procedural statement."""

    def test_failing_select_triggers_handler(self, engine):
        r = engine.execute(
            "BEGIN SELECT 1/0; RETURN 'no error'; "
            "EXCEPTION WHEN OTHER THEN RETURN 'caught'; END")
        assert r.collect()[0].value == "caught"

    def test_handler_break_exits_loop(self, engine):
        r = engine.execute(
            "BEGIN LET i := 0; LOOP LET i := i + 1; "
            "BEGIN SELECT 1/0; EXCEPTION WHEN OTHER THEN BREAK; END; "
            "END LOOP; RETURN i; END")
        assert r.collect()[0].value == 1

    def test_sqlerrm_from_failing_select(self, engine):
        r = engine.execute(
            "BEGIN SELECT 1/0; "
            "EXCEPTION WHEN OTHER THEN RETURN sqlerrm; END")
        assert "DIVIDE" in r.collect()[0].value.upper() or \
            "zero" in r.collect()[0].value.lower()

    def test_successful_select_still_passes(self, engine):
        r = engine.execute(
            "BEGIN SELECT 1 AS ok; RETURN 'done'; END")
        assert r.collect()[0].value == "done"


class TestCaseLoopReviewR8:
    """Round-8 review lock-ins on the LOOP/CASE additions."""

    def test_begin_block_inside_skipped_case_branch(self, engine):
        # the skip-scanner must close the nested block's bare END
        # against the BLOCK, not the still-open CASE (stack, not
        # counters)
        r = engine.execute(
            "BEGIN IF (false) THEN CASE (1) WHEN 1 THEN "
            "BEGIN LET x := 1; END; END CASE; END IF; RETURN 1; END")
        assert r.collect()[0].value == 1

    def test_execute_immediate_error_reaches_handler(self, engine):
        # materialization gates on the RETURNED object — EXECUTE
        # IMMEDIATE '<select>' returns a lazy frame too
        r = engine.execute(
            "BEGIN EXECUTE IMMEDIATE 'SELECT 1/0'; RETURN 'no error'; "
            "EXCEPTION WHEN OTHER THEN RETURN 'caught'; END")
        assert r.collect()[0].value == "caught"

    def test_case_statement_bare_end_terminator(self, engine):
        # Snowflake's CASE statement terminator is END [CASE]
        r = engine.execute(
            "DECLARE v INT DEFAULT 1; BEGIN LET x := 0; CASE (v) "
            "WHEN 1 THEN LET x := 7; END; RETURN x; END")
        assert r.collect()[0].value == 7

    def test_case_operand_evaluated_once(self, engine):
        # a volatile operand must pick EXACTLY one branch per
        # execution (per-arm re-evaluation could match zero or many)
        r = engine.execute(
            "BEGIN LET hits := 0; FOR i IN 1 TO 10 DO "
            "CASE (UNIFORM(1, 3, RANDOM())) "
            "WHEN 1 THEN hits := hits + 1; "
            "WHEN 2 THEN hits := hits + 1; "
            "WHEN 3 THEN hits := hits + 1; END CASE; END FOR; "
            "RETURN hits; END")
        assert r.collect()[0].value == 10

    def test_begin_block_inside_run_case_branch(self, engine):
        r = engine.execute(
            "BEGIN CASE (1) WHEN 1 THEN BEGIN LET x := 5; END; "
            "END CASE; RETURN 'ok'; END")
        assert r.collect()[0].value == "ok"

    def test_case_string_and_computed_operands(self, engine):
        r = engine.execute(
            "DECLARE s STRING DEFAULT 'b'; BEGIN CASE (s) "
            "WHEN 'a' THEN RETURN 1; WHEN 'b' THEN RETURN 2; "
            "END CASE; END")
        assert r.collect()[0].value == 2
        r = engine.execute(
            "DECLARE v INT DEFAULT 3; BEGIN CASE (v * 2) "
            "WHEN 6 THEN RETURN 'six'; ELSE RETURN 'no'; END CASE; END")
        assert r.collect()[0].value == "six"


class TestBareOperandCaseR9:
    """Round-9 (r8 judge finding #6): the simple CASE statement
    accepts a BARE operand — ``CASE v WHEN …`` — not just the
    documented parenthesized ``CASE (v) WHEN …`` form."""

    def test_bare_variable_operand(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 2; BEGIN CASE v "
            "WHEN 1 THEN RETURN 'one'; WHEN 2 THEN RETURN 'two'; "
            "ELSE RETURN 'other'; END CASE; END")
        assert r.collect()[0].value == "two"

    def test_bare_expression_operand(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 3; BEGIN CASE v + 1 "
            "WHEN 4 THEN RETURN 'four'; ELSE RETURN 'no'; "
            "END CASE; END")
        assert r.collect()[0].value == "four"

    def test_operand_containing_case_expression(self, engine):
        # the scanner must skip the nested CASE expression's own WHEN
        r = engine.execute(
            "DECLARE v INT DEFAULT 10; BEGIN "
            "CASE CASE WHEN v > 5 THEN 'big' ELSE 'small' END "
            "WHEN 'big' THEN RETURN 'BIG'; ELSE RETURN 'SMALL'; "
            "END CASE; END")
        assert r.collect()[0].value == "BIG"

    def test_bare_null_operand_takes_else(self, engine):
        r = engine.execute(
            "BEGIN CASE NULL WHEN 1 THEN RETURN 'one'; "
            "ELSE RETURN 'else'; END CASE; END")
        assert r.collect()[0].value == "else"

    def test_missing_when_names_both_forms(self, engine):
        import pytest as _pytest

        with _pytest.raises(Exception, match="simple form"):
            engine.execute("BEGIN CASE 1 + 2; END")

    def test_searched_form_unchanged(self, engine):
        r = engine.execute(
            "DECLARE v INT DEFAULT 7; BEGIN CASE WHEN v > 5 THEN "
            "RETURN 'gt'; ELSE RETURN 'le'; END CASE; END")
        assert r.collect()[0].value == "gt"


class TestMidScriptBlocksR9:
    """Round-9 sweep finding: an anonymous block AFTER other
    statements in one execute() call used to split at its internal
    semicolons (its RETURN then hit the parser bare). The unit
    splitter keeps each [DECLARE ...] BEGIN ... END span together."""

    def test_block_after_statement(self, spark, engine):
        r = engine.execute("""
            CREATE OR REPLACE TABLE scripting_test.msb1 AS SELECT 17 AS x;
            BEGIN
              UPDATE scripting_test.msb1 SET x = x + 1;
              RETURN (SELECT x FROM scripting_test.msb1);
            END
        """)
        assert r.collect()[0][0] == 18
        spark.sql("DROP TABLE scripting_test.msb1")

    def test_statements_after_block_run(self, spark, engine):
        r = engine.execute("""
            BEGIN
              CREATE OR REPLACE TABLE scripting_test.msb2 AS SELECT 1 AS x;
            END;
            SELECT x + 41 AS v FROM scripting_test.msb2
        """)
        assert r.collect()[0].v == 42
        spark.sql("DROP TABLE scripting_test.msb2")

    def test_two_blocks_one_call(self, engine):
        r = engine.execute("""
            BEGIN
              LET a INT := 1;
              RETURN a;
            END;
            DECLARE b INT DEFAULT 5;
            BEGIN
              RETURN b * 2;
            END
        """)
        assert r.collect()[0][0] == 10

    def test_declare_block_after_statement(self, engine):
        r = engine.execute("""
            SELECT 1;
            DECLARE v INT DEFAULT 7;
            BEGIN
              RETURN v;
            END
        """)
        assert r.collect()[0][0] == 7

    def test_begin_transaction_still_noop(self, engine):
        r = engine.execute("BEGIN TRANSACTION; SELECT 3 AS v; COMMIT")
        # last statement result is the COMMIT noop status
        assert r.collect()[0][0] == "commit"

    def test_drop_undrop_inside_block(self, spark, engine):
        r = engine.execute("""
            CREATE OR REPLACE TABLE scripting_test.msb3 AS SELECT 9 AS x;
            BEGIN
              DROP TABLE scripting_test.msb3;
              UNDROP TABLE scripting_test.msb3;
              RETURN (SELECT x FROM scripting_test.msb3);
            END
        """)
        assert r.collect()[0][0] == 9
        spark.sql("DROP TABLE scripting_test.msb3")
