"""Round-7b probe sweep: materialization / snapshot / incremental /
session-statement shapes executed through the public engine surface.
Run:  python scripts/probe_sweep_r7b.py
Findings get fixed and locked into tests (the r5/r6/r7a sweeps each
found 2-12 real seams)."""

import datetime
import shutil
import sys

sys.path.insert(0, "/root/repo")

wh = "/tmp/r7b_sweep_wh"
shutil.rmtree(wh, ignore_errors=True)
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from dbt_icebreaker_spark.runner import IcebreakerEngine  # noqa: E402

eng = IcebreakerEngine(spark, schema="r7b")

ok = fail = 0
failures = []


def check(name, fn, expect=None, err=None):
    global ok, fail
    try:
        got = fn()
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


def scalar(sql):
    r = eng.execute(sql).collect()
    return r[0][0] if r else None


def rows(table):
    return {tuple(r) for r in spark.table(table).collect()}


# ---- snapshot edges
def snap_hard_delete():
    eng.run_snapshot("sn1", "SELECT k, v FROM VALUES (1,'a'),(2,'b') t(k,v)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 1, 1))
    eng.run_snapshot("sn1", "SELECT k, v FROM VALUES (1,'a') t(k,v)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 2, 1),
                     invalidate_hard_deletes=True)
    cur = spark.sql("SELECT k FROM r7b.sn1 WHERE dbt_valid_to IS NULL").collect()
    return sorted(r.k for r in cur)

check("snapshot-hard-delete", snap_hard_delete, [1])

def snap_readd():
    # deleted key re-appears: a NEW current row must open
    eng.run_snapshot("sn1", "SELECT k, v FROM VALUES (1,'a'),(2,'B2') t(k,v)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 3, 1),
                     invalidate_hard_deletes=True)
    cur = spark.sql("SELECT k, v FROM r7b.sn1 WHERE dbt_valid_to IS NULL").collect()
    return sorted((r.k, r.v) for r in cur)

check("snapshot-readd-after-delete", snap_readd, [(1, "a"), (2, "B2")])

def snap_check_subset():
    # only v is checked: w changes alone must NOT open a new version
    eng.run_snapshot("sn2", "SELECT k, v, w FROM VALUES (1,'a','x') t(k,v,w)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 1, 1))
    eng.run_snapshot("sn2", "SELECT k, v, w FROM VALUES (1,'a','CHANGED') t(k,v,w)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 2, 1))
    return spark.table("r7b.sn2").count()

check("snapshot-check-subset-no-churn", snap_check_subset, 1)

def snap_null_transition():
    # NULL -> value and value -> NULL must both version
    eng.run_snapshot("sn3", "SELECT k, v FROM VALUES (1, CAST(NULL AS STRING)),(2,'b') t(k,v)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 1, 1))
    eng.run_snapshot("sn3", "SELECT k, v FROM VALUES (1, 'now-set'),(2, CAST(NULL AS STRING)) t(k,v)",
                     unique_key="k", strategy="check", check_cols=["v"],
                     now=datetime.datetime(2026, 2, 1))
    cur = spark.sql("SELECT k, v FROM r7b.sn3 WHERE dbt_valid_to IS NULL").collect()
    return (spark.table("r7b.sn3").count(), sorted((r.k, r.v) for r in cur))

check("snapshot-null-transitions", snap_null_transition,
      (4, [(1, "now-set"), (2, None)]))

# ---- incremental edges
def inc_append_dedup():
    eng.run_model("inc1", "SELECT k, v FROM VALUES (1,'a'),(2,'b') t(k,v)",
                  "incremental", unique_key="k", incremental_strategy="merge")
    eng.run_model("inc1", "SELECT k, v FROM VALUES (2,'B'),(3,'c') t(k,v)",
                  "incremental", unique_key="k", incremental_strategy="merge")
    return rows("r7b.inc1")

check("incremental-merge-upsert", inc_append_dedup,
      {(1, "a"), (2, "B"), (3, "c")})

def inc_delete_insert():
    eng.run_model("inc2", "SELECT k, v FROM VALUES (1,'a'),(2,'b') t(k,v)",
                  "incremental", unique_key="k",
                  incremental_strategy="delete+insert")
    eng.run_model("inc2", "SELECT k, v FROM VALUES (2,'B2'),(2,'B3') t(k,v)",
                  "incremental", unique_key="k",
                  incremental_strategy="delete+insert")
    return sorted(rows("r7b.inc2"))

check("incremental-delete-insert-dups-kept", inc_delete_insert,
      [(1, "a"), (2, "B2"), (2, "B3")])

def inc_null_key_merge():
    # NULL unique_key rows: merge must not pair them
    eng.run_model("inc3", "SELECT k, v FROM VALUES (1,'a'),(CAST(NULL AS INT),'n1') t(k,v)",
                  "incremental", unique_key="k", incremental_strategy="merge")
    eng.run_model("inc3", "SELECT k, v FROM VALUES (CAST(NULL AS INT),'n2') t(k,v)",
                  "incremental", unique_key="k", incremental_strategy="merge")
    return sorted(rows("r7b.inc3"), key=lambda x: (x[0] is None, x))

check("incremental-merge-null-keys", inc_null_key_merge,
      sorted({(1, "a"), (None, "n1"), (None, "n2")},
             key=lambda x: (x[0] is None, x)))

def inc_schema_add_col():
    eng.run_model("inc4", "SELECT 1 AS k, 'a' AS v", "incremental",
                  unique_key="k", incremental_strategy="merge")
    eng.run_model("inc4", "SELECT 2 AS k, 'b' AS v, 9 AS extra",
                  "incremental", unique_key="k", incremental_strategy="merge",
                  on_schema_change="append_new_columns")
    cols = [c.lower() for c in spark.table("r7b.inc4").columns]
    return ("extra" in cols, spark.table("r7b.inc4").count())

check("incremental-schema-evolve", inc_schema_add_col, (True, 2))

# ---- session vars / SHOW / DESCRIBE
check("set-and-use-var", lambda: (
    eng.execute("SET lim = 2"),
    scalar("SELECT $lim + 1"))[1], 3)
check("var-in-where", lambda: (
    eng.execute("SET thr = 10"),
    eng.execute("CREATE OR REPLACE TABLE r7b.sv AS SELECT * FROM VALUES (5),(15) t(x)"),
    scalar("SELECT COUNT(*) FROM r7b.sv WHERE x > $thr"))[2], 1)
check("unset-var-errors", lambda: scalar("SELECT $never_set"),
      err="is not set")
check("show-procedures-runs", lambda: eng.execute("SHOW PROCEDURES").count() >= 0, True)
check("describe-table", lambda: eng.execute("DESCRIBE TABLE r7b.sv").count() > 0, True)

# ---- transactions / grants
check("begin-commit-noop", lambda: scalar("BEGIN TRANSACTION") is not None, True)
check("grant-noop", lambda: scalar("GRANT SELECT ON r7b.sv TO ROLE analyst") is not None, True)

# ---- data tests
def dt_not_null():
    from dbt_icebreaker_spark.materializations.data_tests import (
        run_data_tests,
    )
    eng.execute("CREATE OR REPLACE TABLE r7b.dt AS SELECT * FROM VALUES (1),(NULL) t(x)")
    res = run_data_tests(
        spark, [{"test": "not_null", "table": "r7b.dt", "column": "x"}])
    return res[0]["status"]

check("data-test-not-null-fails", dt_not_null, "fail")

print(f"\n{ok} ok, {fail} FAIL")
for name, msg in failures:
    print(f"  FAIL {name}: {msg}")
