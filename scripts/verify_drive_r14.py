"""End-to-end /verify drive (skill flows 1-5) + full-corpus oracle
check of every declared query at sf0.01 against DuckDB (rows + sorted
content hash) — run after each substantive r14 change."""
import datetime
import hashlib
import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dbt_icebreaker_spark import IcebreakerEngine
from dbt_icebreaker_spark.session import get_spark
from dbt_icebreaker_spark.sources import register_dir

SF = "/root/testdata/sf0.01"
ONLY = sys.argv[1:]  # optional name filters

spark = get_spark(app_name="verify_r14")

# 1. flagship entry
entry = importlib.import_module("__spark_entry__")
n = entry.entry(spark).count()
assert n >= 1, "entry() returned no rows"
print(f"flow1 entry ok ({n} rows)")

# 2. corpus queries vs DuckDB oracles (full corpus, rows + hash)
qs, oracles = entry.queries(), entry.oracle_sql()
duck = duckdb.connect()
for t in ("region nation customer supplier part orders "
          "lineitem events documents embeddings").split():
    duck.execute(f"CREATE OR REPLACE VIEW {t} AS "
                 f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return str(v)

def table_hash(rows):
    lines = sorted("|".join(canon(c) for c in r) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()

names = [nm for nm in qs if nm in oracles]
if ONLY:
    names = [nm for nm in names if any(f in nm for f in ONLY)]
fails = []
for nm in names:
    try:
        srows = [tuple(r) for r in qs[nm](spark, SF).collect()]
        drows = duck.execute(oracles[nm]).fetchall()
        ok = len(srows) == len(drows) and table_hash(srows) == table_hash(drows)
        if not ok:
            fails.append((nm, len(srows), len(drows)))
            print(f"  ORACLE MISMATCH {nm}: spark={len(srows)} duck={len(drows)}")
    except Exception as e:
        fails.append((nm, "err", str(e)[:120]))
        print(f"  ERROR {nm}: {str(e)[:160]}")
print(f"flow2 oracles: {len(names) - len(fails)}/{len(names)} ok")

# 3. incremental merge across two overlapping batches
register_dir(spark, "/root/testdata/sf0.001")
eng = IcebreakerEngine(spark, schema="default")
eng.run_model(
    "vfy_m1",
    "SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey <= 100",
    "incremental", unique_key="k", incremental_strategy="merge")
eng.run_model(
    "vfy_m1",
    "SELECT o_orderkey AS k, o_totalprice * 2 AS v FROM orders "
    "WHERE o_orderkey > 50 AND o_orderkey <= 150",
    "incremental", unique_key="k", incremental_strategy="merge")
got = spark.table("default.vfy_m1").count()
want = spark.sql(
    "SELECT COUNT(DISTINCT o_orderkey) FROM orders WHERE o_orderkey <= 150"
).collect()[0][0]
assert got == want, f"merge rows {got} != distinct keys {want}"
print(f"flow3 incremental merge ok ({got} rows)")

# 4. snapshot twice with changed values
eng.run_snapshot(
    "vfy_s1", "SELECT o_orderkey AS k, o_orderstatus AS v FROM orders "
    "WHERE o_orderkey <= 20",
    unique_key="k", strategy="check", check_cols=["v"],
    now=datetime.datetime(2026, 1, 1))
eng.run_snapshot(
    "vfy_s1", "SELECT o_orderkey AS k, 'Z' AS v FROM orders "
    "WHERE o_orderkey <= 20",
    unique_key="k", strategy="check", check_cols=["v"],
    now=datetime.datetime(2026, 1, 2))
snap = spark.table("default.vfy_s1")
closed = snap.filter("dbt_valid_to IS NOT NULL").count()
current = snap.filter("dbt_valid_to IS NULL").count()
assert closed > 0 and current > 0, f"snapshot split wrong: {closed}/{current}"
print(f"flow4 snapshot ok (closed={closed} current={current})")

# 5. error path: blacklisted function refuses
from dbt_icebreaker_spark.transpiler.core import Transpiler, UnsupportedFunctionError
try:
    Transpiler().to_spark("SELECT SNOWFLAKE.CORTEX.COMPLETE('m', 'p')")
    raise AssertionError("blacklisted fn did not raise")
except UnsupportedFunctionError:
    print("flow5 error path ok")
ok2, msg = Transpiler().can_transpile("SELECT SNOWFLAKE.CORTEX.COMPLETE('m','p')")
assert ok2 is False and msg

for t in ("vfy_m1", "vfy_s1"):
    spark.sql(f"DROP TABLE IF EXISTS default.{t}")
print(json.dumps({"oracle_fails": fails}))
assert not fails, f"oracle failures: {fails}"
print("VERIFY DRIVE: ALL OK")
