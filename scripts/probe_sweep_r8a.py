"""Round-8 probe sweep (VERDICT r7 task 6): executed battery over the
round-7 additions the way r7a swept scripting —

1. time-travel edges: OFFSET at snapshot boundaries, STATEMENT ids
   across engine re-instantiation, CLONE AT of a just-swapped table;
2. MAP_* / VECTOR_* NULL / empty / nested shapes;
3. COMPRESS binary round-trips THROUGH TABLES (write the compressed
   bytes, read them back, decompress) — not just literals.

Run: python scripts/probe_sweep_r8a.py
Findings get fixed and locked into the permanent suites."""

import datetime
import shutil
import sys

sys.path.insert(0, "/root/repo")

wh = "/tmp/r8a_sweep_wh"
shutil.rmtree(wh, ignore_errors=True)
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from dbt_icebreaker_spark.runner import IcebreakerEngine  # noqa: E402

eng = IcebreakerEngine(spark, schema="r8sw")

ok = fail = 0
failures = []


def check(name, sql, expect=None, err=None, pre=None):
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


# ------------------------------------------------ 1. time-travel edges
T1 = datetime.datetime(2026, 1, 1)
T2 = datetime.datetime(2026, 2, 1)
spark.sql("DROP TABLE IF EXISTS r8sw.snap")
eng.run_snapshot("snap", "SELECT k, v FROM VALUES (1,'a'),(2,'b') t(k,v)",
                 unique_key="k", strategy="check", check_cols=["v"], now=T1)
eng.run_snapshot("snap", "SELECT k, v FROM VALUES (1,'a2'),(2,'b') t(k,v)",
                 unique_key="k", strategy="check", check_cols=["v"], now=T2)

# boundary exactness: AT exactly the second batch instant sees v2
check("tt-at-exact-t2",
      "SELECT v FROM r8sw.snap AT(TIMESTAMP => '2026-02-01'::TIMESTAMP) "
      "WHERE k = 1", "a2")
# BEFORE the same instant sees v1
check("tt-before-t2",
      "SELECT v FROM r8sw.snap BEFORE(TIMESTAMP => "
      "'2026-02-01'::TIMESTAMP) WHERE k = 1", "a")
# OFFSET 0 = now = current state
check("tt-offset-zero",
      "SELECT v FROM r8sw.snap AT(OFFSET => 0) WHERE k = 1", "a2")
# large negative offset = before first batch → empty
check("tt-offset-prehistory",
      "SELECT COUNT(*) FROM r8sw.snap AT(OFFSET => -3153600000)", 0)
# fractional / expression offsets
check("tt-offset-fraction",
      "SELECT v FROM r8sw.snap AT(OFFSET => -0.5) WHERE k = 1", "a2")
check("tt-offset-expr-neg",
      "SELECT v FROM r8sw.snap AT(OFFSET => -100 - 200) WHERE k = 1",
      "a2")
# positive literal refuses naming the fix
check("tt-offset-positive",
      "SELECT * FROM r8sw.snap AT(OFFSET => 600)", err="future instant")
# STATEMENT across engine re-instantiation (shared history on session)
qid = eng._record_result(eng.execute("SELECT 1 AS probe"))
eng2 = IcebreakerEngine(spark, schema="r8sw")
check("tt-statement-cross-engine",
      f"SELECT COUNT(*) FROM r8sw.snap AT(STATEMENT => '{qid}')", 2)
# CLONE AT of a JUST-SWAPPED table: swap snap with a copy, then CLONE
# the (post-swap) snapshot table at T1 — must materialize T1 state
eng.execute("CREATE OR REPLACE TABLE r8sw.snap_copy AS "
            "SELECT * FROM r8sw.snap")
eng.execute("ALTER TABLE r8sw.snap SWAP WITH r8sw.snap_copy")
check("tt-clone-at-after-swap",
      "SELECT v FROM r8sw.snap_jan WHERE k = 1",
      "a",
      pre=["CREATE OR REPLACE TABLE r8sw.snap_jan CLONE r8sw.snap "
           "AT(TIMESTAMP => '2026-01-15'::TIMESTAMP)"])
# clone of the clone (plain) still reads
check("tt-clone-of-clone",
      "SELECT COUNT(*) FROM r8sw.snap_jan2",
      2,
      pre=["CREATE TABLE r8sw.snap_jan2 CLONE r8sw.snap_jan"])

# ------------------------------------------- 2. MAP_* / VECTOR_* edges
check("map-insert-empty", "SELECT MAP_INSERT(OBJECT_CONSTRUCT(), 'k', 1)",
      '{"k":1}')
check("map-insert-null-map", "SELECT MAP_INSERT(NULL, 'k', 1) IS NULL",
      True)
check("map-cat-null", "SELECT MAP_CAT(OBJECT_CONSTRUCT('a',1), NULL) "
      "IS NULL", True)
check("map-cat-empty-both",
      "SELECT MAP_CAT(OBJECT_CONSTRUCT(), OBJECT_CONSTRUCT())", "{}")
check("map-size-empty", "SELECT MAP_SIZE(OBJECT_CONSTRUCT())", 0)
check("map-size-null", "SELECT MAP_SIZE(NULL) IS NULL", True)
check("map-contains-null-key",
      "SELECT MAP_CONTAINS_KEY(NULL, OBJECT_CONSTRUCT('a',1)) IS NULL",
      True)
check("map-nested-survives",
      "SELECT MAP_INSERT(OBJECT_CONSTRUCT('o', OBJECT_CONSTRUCT('x', "
      "ARRAY_CONSTRUCT(1,2))), 'k', 3):o.x[1]::INT", 2)
check("map-delete-all",
      "SELECT MAP_DELETE(OBJECT_CONSTRUCT('a',1), 'a')", "{}")
check("map-keys-empty", "SELECT ARRAY_SIZE(MAP_KEYS(OBJECT_CONSTRUCT()))",
      0)
check("vec-empty-arrays",
      "SELECT VECTOR_INNER_PRODUCT(ARRAY_CONSTRUCT(), ARRAY_CONSTRUCT())",
      0.0)
check("vec-null-side",
      "SELECT VECTOR_COSINE_SIMILARITY(NULL, ARRAY_CONSTRUCT(1.0)) "
      "IS NULL", True)
check("vec-zero-vector-null",
      "SELECT VECTOR_COSINE_SIMILARITY(ARRAY_CONSTRUCT(0.0, 0.0), "
      "ARRAY_CONSTRUCT(1.0, 0.0)) IS NULL", True)
check("vec-int-arrays",
      "SELECT VECTOR_INNER_PRODUCT(ARRAY_CONSTRUCT(1, 2), "
      "ARRAY_CONSTRUCT(3, 4))", 11.0)
check("vec-l2-negative-components",
      "SELECT VECTOR_L2_DISTANCE(ARRAY_CONSTRUCT(-1.0, 0.0), "
      "ARRAY_CONSTRUCT(2.0, 4.0))", 5.0)
check("vec-on-column",
      "SELECT MAX(VECTOR_INNER_PRODUCT(a, a)) FROM (SELECT "
      "ARRAY_CONSTRUCT(CAST(id AS DOUBLE)) AS a FROM RANGE(3))", 4.0)

# ------------------------- 3. COMPRESS round-trips THROUGH TABLES
check("cmp-through-table",
      "SELECT DECOMPRESS_STRING(c, 'zlib') FROM r8sw.cmp WHERE k = 1",
      "hello world",
      pre=["CREATE OR REPLACE TABLE r8sw.cmp AS SELECT 1 AS k, "
           "COMPRESS('hello world', 'zlib') AS c"])
check("cmp-gzip-through-table",
      "SELECT DECOMPRESS_STRING(c, 'gzip') FROM r8sw.cmpg WHERE k = 1",
      "payload",
      pre=["CREATE OR REPLACE TABLE r8sw.cmpg AS SELECT 1 AS k, "
           "COMPRESS('payload', 'gzip') AS c"])
check("cmp-binary-col-roundtrip",
      "SELECT CAST(DECOMPRESS_BINARY(c, 'bz2') AS STRING) FROM "
      "r8sw.cmpb", "bin-data",
      pre=["CREATE OR REPLACE TABLE r8sw.cmpb AS SELECT "
           "COMPRESS(CAST('bin-data' AS BINARY), 'bz2') AS c"])
check("cmp-deterministic-join",
      "SELECT COUNT(*) FROM r8sw.cmp a JOIN (SELECT "
      "COMPRESS('hello world', 'zlib') AS c) b ON a.c = b.c", 1)
check("cmp-group-by-compressed",
      "SELECT COUNT(DISTINCT c) FROM (SELECT COMPRESS('x', 'gzip') AS c "
      "FROM RANGE(5))", 1)
check("cmp-empty-string",
      "SELECT DECOMPRESS_STRING(COMPRESS('', 'zlib'), 'zlib')", "")
check("cmp-unicode",
      "SELECT DECOMPRESS_STRING(COMPRESS('λπ中文', 'zlib'), 'zlib')",
      "λπ中文")
check("cmp-corrupt-input",
      "SELECT DECOMPRESS_STRING(CAST('junk' AS BINARY), 'zlib')",
      err="error")
check("cmp-wrong-method",
      "SELECT DECOMPRESS_STRING(COMPRESS('x', 'zlib'), 'gzip')",
      err="")

# -------- bonus: r8 additions through tables (ARRAYS_ZIP/SEARCH state)
check("zip-through-table",
      "SELECT z FROM r8sw.zt WHERE k = 1",
      '[{"$1":1,"$2":"a"}]',
      pre=["CREATE OR REPLACE TABLE r8sw.zt AS SELECT 1 AS k, "
           "ARRAYS_ZIP(ARRAY_CONSTRUCT(1), ARRAY_CONSTRUCT('a')) AS z"])
check("zip-flatten-consumable",
      "SELECT f.value:\"$1\"::INT FROM r8sw.zt, "
      "LATERAL FLATTEN(input => PARSE_JSON(z)) f LIMIT 1", 1)
check("search-null-query",
      "SELECT SEARCH('abc', NULL) IS NULL", True)
check("search-null-target",
      "SELECT SEARCH(NULL, 'abc') IS NULL", True)
check("search-empty-query", "SELECT SEARCH('abc', '')", False)

print(f"\n{ok} ok, {fail} FAIL")
for name, msg in failures:
    print(f"  FAIL {name}: {msg}")
spark.stop()
sys.exit(1 if fail else 0)
