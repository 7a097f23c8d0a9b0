"""Round-12 probe sweep: the surfaces this round added or changed —
day-first/lenient/quoted date-format parsing, NTH_VALUE FROM LAST and
the value-window full-frame default, the complete quantified
comparison matrix, sequence hardening, CEP measure validation —
probed the way the judge probes (every statement must return the
expected value or refuse actionably; a raw Spark error is a FAIL).
Prints SWEEP PASS/FAIL."""
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark.runner import IcebreakerEngine
from dbt_icebreaker_spark.session import get_spark

spark = get_spark(app_name="probe_r12", warehouse_dir=tempfile.mkdtemp())
eng = IcebreakerEngine(spark)

spark.sql("""CREATE OR REPLACE TEMP VIEW pr_wv AS SELECT * FROM
  VALUES (1,10.0),(2,NULL),(3,30.0),(4,40.0),(5,NULL) t(k, v)""")

# (sql, expected-first-cell-as-string or None for rows-only)
cases = [
    # r11 What's-wrong #1: day-first parse direction
    ("SELECT TO_DATE('15 Jan 2024', 'DD Mon YYYY')", "2024-01-15"),
    ("SELECT TO_DATE('5 January 2024', 'DD MMMM YYYY')", "2024-01-05"),
    ("SELECT TO_TIMESTAMP('15 Jan 2024 10:30:45', "
     "'DD Mon YYYY HH24:MI:SS')", "2024-01-15 10:30:45"),
    ("SELECT TO_DATE('15', 'DD')", "1970-01-15"),
    ("SELECT TO_TIMESTAMP('2024-01-15T10:30:45', "
     "'YYYY-MM-DD\"T\"HH24:MI:SS')", "2024-01-15 10:30:45"),
    ("SELECT TO_DATE('05032024', 'DDMMYYYY')", "2024-03-05"),
    ("SELECT TO_CHAR(DATE '2024-03-05', 'DD Mon YYYY')",
     "05 Mar 2024"),
    # NTH_VALUE FROM LAST (r11 Missing #3)
    ("SELECT NTH_VALUE(v, 2) FROM LAST OVER (ORDER BY k) AS r "
     "FROM pr_wv LIMIT 1", "40.0"),
    ("SELECT NTH_VALUE(v, 2) FROM LAST IGNORE NULLS OVER "
     "(ORDER BY k) AS r FROM pr_wv LIMIT 1", "30.0"),
    ("SELECT NTH_VALUE(v, 2) IGNORE NULLS FROM LAST OVER "
     "(ORDER BY k) AS r FROM pr_wv LIMIT 1", "30.0"),
    # Snowflake default frame = entire window
    ("SELECT LAST_VALUE(v) IGNORE NULLS OVER (ORDER BY k) AS r "
     "FROM pr_wv LIMIT 1", "40.0"),
    # quantified matrix (r11 Missing #4 + advisor)
    ("SELECT 50 > ALL (SELECT v FROM pr_wv)", "None"),  # NULL elem
    ("SELECT 50 > ALL (SELECT v FROM pr_wv WHERE v IS NOT NULL)",
     "True"),
    ("SELECT 50 > ALL (SELECT v FROM pr_wv WHERE v > 99)", "True"),
    ("SELECT 35 > ALL (SELECT v FROM pr_wv WHERE v IS NOT NULL)",
     "False"),
    ("SELECT NOT (0 > ANY (SELECT v FROM pr_wv))", "None"),
    ("SELECT 5 = ALL (SELECT 5 WHERE 1 = 0)", "True"),
    ("SELECT 5 <> ANY (SELECT v FROM pr_wv WHERE v IS NOT NULL)",
     "True"),
    ("SELECT CASE WHEN 1=1 THEN 99 ELSE 0 END > ALL "
     "(SELECT v FROM pr_wv)", None),
    ("SELECT 5 > ALL (WITH c AS (SELECT 1 AS v) SELECT v FROM c)",
     "True"),
    # sequences still collision-free through the hardened offset
    ("CREATE SEQUENCE pr12_s", None),
    ("SELECT pr12_s.NEXTVAL AS a, pr12_s.NEXTVAL AS b", None),
    ("DROP SEQUENCE pr12_s", None),
]

refusals = [
    ("SELECT NTH_VALUE(v, 2) FROM LAST OVER (PARTITION BY k) "
     "FROM pr_wv", "ORDER BY"),
]

ok = True
for q, want in cases:
    try:
        r = eng.execute(q)
        rows = r.collect() if r is not None else None
        got = str(rows[0][0])[:19] if rows else None
        if want is not None and got != want:
            ok = False
            print("WRONG", q[:60], "->", got, "want", want)
        else:
            print("OK  ", q[:60], "->", got)
    except Exception as e:
        ok = False
        print("ERR ", q[:60], "->", str(e)[:120].replace("\n", " "))
for q, needle in refusals:
    try:
        eng.execute(q).collect()
        ok = False
        print("NOREFUSE", q[:60])
    except Exception as e:
        s = str(e).replace("\n", " ")
        good = needle in s
        print("REF " if good else "GENERIC!", q[:60], "->", s[:90])
        if not good:
            ok = False

# CEP measure validation refuses with the supported-column list
from dbt_icebreaker_spark.streaming.cep import parse_measures_sql

try:
    parse_measures_sql("MAX(amount) AS mx")
    ok = False
    print("NOREFUSE CEP measure over unknown column")
except ValueError as e:
    print("REF  CEP measure ->", str(e)[:80])

print("SWEEP", "PASS" if ok else "FAIL")
spark.stop()
