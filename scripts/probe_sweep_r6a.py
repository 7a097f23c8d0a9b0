"""Round-6a execution probe: scalar/statement surface not yet swept.
Targets the classic Snowflake-vs-Spark semantic traps: multiset array
set-ops, NULL-propagating GREATEST/LEAST, DECODE's NULL-matches-NULL,
CONVERT_TIMEZONE arg orders, the bitmap distinct-count family,
higher-order lambdas, binary conversions, LIKE ANY/ALL. Every case
EXECUTES with an expected value (Snowflake-documented semantics).

Usage: python scripts/probe_sweep_r6a.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark import get_spark
from dbt_icebreaker_spark.runner import IcebreakerEngine

FIXTURE = (
    "CREATE OR REPLACE TEMP VIEW p AS SELECT * FROM VALUES "
    "(1, 1.0, 2.0), (2, 2.0, 4.0), (3, 3.0, 6.0), (4, 4.0, 8.5) "
    "t(k, x, y)"
)

# (sql, expected first-column values ordered, or scalar)
CASES = [
    # DECODE — Oracle semantics incl. NULL-matches-NULL
    ("SELECT DECODE(2, 1, 'a', 2, 'b', 'z') AS r", ["b"]),
    ("SELECT DECODE(NULL, 1, 'a', NULL, 'n', 'z') AS r", ["n"]),
    ("SELECT DECODE(9, 1, 'a', 2, 'b') AS r", [None]),
    # GREATEST/LEAST — Snowflake propagates NULL (Spark skips!)
    ("SELECT GREATEST(1, 5, NULL) AS r", [None]),
    ("SELECT LEAST(1, 5, NULL) AS r", [None]),
    ("SELECT GREATEST(1, 5, 3) AS r", [5]),
    ("SELECT GREATEST_IGNORE_NULLS(1, 5, NULL) AS r", [5]),
    # multiset array set-ops (Snowflake keeps duplicates; Spark dedups)
    ("SELECT ARRAY_EXCEPT([1,1,2,3], [1]) AS r", [[1, 2, 3]]),
    ("SELECT ARRAY_EXCEPT([1,1,2], [1,1]) AS r", [[2]]),
    ("SELECT ARRAY_INTERSECTION([1,1,2], [1,1,3]) AS r", [[1, 1]]),
    ("SELECT ARRAY_INTERSECTION([1,2], [2,3]) AS r", [[2]]),
    # higher-order lambdas (Snowflake named these like Spark)
    ("SELECT FILTER([1,2,3], a -> a > 1) AS r", [[2, 3]]),
    ("SELECT TRANSFORM([1,2,3], a -> a * 2) AS r", [[2, 4, 6]]),
    ("SELECT REDUCE([1,2,3], 0, (acc, a) -> acc + a) AS r", [6]),
    # string predicates
    ("SELECT STARTSWITH('spark', 'sp') AS r", [True]),
    ("SELECT ENDSWITH('spark', 'rk') AS r", [True]),
    ("SELECT CONTAINS('sparkly', 'ark') AS r", [True]),
    ("SELECT 'spark' LIKE ANY ('sp%', 'x%') AS r", [True]),
    ("SELECT 'spark' LIKE ALL ('sp%', '%rk') AS r", [True]),
    ("SELECT 'SPARK' ILIKE ANY ('sp%', 'x%') AS r", [True]),
    ("SELECT SPLIT_PART('a,b,c', ',', -1) AS r", ["c"]),
    ("SELECT SPLIT_PART('a,b,c', ',', 9) AS r", [""]),
    ("SELECT SOUNDEX('Smith') AS r", ["S530"]),
    ("SELECT TRANSLATE('abc', 'ab', 'xy') AS r", ["xyc"]),
    ("SELECT CHR(65) AS r", ["A"]),
    ("SELECT OCTET_LENGTH('abc') AS r", [3]),
    ("SELECT BIT_LENGTH('abc') AS r", [24]),
    ("SELECT POSITION('b' IN 'abc') AS r", [2]),
    ("SELECT POSITION('b', 'abcb', 3) AS r", [4]),
    ("SELECT CONCAT('a', NULL) AS r", [None]),
    ("SELECT 'a' || NULL AS r", [None]),
    # numeric tail
    ("SELECT WIDTH_BUCKET(5.35, 0, 10, 5) AS r", [3]),
    ("SELECT FACTORIAL(5) AS r", [120]),
    ("SELECT GETBIT(11, 1) AS r", [1]),
    ("SELECT GETBIT(11, 2) AS r", [0]),
    ("SELECT MOD(-5, 3) AS r", [-2]),
    ("SELECT SIGN(-42) AS r", [-1]),
    ("SELECT LOG(2, 8) AS r", [3.0]),
    ("SELECT COT(1) AS r", [0.6420926159343306]),
    # regression aggregates (Spark-native since 3.3; same arg order)
    ("SELECT REGR_SLOPE(y, x) AS r FROM p", [2.15]),
    ("SELECT REGR_COUNT(y, x) AS r FROM p", [4]),
    ("SELECT REGR_AVGX(y, x) AS r FROM p", [2.5]),
    ("SELECT ROUND(REGR_R2(y, x), 6) AS r FROM p", [0.996765]),
    # bitmap distinct-count family (Snowflake layout: 32768-wide buckets)
    ("SELECT BITMAP_BUCKET_NUMBER(1) AS r", [1]),
    ("SELECT BITMAP_BUCKET_NUMBER(32768) AS r", [1]),
    ("SELECT BITMAP_BUCKET_NUMBER(32769) AS r", [2]),
    ("SELECT BITMAP_BIT_POSITION(1) AS r", [0]),
    ("SELECT BITMAP_BIT_POSITION(32768) AS r", [32767]),
    ("SELECT SUM(cnt) AS r FROM (SELECT BITMAP_COUNT(BITMAP_CONSTRUCT_AGG("
     "BITMAP_BIT_POSITION(k))) AS cnt FROM p GROUP BY "
     "BITMAP_BUCKET_NUMBER(k))", [4]),
    # date/time tail
    ("SELECT MONTHS_BETWEEN('2024-03-31'::DATE, '2024-02-29'::DATE) AS r",
     [1.0]),
    ("SELECT NEXT_DAY('2024-01-01'::DATE, 'Friday')::STRING AS r",
     ["2024-01-05"]),
    ("SELECT ADD_MONTHS('2024-01-31'::DATE, 1)::STRING AS r",
     ["2024-02-29"]),
    ("SELECT CONVERT_TIMEZONE('UTC', 'America/Los_Angeles', "
     "'2024-01-01 12:00:00'::TIMESTAMP_NTZ)::STRING AS r",
     ["2024-01-01 04:00:00"]),
    ("SELECT CONVERT_TIMEZONE('America/New_York', "
     "'2024-06-01 12:00:00')::STRING AS r", ["2024-06-01 08:00:00"]),
    # binary conversions
    ("SELECT HEX_ENCODE(TO_BINARY('48ab')) AS r", ["48AB"]),
    ("SELECT HEX_ENCODE(TO_BINARY('SGk=', 'BASE64')) AS r", ["4869"]),
    ("SELECT HEX_ENCODE(TO_BINARY('Hi', 'UTF-8')) AS r", ["4869"]),
    ("SELECT TRY_TO_BINARY('zz') AS r", [None]),
    # object construct NULL handling
    ("SELECT OBJECT_CONSTRUCT('a', 1, 'b', NULL) AS r", ['{"a":1}']),
    ("SELECT OBJECT_CONSTRUCT_KEEP_NULL('a', 1, 'b', NULL) AS r",
     ['{"a":1,"b":null}']),
    # array agg forms
    ("SELECT ARRAY_AGG(DISTINCT k % 2) WITHIN GROUP (ORDER BY k % 2) "
     "AS r FROM p", [[0, 1]]),
    ("SELECT ARRAY_MIN([3,1,2]) AS r", [1]),
    ("SELECT ARRAY_MAX([3,1,2]) AS r", [3]),
    ("SELECT ARRAYS_OVERLAP([1,2], [2,3]) AS r", [True]),
]


def main():
    spark = get_spark(app_name="probe_r6a")
    eng = IcebreakerEngine(spark, schema="probe_r6a")
    spark.sql(FIXTURE)
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
        want = [round(x, 9) if isinstance(x, float) else x
                for x in (expect if isinstance(expect, list) else [expect])]
        if norm == want:
            ok += 1
        else:
            bad += 1
            print(f"WRONG {sql[:100]}")
            print(f"      -> got {norm!r}, want {want!r}")
    print(f"\n{ok} ok, {bad} bad of {len(CASES)}")
    spark.stop()


if __name__ == "__main__":
    main()
