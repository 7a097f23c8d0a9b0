"""Round-5c execution probe: transpile AND execute Snowflake spellings
not covered by earlier sweeps, comparing against expected values.
Transpile-success alone lies — every case runs on Spark.

Usage: python scripts/probe_sweep_r5c.py
Prints one line per case: ok / XFAIL(transpile) / XFAIL(exec) / WRONG.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark import get_spark
from dbt_icebreaker_spark.runner import IcebreakerEngine

# (sql, expected) — expected None means "runs without error, any value";
# floats compared at 1e-9; lists compare element-wise
CASES = [
    # window / analytic
    ("SELECT RATIO_TO_REPORT(v) OVER () AS r FROM (SELECT 25.0 v UNION ALL SELECT 75.0) ORDER BY r LIMIT 1", 0.25),
    ("SELECT NTILE(2) OVER (ORDER BY x) AS n FROM (SELECT 1 x UNION ALL SELECT 2) ORDER BY n LIMIT 1", 1),
    ("SELECT KURTOSIS(x) AS k FROM (SELECT 1.0 x UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 10)", None),
    # aggregates
    ("SELECT OBJECT_AGG(k, v) AS o FROM (SELECT 'a' k, 1::VARIANT v)", None),
    ("SELECT BOOLXOR_AGG(b) AS r FROM (SELECT TRUE b UNION ALL SELECT FALSE)", True),
    ("SELECT REGR_INTERCEPT(y, x) AS r FROM (SELECT 1.0 x, 2.0 y UNION ALL SELECT 2, 4)", 0.0),
    ("SELECT REGR_R2(y, x) AS r FROM (SELECT 1.0 x, 2.0 y UNION ALL SELECT 2, 4)", 1.0),
    ("SELECT VARIANCE_POP(x) AS r FROM (SELECT 1.0 x UNION ALL SELECT 3)", 1.0),
    ("SELECT VARIANCE_SAMP(x) AS r FROM (SELECT 1.0 x UNION ALL SELECT 3)", 2.0),
    ("SELECT STDDEV_POP(x) AS r FROM (SELECT 1.0 x UNION ALL SELECT 3)", 1.0),
    ("SELECT GROUPING(k) AS g FROM (SELECT 'a' k, 1 v) GROUP BY ROLLUP(k) ORDER BY g DESC LIMIT 1", 1),
    ("SELECT HASH_AGG(x) AS h FROM (SELECT 1 x UNION ALL SELECT 2)", None),
    ("SELECT HASH(1, 'a') AS h", None),
    # scalar boolean
    ("SELECT BOOLXOR(1, 0) AS r", True),
    ("SELECT BOOLNOT(0) AS r", True),
    ("SELECT BOOLAND(1, 1) AS r", True),
    ("SELECT BOOLOR(0, 1) AS r", True),
    # higher-order lambdas (Snowflake structured-type functions)
    ("SELECT FILTER(ARRAY_CONSTRUCT(1, 2, 3), x -> x > 1) AS r", [2, 3]),
    ("SELECT TRANSFORM(ARRAY_CONSTRUCT(1, 2), x -> x * 10) AS r", [10, 20]),
    ("SELECT REDUCE(ARRAY_CONSTRUCT(1, 2, 3), 0, (a, x) -> a + x) AS r", 6),
    # IS_ / AS_ variant family
    ("SELECT IS_ARRAY(PARSE_JSON('[1]')) AS r", True),
    ("SELECT IS_OBJECT(PARSE_JSON('{\"a\":1}')) AS r", True),
    ("SELECT IS_BOOLEAN(PARSE_JSON('true')) AS r", True),
    ("SELECT IS_VARCHAR(PARSE_JSON('\"x\"')) AS r", True),
    ("SELECT IS_DOUBLE(PARSE_JSON('1.5')) AS r", True),
    ("SELECT IS_NULL_VALUE(PARSE_JSON('null')) AS r", True),
    ("SELECT AS_ARRAY(PARSE_JSON('[1,2]')) AS r", None),
    ("SELECT AS_OBJECT(PARSE_JSON('{\"a\":1}')) AS r", None),
    ("SELECT AS_DOUBLE(PARSE_JSON('1.5')) AS r", 1.5),
    ("SELECT AS_BOOLEAN(PARSE_JSON('true')) AS r", True),
    ("SELECT AS_DATE(PARSE_JSON('\"2024-01-02\"')) AS r", None),
    # generators / random
    ("SELECT UNIFORM(1, 10, RANDOM()) AS r", None),
    ("SELECT UNIFORM(0::FLOAT, 1::FLOAT, RANDOM(42)) AS r", None),
    ("SELECT SEQ4() AS s FROM TABLE(GENERATOR(ROWCOUNT => 3)) ORDER BY s LIMIT 1", 0),
    ("SELECT SEQ8() AS s FROM TABLE(GENERATOR(ROWCOUNT => 2)) ORDER BY s DESC LIMIT 1", 1),
    ("SELECT UUID_STRING() AS u", None),
    ("SELECT NORMAL(0, 1, RANDOM()) AS r", None),
    # time
    ("SELECT TIME_SLICE('2024-03-15 10:17:00'::TIMESTAMP, 15, 'MINUTE') AS r", None),
    ("SELECT TIMESTAMPADD(HOUR, 2, '2024-01-01 00:00:00'::TIMESTAMP) AS r", None),
    ("SELECT TIMESTAMPDIFF(DAY, '2024-01-01'::DATE, '2024-01-03'::DATE) AS r", 2),
    ("SELECT TIMEADD(MINUTE, 30, '2024-01-01 00:00:00'::TIMESTAMP) AS r", None),
    ("SELECT TIMEDIFF(HOUR, '2024-01-01 00:00:00'::TIMESTAMP, '2024-01-01 05:00:00'::TIMESTAMP) AS r", 5),
    ("SELECT DATE_TRUNC(WEEK, '2024-03-15'::DATE) AS r", None),  # bare keyword part
    ("SELECT EXTRACT(EPOCH_SECOND FROM '2024-01-01 00:00:00'::TIMESTAMP) AS r", None),
    ("SELECT DATE_PART(EPOCH_MILLISECOND, '1970-01-01 00:00:01'::TIMESTAMP) AS r", 1000),
    # binary codecs
    ("SELECT TO_BINARY('48AB', 'HEX') AS r", None),
    ("SELECT TO_BINARY('SGVsbG8=', 'BASE64') AS r", None),
    ("SELECT TRY_TO_BINARY('zz', 'HEX') AS r", None),
    ("SELECT BASE64_DECODE_BINARY('SGVsbG8=') AS r", None),
    ("SELECT HEX_DECODE_BINARY('48') AS r", None),
    ("SELECT MD5_BINARY('x') AS r", None),
    ("SELECT SHA1_BINARY('x') AS r", None),
    ("SELECT SHA2_BINARY('x', 256) AS r", None),
    ("SELECT GETBIT(5, 0) AS r", 1),
    # strings
    ("SELECT PARSE_URL('https://h.com/p?a=1') AS r", None),
    ("SELECT PARSE_IP('192.168.1.1', 'INET') AS r", None),
    ("SELECT SPLIT('a,b', ',') AS r", ["a", "b"]),
    ("SELECT value FROM TABLE(STRTOK_SPLIT_TO_TABLE('a b', ' ')) ORDER BY index LIMIT 1", "a"),
    ("SELECT COLLATE('X', 'en-ci') = 'x' AS r", True),
    ("SELECT 'a' || COLLATE('B', 'en-ci') AS r", None),
    ("SELECT LEN('abc') AS r", 3),
    ("SELECT SUBSTR('hello', 0, 2) AS r", "he"),  # Snowflake pos 0 == 1
    ("SELECT REGEXP_REPLACE('a1b2', '\\\\d') AS r", "ab"),  # 2-arg removes
    ("SELECT REGEXP_LIKE('abc', 'a.c') AS r", True),
    ("SELECT INSTR('hello', 'll') AS r", 3),
    # objects / variants
    ("SELECT OBJECT_CONSTRUCT(*) AS o FROM (SELECT 1 a, 2 b)", None),
    ("SELECT MAP_KEYS(OBJECT_CONSTRUCT('a', 1)) AS r", None),
    ("SELECT ARRAY_AGG(*) AS r FROM (SELECT 1 a)", None),
    ("SELECT GET(ARRAY_CONSTRUCT(10, 20), 1) AS r", None),
    ("SELECT ARRAY_INSERT(ARRAY_CONSTRUCT(1, 3), 1, 2::VARIANT) AS r", None),
    ("SELECT ARRAY_PREPEND(ARRAY_CONSTRUCT(2), 1::VARIANT) AS r", None),
    ("SELECT ARRAY_APPEND(ARRAY_CONSTRUCT(1), 2::VARIANT) AS r", None),
    # misc numerics
    ("SELECT LOG(2, 8) AS r", 3.0),          # Snowflake LOG(base, x)
    ("SELECT LOG(10, 100) AS r", 2.0),
    ("SELECT POW(2, 10) AS r", 1024.0),
    ("SELECT SQUARE(4) AS r", 16.0),
    # conditional
    ("SELECT BOOLAND_AGG(x > 0) AS r FROM (SELECT 1 x UNION ALL SELECT 2)", True),
    ("SELECT NVL2(NULL, 'a', 'b') AS r", "b"),
    ("SELECT REGR_VALX(1.0, 2.0) AS r", 2.0),
    # system / context functions
    ("SELECT CURRENT_DATE() AS d", None),
    ("SELECT CURRENT_ACCOUNT() AS a", None),
    ("SELECT CURRENT_REGION() AS a", None),
    ("SELECT CURRENT_VERSION() AS a", None),
    ("SELECT CURRENT_CLIENT() AS a", None),
    ("SELECT CURRENT_SESSION() AS a", None),
    ("SELECT CURRENT_STATEMENT() AS a", None),
    ("SELECT CURRENT_TRANSACTION() AS a", None),
]


def main():
    spark = get_spark(app_name="probe_r5c")
    eng = IcebreakerEngine(spark, schema="probe_r5c")
    ok = xt = xe = wrong = 0
    for sql, expect in CASES:
        try:
            df = eng.execute(sql)
            row = df.collect()
        except Exception as e:  # noqa: BLE001
            kind = "XFAIL(transpile)" if "Transpile" in type(e).__name__ \
                else "XFAIL(exec)"
            if kind == "XFAIL(transpile)":
                xt += 1
            else:
                xe += 1
            print(f"{kind:18} {sql[:90]}")
            print(f"                   -> {str(e).splitlines()[0][:150]}")
            continue
        if expect is None:
            ok += 1
            continue
        got = row[0][0] if row else None
        match = False
        if isinstance(expect, float):
            try:
                match = got is not None and abs(float(got) - expect) < 1e-9
            except (TypeError, ValueError):
                match = False
        elif isinstance(expect, list):
            match = got is not None and [str(g) for g in got] == [
                str(e) for e in expect
            ]
        else:
            match = got == expect
        if match:
            ok += 1
        else:
            wrong += 1
            print(f"{'WRONG':18} {sql[:90]}")
            print(f"                   -> got {got!r}, want {expect!r}")
    print(f"\n{ok} ok, {xt} transpile-fail, {xe} exec-fail, {wrong} wrong "
          f"of {len(CASES)}")
    spark.stop()


if __name__ == "__main__":
    main()
