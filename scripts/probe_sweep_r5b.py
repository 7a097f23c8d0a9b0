"""Round-5 continuation probe sweep: ~70 Snowflake spellings not yet
in the battery, each executed with an expected value. Reports PASS /
MISMATCH / ERROR per case so gaps become fix work.

Usage: python scripts/probe_sweep_r5b.py [filter-substring]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    # ---- strings
    ("STRTOK", "SELECT STRTOK('a.b.c', '.', 2) AS r", "b"),
    ("STRTOK_1ARG", "SELECT STRTOK('a b c') AS r", "a"),
    ("STRTOK_TO_ARRAY", "SELECT STRTOK_TO_ARRAY('a.b.c', '.') AS r", ["a", "b", "c"]),
    ("SOUNDEX", "SELECT SOUNDEX('Robert') AS r", "R163"),
    ("DECODE", "SELECT DECODE(2, 1, 'one', 2, 'two', 'other') AS r", "two"),
    ("DECODE_NULL", "SELECT DECODE(NULL, 1, 'one', NULL, 'isnull', 'other') AS r", "isnull"),
    ("INSERT_STR", "SELECT INSERT('abcdef', 2, 3, 'XY') AS r", "aXYef"),
    ("TRANSLATE", "SELECT TRANSLATE('abc', 'abc', 'xyz') AS r", "xyz"),
    ("INITCAP", "SELECT INITCAP('hello world') AS r", "Hello World"),
    ("RTRIMMED_LENGTH", "SELECT RTRIMMED_LENGTH('ab  ') AS r", 2),
    ("UNICODE", "SELECT UNICODE('A') AS r", 65),
    ("CHR", "SELECT CHR(65) AS r", "A"),
    ("CHAR_FN", "SELECT CHAR(66) AS r", "B"),
    ("SPLIT_PART_NEG", "SELECT SPLIT_PART('a|b|c', '|', -1) AS r", "c"),
    ("REGEXP_SUBSTR_ALL", "SELECT REGEXP_SUBSTR_ALL('a1b22', '[0-9]+') AS r", ["1", "22"]),
    ("REGEXP_INSTR", "SELECT REGEXP_INSTR('abc1', '[0-9]') AS r", 4),
    ("REGEXP_COUNT", "SELECT REGEXP_COUNT('a1b2c3', '[0-9]') AS r", 3),
    ("CHARINDEX", "SELECT CHARINDEX('b', 'abc') AS r", 2),
    ("POSITION_IN", "SELECT POSITION('b' IN 'abc') AS r", 2),
    ("POSITION_2ARG", "SELECT POSITION('b', 'abc') AS r", 2),
    ("STARTSWITH", "SELECT STARTSWITH('abc', 'ab') AS r", True),
    ("ENDSWITH", "SELECT ENDSWITH('abc', 'c') AS r", True),
    ("CONTAINS", "SELECT CONTAINS('abc', 'b') AS r", True),
    ("SPACE", "SELECT SPACE(3) AS r", "   "),
    ("ASCII", "SELECT ASCII('A') AS r", 65),
    ("BIT_LENGTH", "SELECT BIT_LENGTH('a') AS r", 8),
    ("OCTET_LENGTH", "SELECT OCTET_LENGTH('ab') AS r", 2),
    ("MD5_HEX", "SELECT MD5_HEX('abc') AS r", "900150983cd24fb0d6963f7d28e17f72"),
    ("SHA1_FN", "SELECT SHA1('abc') AS r", "a9993e364706816aba3e25717850c26c9cd0d89d"),
    ("SHA2_FN", "SELECT SHA2('abc', 256) AS r", "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"),
    ("BASE64_ENCODE", "SELECT BASE64_ENCODE('abc') AS r", "YWJj"),
    ("BASE64_DECODE_STRING", "SELECT BASE64_DECODE_STRING('YWJj') AS r", "abc"),
    ("TRY_BASE64_DECODE_STRING", "SELECT TRY_BASE64_DECODE_STRING('%%%') AS r", None),
    ("HEX_ENCODE", "SELECT HEX_ENCODE('ab') AS r", "6162"),
    ("HEX_DECODE_STRING", "SELECT HEX_DECODE_STRING('6162') AS r", "ab"),
    ("REVERSE", "SELECT REVERSE('abc') AS r", "cba"),
    ("UUID_STRING_LEN", "SELECT LENGTH(UUID_STRING()) AS r", 36),
    # ---- arrays / semi-structured
    ("ARRAY_FLATTEN", "SELECT ARRAY_FLATTEN([[1,2],[3]]) AS r", [1, 2, 3]),
    ("ARRAY_GENERATE_RANGE", "SELECT ARRAY_GENERATE_RANGE(1, 5) AS r", [1, 2, 3, 4]),
    ("ARRAY_GENERATE_RANGE_STEP", "SELECT ARRAY_GENERATE_RANGE(0, 10, 3) AS r", [0, 3, 6, 9]),
    ("ARRAY_SORT", "SELECT ARRAY_SORT([3,1,2]) AS r", [1, 2, 3]),
    ("ARRAY_SORT_DESC", "SELECT ARRAY_SORT([3,1,2], FALSE) AS r", [3, 2, 1]),
    ("ARRAY_MIN", "SELECT ARRAY_MIN([3,1,2]) AS r", 1),
    ("ARRAY_MAX", "SELECT ARRAY_MAX([3,1,2]) AS r", 3),
    ("ARRAY_COMPACT", "SELECT ARRAY_COMPACT([1,NULL,2]) AS r", [1, 2]),
    ("ARRAY_DISTINCT", "SELECT ARRAY_DISTINCT([1,1,2]) AS r", [1, 2]),
    ("ARRAY_INTERSECTION", "SELECT ARRAY_INTERSECTION([1,2,3], [2,3,4]) AS r", [2, 3]),
    ("ARRAY_EXCEPT", "SELECT ARRAY_EXCEPT([1,2,3], [2]) AS r", [1, 3]),
    ("ARRAY_CAT", "SELECT ARRAY_CAT([1], [2,3]) AS r", [1, 2, 3]),
    ("ARRAY_POSITION", "SELECT ARRAY_POSITION(2, [1,2,3]) AS r", 1),
    ("ARRAY_CONTAINS_V", "SELECT ARRAY_CONTAINS(2, [1,2,3]) AS r", True),
    ("ARRAYS_OVERLAP", "SELECT ARRAYS_OVERLAP([1,2], [2,9]) AS r", True),
    ("ARRAY_SLICE", "SELECT ARRAY_SLICE([0,1,2,3], 0, 2) AS r", [0, 1]),
    ("ARRAY_SLICE_NEG", "SELECT ARRAY_SLICE([0,1,2,3], -2, 4) AS r", [2, 3]),
    ("ARRAYS_ZIP", "SELECT ARRAYS_ZIP([1,2], ['a','b']) IS NOT NULL AS r", True),
    ("OBJECT_KEYS", "SELECT OBJECT_KEYS(OBJECT_CONSTRUCT('a', 1, 'b', 2)) AS r", ["a", "b"]),
    ("TYPEOF_INT", "SELECT TYPEOF(TO_VARIANT(1)) AS r", "INTEGER"),
    ("TYPEOF_STR", "SELECT TYPEOF(TO_VARIANT('x')) AS r", "VARCHAR"),
    ("IS_INTEGER", "SELECT IS_INTEGER(TO_VARIANT(1)) AS r", True),
    ("AS_INTEGER", "SELECT AS_INTEGER(TO_VARIANT(7)) AS r", 7),
    ("AS_VARCHAR", "SELECT AS_VARCHAR(TO_VARIANT('x')) AS r", "x"),
    ("GET_0", "SELECT GET([10,20], 0) AS r", 10),
    ("GET_PATH", "SELECT GET_PATH(PARSE_JSON('{\"a\":{\"b\":5}}'), 'a.b')::INT AS r", 5),
    ("JSON_EXTRACT_PATH_TEXT", "SELECT JSON_EXTRACT_PATH_TEXT('{\"a\":{\"b\":5}}', 'a.b') AS r", "5"),
    ("TRY_PARSE_JSON_BAD", "SELECT TRY_PARSE_JSON('{bad') IS NULL AS r", True),
    ("CHECK_JSON_OK", "SELECT CHECK_JSON('{\"a\":1}') IS NULL AS r", True),
    ("STRIP_NULL_VALUE", "SELECT STRIP_NULL_VALUE(PARSE_JSON('null')) IS NULL AS r", True),
    ("TO_ARRAY", "SELECT TO_ARRAY(1) AS r", [1]),
    ("TO_JSON_RT", "SELECT TO_JSON(PARSE_JSON('{\"a\":1}')) AS r", '{"a":1}'),
    # ---- numerics
    ("NULLIFZERO", "SELECT NULLIFZERO(0) AS r", None),
    ("DIV0", "SELECT DIV0(1, 0) AS r", 0.0),
    ("DIV0NULL", "SELECT DIV0NULL(1, NULL) AS r", 0.0),
    ("WIDTH_BUCKET", "SELECT WIDTH_BUCKET(5, 0, 10, 2) AS r", 2),
    ("FACTORIAL", "SELECT FACTORIAL(5) AS r", 120),
    ("SQUARE", "SELECT SQUARE(4) AS r", 16.0),
    ("CBRT", "SELECT CBRT(27) AS r", 3.0),
    ("TRUNC_NUM", "SELECT TRUNC(3.99) AS r", 3),
    ("TRUNCATE_2ARG", "SELECT TRUNCATE(3.987, 2) AS r", 3.98),
    ("CEIL_SCALE", "SELECT CEIL(3.14159, 2) AS r", 3.15),
    ("FLOOR_SCALE", "SELECT FLOOR(3.14159, 3) AS r", 3.141),
    ("ROUND_HALF_EVEN", "SELECT ROUND(2.5, 0, 'HALF_TO_EVEN') AS r", 2),
    ("MOD_FN", "SELECT MOD(7, 3) AS r", 1),
    ("SIGN_FN", "SELECT SIGN(-5) AS r", -1),
    # ---- bitwise
    ("BITAND", "SELECT BITAND(6, 3) AS r", 2),
    ("BITOR", "SELECT BITOR(6, 3) AS r", 7),
    ("BITXOR", "SELECT BITXOR(6, 3) AS r", 5),
    ("BITNOT", "SELECT BITNOT(0) AS r", -1),
    ("BITSHIFTLEFT", "SELECT BITSHIFTLEFT(1, 3) AS r", 8),
    ("BITSHIFTRIGHT", "SELECT BITSHIFTRIGHT(8, 3) AS r", 1),
    ("BITAND_AGG", "SELECT BITAND_AGG(v) AS r FROM (SELECT 6 AS v UNION ALL SELECT 3) t", 2),
    ("BITOR_AGG", "SELECT BITOR_AGG(v) AS r FROM (SELECT 4 AS v UNION ALL SELECT 3) t", 7),
    # ---- dates
    ("DATE_FROM_PARTS", "SELECT DATE_FROM_PARTS(2026, 1, 15)::VARCHAR AS r", "2026-01-15"),
    ("TIME_FROM_PARTS", "SELECT TIME_FROM_PARTS(13, 30, 15)::VARCHAR AS r", "13:30:15"),
    ("TIMESTAMP_FROM_PARTS", "SELECT TIMESTAMP_FROM_PARTS(2026, 1, 15, 13, 30, 15)::VARCHAR AS r", "2026-01-15 13:30:15"),
    ("DAYNAME", "SELECT DAYNAME('2026-01-15'::DATE) AS r", "Thu"),
    ("MONTHNAME", "SELECT MONTHNAME('2026-01-15'::DATE) AS r", "Jan"),
    ("LAST_DAY", "SELECT LAST_DAY('2026-02-10'::DATE)::VARCHAR AS r", "2026-02-28"),
    ("LAST_DAY_YEAR", "SELECT LAST_DAY('2026-02-10'::DATE, 'year')::VARCHAR AS r", "2026-12-31"),
    ("NEXT_DAY", "SELECT NEXT_DAY('2026-08-15'::DATE, 'Friday')::VARCHAR AS r", "2026-08-21"),
    ("PREVIOUS_DAY", "SELECT PREVIOUS_DAY('2026-08-15'::DATE, 'Friday')::VARCHAR AS r", "2026-08-14"),
    ("ADD_MONTHS_CLAMP", "SELECT ADD_MONTHS('2026-01-31'::DATE, 1)::VARCHAR AS r", "2026-02-28"),
    ("MONTHS_BETWEEN", "SELECT MONTHS_BETWEEN('2026-03-15'::DATE, '2026-01-15'::DATE) AS r", 2.0),
    ("TRUNC_DATE_MONTH", "SELECT TRUNC('2026-08-15'::DATE, 'MONTH')::VARCHAR AS r", "2026-08-01"),
    ("YEAROFWEEK", "SELECT YEAROFWEEK('2026-01-01'::DATE) AS r", 2026),
    ("YEAROFWEEKISO", "SELECT YEAROFWEEKISO('2027-01-01'::DATE) AS r", 2026),
    ("WEEKISO", "SELECT WEEKISO('2026-01-01'::DATE) AS r", 1),
    ("DAYOFWEEKISO", "SELECT DAYOFWEEKISO('2026-08-15'::DATE) AS r", 6),
    ("DATE_PART_EPOCH", "SELECT DATE_PART('epoch_second', '1970-01-02 00:00:00'::TIMESTAMP) AS r", 86400),
    ("CONVERT_TIMEZONE_3", "SELECT CONVERT_TIMEZONE('UTC', 'America/New_York', '2026-01-15 12:00:00'::TIMESTAMP)::VARCHAR AS r", "2026-01-15 07:00:00"),
    # ---- aggregates / window
    ("MIN_BY", "SELECT MIN_BY(s, v) AS r FROM (SELECT 'a' AS s, 2 AS v UNION ALL SELECT 'b', 1) t", "b"),
    ("MAX_BY", "SELECT MAX_BY(s, v) AS r FROM (SELECT 'a' AS s, 2 AS v UNION ALL SELECT 'b', 1) t", "a"),
    ("MODE_AGG", "SELECT MODE(v) AS r FROM (SELECT 1 AS v UNION ALL SELECT 1 UNION ALL SELECT 2) t", 1),
    ("KURTOSIS", "SELECT ROUND(KURTOSIS(v), 4) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 10) t", None),
    ("SKEW_AGG", "SELECT SKEW(v) IS NOT NULL AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 3 UNION ALL SELECT 10) t", True),
    ("MEDIAN", "SELECT MEDIAN(v) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 10) t", 2.0),
    ("PERCENTILE_CONT", "SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY v) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 10) t", 2.0),
    ("PERCENTILE_DISC", "SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 10) t", 2),
    ("APPROX_COUNT_DISTINCT", "SELECT APPROX_COUNT_DISTINCT(v) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 2) t", 2),
    ("HLL", "SELECT HLL(v) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2) t", 2),
    ("APPROX_PERCENTILE", "SELECT APPROX_PERCENTILE(v, 0.5) AS r FROM (SELECT 1 AS v UNION ALL SELECT 2 UNION ALL SELECT 10) t", 2.0),
    ("RATIO_TO_REPORT", "SELECT ROUND(RATIO_TO_REPORT(v) OVER (), 2) AS r FROM (SELECT 1 AS v UNION ALL SELECT 3) t ORDER BY r LIMIT 1", 0.25),
    ("CONDITIONAL_TRUE_EVENT", "SELECT CONDITIONAL_TRUE_EVENT(v > 1) OVER (ORDER BY i) AS r FROM (SELECT 1 AS i, 1 AS v UNION ALL SELECT 2, 5 UNION ALL SELECT 3, 5) t ORDER BY i DESC LIMIT 1", 2),
    ("COVAR_POP", "SELECT COVAR_POP(x, y) AS r FROM (SELECT 1 AS x, 2 AS y UNION ALL SELECT 2, 4) t", 0.5),
    ("CORR_FN", "SELECT CORR(x, y) AS r FROM (SELECT 1 AS x, 2 AS y UNION ALL SELECT 2, 4) t", 1.0),
    ("REGR_SLOPE", "SELECT REGR_SLOPE(y, x) AS r FROM (SELECT 1 AS x, 2 AS y UNION ALL SELECT 2, 4) t", 2.0),
    ("BOOLAND_AGG", "SELECT BOOLAND_AGG(v) AS r FROM (SELECT TRUE AS v UNION ALL SELECT FALSE) t", False),
    # ---- misc
    ("GREATEST_IGNORE_NULLS", "SELECT GREATEST_IGNORE_NULLS(1, NULL, 3) AS r", 3),
    ("LEAST_IGNORE_NULLS", "SELECT LEAST_IGNORE_NULLS(1, NULL, 3) AS r", 1),
    ("LIKE_ANY", "SELECT 'abc' LIKE ANY ('x%', 'a%') AS r", True),
    ("LIKE_ALL", "SELECT 'abc' LIKE ALL ('a%', '%c') AS r", True),
    ("ILIKE_OP", "SELECT 'ABC' ILIKE 'abc' AS r", True),
    ("RLIKE_3ARG", "SELECT RLIKE('abc', 'a.c') AS r", True),
    ("SYSDATE_TYPE", "SELECT SYSDATE() IS NOT NULL AS r", True),
    ("RANDSTR_LEN", "SELECT LENGTH(RANDSTR(8, 42)) AS r", 8),
    ("RANDSTR_DET", "SELECT RANDSTR(8, 42) = RANDSTR(8, 42) AS r", True),
]


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    from dbt_icebreaker_spark import IcebreakerEngine, get_spark

    spark = get_spark(app_name="probe_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    eng = IcebreakerEngine(spark, schema="probe_t")
    npass = nfail = 0
    for name, sql, want in CASES:
        if filt and filt.lower() not in name.lower():
            continue
        try:
            rows = eng.execute(sql).collect()
            got = rows[0][0] if rows else "<no rows>"
            if isinstance(got, float) and isinstance(want, (int, float)) and want is not None:
                ok = abs(got - float(want)) < 1e-9
            elif name == "KURTOSIS":
                ok = got is not None  # presence probe only
            else:
                ok = got == want
            if ok:
                npass += 1
            else:
                nfail += 1
                print(f"MISMATCH {name}: got {got!r} want {want!r}")
        except Exception as e:
            nfail += 1
            msg = str(e).split("\n")[0][:160]
            print(f"ERROR    {name}: {msg}")
    print(f"\n{npass} pass, {nfail} fail of {npass + nfail}")
    spark.stop()


if __name__ == "__main__":
    main()
