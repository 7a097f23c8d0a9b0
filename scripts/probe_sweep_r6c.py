"""Round-6c execution probe: implicit coercion + operator seams
(string↔number comparison, date arithmetic, concatenation coercion,
LIKE escapes, boolean casts). Silent-wrong-answer class: both engines
have implicit casts, but the RULES differ per pair.

Usage: python scripts/probe_sweep_r6c.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark import get_spark
from dbt_icebreaker_spark.runner import IcebreakerEngine

CASES = [
    # string <-> number comparison coerces numerically
    ("SELECT '05' = 5 AS r", [True]),
    # NOTE: '5.0' = 5 errors loudly (Spark casts the string to the
    # INT side; Snowflake coerces both to NUMBER) — documented
    # deviation, not silent: a static transpiler cannot know operand
    # types to force double-sided numeric casts
    ("SELECT 5 || 'x' AS r", ["5x"]),
    ("SELECT 'v' || 7 || TRUE AS r", ["v7true"]),
    # date arithmetic: date ± int = date
    ("SELECT ('2024-01-01'::DATE + 5)::STRING AS r", ["2024-01-06"]),
    ("SELECT ('2024-01-06'::DATE - 5)::STRING AS r", ["2024-01-01"]),
    ("SELECT ('2024-01-06'::DATE - '2024-01-01'::DATE) AS r", [5]),
    ("SELECT ('2024-01-01'::DATE + INTERVAL '2 DAYS')::STRING AS r",
     ["2024-01-03"]),  # DATE + day interval stays DATE (both engines)
    # boolean casts
    ("SELECT TRUE::INT AS r", [1]),
    ("SELECT 1::BOOLEAN AS r", [True]),
    ("SELECT 'true'::BOOLEAN AS r", [True]),
    ("SELECT TO_BOOLEAN('yes') AS r", [True]),
    ("SELECT TO_BOOLEAN('0') AS r", [False]),
    # LIKE escapes
    ("SELECT '50%' LIKE '50\\\\%' AS r", [True]),
    ("SELECT 'a_c' LIKE 'a!_c' ESCAPE '!' AS r", [True]),
    ("SELECT 'abc' LIKE 'a%' AS r", [True]),
    ("SELECT 'ABC' ILIKE 'a%' AS r", [True]),
    # NULL-safe operators
    ("SELECT NULL <=> NULL AS r", [True]),
    ("SELECT 1 IS DISTINCT FROM NULL AS r", [True]),
    ("SELECT NULLIF(3, 3) AS r", [None]),
    # numeric seams
    ("SELECT 7 % -3 AS r", [1]),       # sign of dividend
    ("SELECT -7 % 3 AS r", [-1]),
    ("SELECT FLOOR(-1.5) AS r", [-2]),
    ("SELECT CEIL(-1.5) AS r", [-1]),
    ("SELECT ROUND(-2.5) AS r", [-3]),  # half away from zero
]


def main():
    spark = get_spark(app_name="probe_r6c")
    eng = IcebreakerEngine(spark, schema="probe_r6c")
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
        if norm == expect:
            ok += 1
        else:
            bad += 1
            print(f"WRONG {sql[:100]}")
            print(f"      -> got {norm!r}, want {expect!r}")
    print(f"\n{ok} ok, {bad} bad of {len(CASES)}")
    spark.stop()


if __name__ == "__main__":
    main()
