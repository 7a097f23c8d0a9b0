"""Round-5d execution probe: window-function seams. Snowflake window
semantics (IGNORE NULLS, frame defaults, windowed aggregates that Spark
only has as group aggregates) are a classic silent-wrong-answer class —
every case EXECUTES with an expected value.

Fixture: w(k, g, v) = (1,'a',10),(2,'a',NULL),(3,'a',30),(4,'b',40),
(5,'b',NULL). Usage: python scripts/probe_sweep_r5d.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_icebreaker_spark import get_spark
from dbt_icebreaker_spark.runner import IcebreakerEngine

FIXTURE = (
    "CREATE OR REPLACE TEMP VIEW w AS SELECT * FROM VALUES "
    "(1, 'a', 10.0), (2, 'a', CAST(NULL AS DOUBLE)), (3, 'a', 30.0), "
    "(4, 'b', 40.0), (5, 'b', CAST(NULL AS DOUBLE)) t(k, g, v)"
)

# (sql, expected list of first-column values ordered by k, or scalar)
CASES = [
    # IGNORE/RESPECT NULLS
    ("SELECT LAG(v) IGNORE NULLS OVER (ORDER BY k) AS r FROM w ORDER BY k",
     [None, 10.0, 10.0, 30.0, 40.0]),
    ("SELECT LEAD(v) IGNORE NULLS OVER (ORDER BY k) AS r FROM w ORDER BY k",
     [30.0, 30.0, 40.0, None, None]),
    ("SELECT LAST_VALUE(v) IGNORE NULLS OVER (ORDER BY k "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r FROM w ORDER BY k",
     [10.0, 10.0, 30.0, 40.0, 40.0]),
    ("SELECT FIRST_VALUE(v) IGNORE NULLS OVER (PARTITION BY g ORDER BY k) "
     "AS r FROM w ORDER BY k", [10.0, 10.0, 10.0, 40.0, 40.0]),
    ("SELECT NTH_VALUE(v, 2) FROM FIRST IGNORE NULLS OVER (ORDER BY k "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS r "
     "FROM w ORDER BY k LIMIT 1", [30.0]),
    # windowed aggregates Snowflake allows
    ("SELECT MEDIAN(v) OVER (PARTITION BY g) AS r FROM w ORDER BY k",
     [20.0, 20.0, 20.0, 40.0, 40.0]),
    ("SELECT MODE(g) OVER () AS r FROM w ORDER BY k LIMIT 1", ["a"]),
    ("SELECT LISTAGG(g, ',') WITHIN GROUP (ORDER BY k) OVER () AS r "
     "FROM w ORDER BY k LIMIT 1", ["a,a,a,b,b"]),
    ("SELECT COUNT_IF(v > 15) OVER (PARTITION BY g) AS r FROM w ORDER BY k",
     [1, 1, 1, 1, 1]),
    ("SELECT RATIO_TO_REPORT(v) OVER (PARTITION BY g) AS r FROM w ORDER BY k",
     [0.25, None, 0.75, 1.0, None]),
    # frames
    ("SELECT SUM(v) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND "
     "1 FOLLOWING) AS r FROM w ORDER BY k",
     [10.0, 40.0, 70.0, 70.0, 40.0]),
    ("SELECT SUM(v) OVER (ORDER BY k RANGE BETWEEN 1 PRECEDING AND "
     "CURRENT ROW) AS r FROM w ORDER BY k",
     [10.0, 10.0, 30.0, 70.0, 40.0]),
    ("SELECT AVG(v) OVER (PARTITION BY g ORDER BY k ROWS UNBOUNDED "
     "PRECEDING) AS r FROM w ORDER BY k",
     [10.0, 10.0, 20.0, 40.0, 40.0]),
    # cumulative distribution family
    ("SELECT CUME_DIST() OVER (ORDER BY k) AS r FROM w ORDER BY k LIMIT 1",
     [0.2]),
    ("SELECT PERCENT_RANK() OVER (ORDER BY k) AS r FROM w ORDER BY k LIMIT 1",
     [0.0]),
    # LAG with default, negative offset LEAD
    ("SELECT LAG(v, 1, -1) OVER (ORDER BY k) AS r FROM w ORDER BY k",
     [-1.0, 10.0, None, 30.0, 40.0]),
    ("SELECT LAG(k, -1) OVER (ORDER BY k) AS r FROM w ORDER BY k",
     [2, 3, 4, 5, None]),
    # GROUP BY ALL + QUALIFY together
    ("SELECT g, COUNT(*) AS n FROM w GROUP BY ALL QUALIFY "
     "ROW_NUMBER() OVER (ORDER BY g) = 1", ["a"]),
    # PERCENTILE as window
    ("SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY v) OVER "
     "(PARTITION BY g) AS r FROM w ORDER BY k LIMIT 1", [20.0]),
]


def main():
    spark = get_spark(app_name="probe_r5d")
    eng = IcebreakerEngine(spark, schema="probe_r5d")
    spark.sql(FIXTURE)
    ok = bad = 0
    for sql, expect in CASES:
        try:
            rows = eng.execute(sql).collect()
            got = [r[0] for r in rows]
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"FAIL  {sql[:84]}")
            print(f"      -> {str(e).splitlines()[0][:150]}")
            continue
        norm = [round(x, 9) if isinstance(x, float) else x for x in got]
        want = [round(x, 9) if isinstance(x, float) else x
                for x in (expect if isinstance(expect, list) else [expect])]
        if norm == want:
            ok += 1
        else:
            bad += 1
            print(f"WRONG {sql[:84]}")
            print(f"      -> got {norm!r}, want {want!r}")
    print(f"\n{ok} ok, {bad} bad of {len(CASES)}")
    spark.stop()


if __name__ == "__main__":
    main()
