"""CONNECT BY depth smoke (r8 VERDICT task 5): ORDER SIBLINGS BY
carries an array-of-structs sort key that grows O(depth) per row, and
NOCYCLE carries the full visited-ancestor array — measure both on
deep chains to find where they cliff.

Shape: W independent chains of depth D (id = chain*D + step), i.e.
W*D rows total — the bill-of-materials shape the verdict flags (org
charts are depth ~10; BOM chains are depth 10^3+).

Usage: python scripts/connect_by_depth_smoke.py [depths] [width]
  depths: comma list (default 100,1000,5000)
  width:  chains per depth (default 10)
Prints one JSON line per (depth, variant).

Round-10: the quadratic variants now carry a DEPTH GUARD (env
SPARK_GRAFT_CONNECT_BY_DEPTH_GUARD, default 2000) — at depth 5000 the
siblings/nocycle runs report {"guarded": true} with the actionable
USER_RAISED_EXCEPTION instead of dying in a raw JVM heap OOM; plain
CONNECT BY still completes (linear, no guard).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTHS = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                           else "100,1000,5000").split(",")]
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main() -> None:
    from pyspark.sql import SparkSession

    wh = "/tmp/cb_depth_wh"
    shutil.rmtree(wh, ignore_errors=True)
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # deep chains need the recursion level limit raised (default 100 —
    # Snowflake's MAX_RECURSIONS default; errors.py classifies the
    # limit error actionably naming this conf)
    spark.conf.set("spark.sql.cteRecursionLevelLimit",
                   str(max(DEPTHS) + 10))
    from dbt_icebreaker_spark.runner import IcebreakerEngine

    eng = IcebreakerEngine(spark, schema="cbd")

    for depth in DEPTHS:
        total = depth * WIDTH
        spark.sql(f"""
            CREATE OR REPLACE TEMP VIEW cb_chain AS
            SELECT id,
                   CASE WHEN id % {depth} = 0 THEN NULL
                        ELSE id - 1 END AS parent_id
            FROM RANGE({total})
        """)
        variants = {
            "plain": f"""
                SELECT COUNT(*) AS n, MAX(LEVEL) AS max_lvl
                FROM (
                  SELECT id, LEVEL FROM cb_chain
                  START WITH parent_id IS NULL
                  CONNECT BY PRIOR id = parent_id
                )
            """,
            "nocycle": f"""
                SELECT COUNT(*) AS n, MAX(LEVEL) AS max_lvl
                FROM (
                  SELECT id, LEVEL FROM cb_chain
                  START WITH parent_id IS NULL
                  CONNECT BY NOCYCLE PRIOR id = parent_id
                )
            """,
            "siblings": f"""
                SELECT COUNT(*) AS n, MAX(LEVEL) AS max_lvl
                FROM (
                  SELECT id, LEVEL FROM cb_chain
                  START WITH parent_id IS NULL
                  CONNECT BY PRIOR id = parent_id
                  ORDER SIBLINGS BY id
                )
            """,
        }
        for name, sql in variants.items():
            t0 = time.time()
            try:
                row = eng.execute(sql).collect()[0]
                elapsed = round(time.time() - t0, 2)
                print(json.dumps({
                    "depth": depth, "width": WIDTH, "variant": name,
                    "rows": row.n, "max_level": row.max_lvl,
                    "sec": elapsed,
                }), flush=True)
                assert row.n == total and row.max_lvl == depth
            except Exception as e:  # noqa: BLE001 - smoke reporting
                print(json.dumps({
                    "depth": depth, "width": WIDTH, "variant": name,
                    "guarded": "CONNECT BY depth guard" in str(e),
                    "error": str(e)[:200],
                    "sec": round(time.time() - t0, 2),
                }), flush=True)


if __name__ == "__main__":
    main()
