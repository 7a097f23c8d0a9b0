"""Per-query profiler for the bench headline set (guide §1).

For each bench query: time the DataFrame build (transpile + analysis)
separately from execution (same .count() action as bench.py), count
the Spark jobs each execution launches, and dump .explain("formatted")
to plans/r13/<name>_<tag>.txt.

Usage: python scripts/profile_bench.py <tag> [name_filter...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
FILTERS = sys.argv[2:]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"))


def main() -> None:
    import bench
    from dbt_icebreaker_spark import queries as corpus
    from dbt_icebreaker_spark.session import get_spark
    from dbt_icebreaker_spark.sources import register_dir

    os.makedirs(PLAN_DIR, exist_ok=True)
    input_bytes = bench._dir_bytes(SF_DIR)
    shuffle = max(4, min(2048, input_bytes // (32 * 1024 * 1024)))
    adaptive = "true" if input_bytes >= 4 * 1024**3 else "false"
    spark = get_spark(
        app_name="profile_bench",
        shuffle_partitions=int(shuffle),
        extra_conf={"spark.sql.adaptive.enabled": adaptive},
    )
    register_dir(spark, SF_DIR)
    # same warmups as bench.py
    spark.sql("SELECT COUNT(*) FROM lineitem").collect()
    spark.sql(
        "SELECT o_orderpriority, COUNT(*), SUM(l_quantity) FROM orders "
        "JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority"
    ).collect()
    spark.sql(
        "SELECT * FROM (SELECT doc_id, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id % 7 ORDER BY doc_id) rn FROM documents) WHERE rn = 1"
    ).collect()
    spark.sql(
        "SELECT w, COUNT(*) FROM (SELECT explode(split(text, ' ')) w "
        "FROM documents LIMIT 2000) GROUP BY w ORDER BY 2 DESC LIMIT 5"
    ).collect()

    qs = corpus.queries()
    names = [n for n in bench.BENCH_QUERIES
             if not FILTERS or any(f in n for f in FILTERS)]
    st = spark.sparkContext.statusTracker()
    results = {}
    for name in names:
        fn = qs[name]
        best_build = best_exec = None
        jobs = 0
        for rep in range(3):
            group = f"{name}-{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            n = df.count()
            t2 = time.time()
            spark.sparkContext.setJobGroup(None, None)
            jobs = len(st.getJobIdsForGroup(group))
            b, e = t1 - t0, t2 - t1
            best_build = b if best_build is None else min(best_build, b)
            best_exec = e if best_exec is None else min(best_exec, e)
            if rep == 0:
                try:
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"))
                except Exception:
                    from contextlib import redirect_stdout
                    import io
                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w") as f:
                    f.write(plan)
        results[name] = {
            "build_s": round(best_build, 3),
            "exec_s": round(best_exec, 3),
            "total_s": round(best_build + best_exec, 3),
            "jobs_last_rep": jobs,
            "rows": n,
        }
        print(f"# {name}: build={best_build:.3f} exec={best_exec:.3f} "
              f"jobs={jobs} rows={n}", file=sys.stderr)

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
