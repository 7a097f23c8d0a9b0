"""DuckDB side of the bench head-to-head: run the SAME oracle SQL for
bench.py's headline queries over the same parquet, same machine, and
print one JSON line — so the Spark-vs-DuckDB ratio in BASELINE.md is
reproducible instead of an ad-hoc measurement.

Usage: python scripts/bench_oracle.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    import duckdb

    from bench import BENCH_QUERIES
    from dbt_icebreaker_spark import queries as corpus

    oracles = corpus.oracle_sql()
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    times: dict[str, float] = {}
    missing = [n for n in BENCH_QUERIES if n not in oracles]
    for name in BENCH_QUERIES:
        if name in missing:
            continue
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            duck.execute(oracles[name]).fetchall()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total_sec",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR,
                "reps": REPS,
                "agg": "min",
                "missing_oracle": missing,
            }
        )
    )


if __name__ == "__main__":
    main()
