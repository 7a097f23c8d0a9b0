"""r14 probe: where does x14_dedup_clusters' build time go?

Times, per rep: minhash_lsh_pairs build (driver), the CC loop (per
round: SQL analysis + observed-checkpoint job), comp construction, and
the final count. Run on the same session confs as bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from dbt_icebreaker_spark.session import get_spark
    from dbt_icebreaker_spark.sources import register_dir
    from dbt_icebreaker_spark.xops import dedup

    input_bytes = bench._dir_bytes(SF_DIR)
    shuffle = max(4, min(2048, input_bytes // (32 * 1024 * 1024)))
    spark = get_spark(
        app_name="probe_x14",
        shuffle_partitions=int(shuffle),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    register_dir(spark, SF_DIR)
    spark.sql("SELECT COUNT(*) FROM documents").collect()

    docs = spark.table("documents")
    for rep in range(3):
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
        t1 = time.time()
        stats = {}
        out = dedup.dedup_clusters(pairs, docs, "doc_id", stats=stats)
        t2 = time.time()
        n = out.count()
        t3 = time.time()
        print(f"rep{rep}: pairs_build={t1-t0:.3f} loop={t2-t1:.3f} "
              f"rounds={stats['rounds']} count={t3-t2:.3f} n={n}",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
