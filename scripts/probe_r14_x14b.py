"""r14 probe: per-round breakdown of the x14 CC loop — temp-view
registration, spark.sql analysis, eager-checkpoint job, Observation
read. Replicates dedup_clusters internals verbatim."""
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from dbt_icebreaker_spark.session import get_spark
    from dbt_icebreaker_spark.sources import register_dir
    from dbt_icebreaker_spark.xops import dedup

    input_bytes = bench._dir_bytes(SF_DIR)
    shuffle = max(4, min(2048, input_bytes // (32 * 1024 * 1024)))
    spark = get_spark(
        app_name="probe_x14b",
        shuffle_partitions=int(shuffle),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    register_dir(spark, SF_DIR)
    spark.sql("SELECT COUNT(*) FROM documents").collect()
    docs = spark.table("documents")

    for rep in range(3):
        pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
        e = (
            pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .localCheckpoint(eager=False)
        )
        view = f"__cc_edges_{uuid.uuid4().hex[:12]}"
        round_sql = f"""
        WITH ls AS (
          SELECT dst AS src, m AS dst FROM (
            SELECT src, dst, LEAST(MIN(dst) OVER (PARTITION BY src), src) AS m
            FROM (SELECT src, dst FROM {view}
                  UNION ALL
                  SELECT dst AS src, src AS dst FROM {view})
          ) WHERE dst > src AND dst <> m
        )
        SELECT e.s AS src, e.m AS dst
        FROM (
          SELECT src, dst,
                 MIN(dst) OVER (PARTITION BY src) AS m,
                 ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn
          FROM (SELECT GREATEST(src, dst) AS src, LEAST(src, dst) AS dst
                FROM ls)
        )
        LATERAL VIEW explode(CASE WHEN rn = 1
            THEN array(named_struct('s', dst, 'm', m),
                       named_struct('s', src, 'm', m))
            ELSE array(named_struct('s', dst, 'm', m)) END) t AS e
        WHERE e.s <> e.m
        """
        edges = e
        prev = None
        for i in range(20):
            t0 = time.time()
            edges.createOrReplaceTempView(view)
            t1 = time.time()
            df = spark.sql(round_sql)
            t2 = time.time()
            obs = Observation(f"r{rep}_{i}")
            ck = df.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum("src").alias("s"),
                F.sum("dst").alias("d"),
            ).localCheckpoint(eager=True)
            t3 = time.time()
            m = obs.get
            t4 = time.time()
            cur = (m["n"], m["s"], m["d"])
            print(f"rep{rep} round{i}: view={t1-t0:.3f} sql={t2-t1:.3f} "
                  f"ckpt_job={t3-t2:.3f} obs={t4-t3:.3f} n={m['n']}",
                  file=sys.stderr)
            edges = ck
            if cur == prev:
                break
            prev = cur
        spark.catalog.dropTempView(view)
    spark.stop()


if __name__ == "__main__":
    main()
