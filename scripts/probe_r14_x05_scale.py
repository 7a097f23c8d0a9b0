"""r14 scale smoke for x05/embedding_neardup_pairs (VERDICT r13 #1):
replicate the sf0.1 embeddings N× into a SINGLE input partition (the
few-large-files arrival shape), then time the all-pairs cosine join
WITH the stream-side repartition (the shipped path — the r14 width
gate fires because 1 < defaultParallelism) and WITHOUT it (the
pre-r13 single-task shape, inlined here for the A/B).

Usage: python scripts/probe_r14_x05_scale.py [replicas]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from dbt_icebreaker_spark.session import get_spark
    from dbt_icebreaker_spark.sources import read_parquet
    from dbt_icebreaker_spark.xops import dedup

    # adaptive=false mirrors the bench session below 4 GB input; with
    # AQE on at this toy size the runtime stats (1.6 MB shuffle) demote
    # the join to a broadcast of the REPARTITIONED side, leaving the
    # stream side single-task — at a real 100 TB the stats are far past
    # every broadcast threshold and the exchange survives.
    spark = get_spark(app_name="x05-scale-smoke", shuffle_partitions=32,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    emb1 = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter(F.col("vec_id") < 300)
    rep = spark.range(REPLICAS).withColumnRenamed("id", "r")
    embN = (
        emb1.crossJoin(rep)
        .select((F.col("vec_id") * REPLICAS + F.col("r")).alias("vec_id"),
                "embedding")
        .coalesce(1)          # the single-input-split arrival shape
        .localCheckpoint()    # time the op, not the replication
    )
    n = embN.count()
    print(f"# vectors: {n}, input partitions: {embN.rdd.getNumPartitions()}",
          file=sys.stderr)

    def pairs_no_repartition(df, id_col, vec_col, threshold):
        # embedding_neardup_pairs with the stream-side repartition
        # removed — the pre-r13 shape, for the A/B only
        v = df.select(
            F.col(id_col).alias("vid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        )
        v = v.withColumn(
            "norm",
            F.sqrt(F.aggregate(F.col("vec"), F.lit(0.0),
                               lambda acc, x: acc + x * x)),
        )
        a, b = v.alias("a"), v.alias("b")
        dot = F.aggregate(
            F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        return (
            a.join(b, F.col("a.vid") < F.col("b.vid"))
            .select(
                F.col("a.vid").cast("long").alias("vec_a"),
                F.col("b.vid").cast("long").alias("vec_b"),
                (dot / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    def timed(label, make, reps=2):
        best = None
        for _ in range(reps):
            df = make()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(json.dumps({"arm": label, "replicas": REPLICAS,
                          "vectors": n, "sec": round(best, 2)}))

    timed("with_repartition(shipped)",
          lambda: dedup.embedding_neardup_pairs(embN, "vec_id", "embedding",
                                                threshold=0.35))
    timed("without_repartition",
          lambda: pairs_no_repartition(embN, "vec_id", "embedding", 0.35))
    spark.stop()


if __name__ == "__main__":
    main()
