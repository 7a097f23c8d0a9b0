"""r14 probe: stage-by-stage exec cost of the x02 minhash pipeline.

Times noop-sink materializations of successive prefixes of the
pipeline (guide §1.4): shingles -> signatures -> bands -> window ->
full pairs, min of 3 reps each.
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
        app_name="probe_x02",
        shuffle_partitions=int(shuffle),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    register_dir(spark, SF_DIR)
    spark.sql("SELECT COUNT(*) FROM documents").collect()
    docs = spark.table("documents")

    def timeit(label, make):
        best = None
        for _ in range(3):
            df = make()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(f"{label}: {best:.3f}", file=sys.stderr)

    par = spark.sparkContext.defaultParallelism

    timeit("scan_only", lambda: docs.select("doc_id", "text"))
    timeit("shingles", lambda: dedup.word_shingles(docs, "doc_id", "text", k=3))
    timeit("signatures", lambda: dedup.minhash_signatures(docs, "doc_id", "text"))
    timeit(
        "bands",
        lambda: dedup.band_keys(
            dedup.minhash_signatures(docs, "doc_id", "text"), "doc_id"
        ),
    )
    timeit(
        "pairs_full",
        lambda: dedup.minhash_lsh_pairs(docs, "doc_id", "text"),
    )
    # signature agg without md5: isolate hashing cost
    from pyspark.sql import functions as F
    sh = dedup.word_shingles(docs, "doc_id", "text", k=3)
    timeit(
        "sig_no_md5",
        lambda: sh.groupBy("doc_id").agg(
            *[F.min(F.concat_ws(":", F.lit(i), F.col("shingle"))).alias(str(i))
              for i in range(8)]
        ),
    )
    timeit(
        "sig_1hash",
        lambda: sh.groupBy("doc_id").agg(
            F.min(F.md5(F.concat_ws(":", F.lit(0), F.col("shingle")))).alias("0")
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
