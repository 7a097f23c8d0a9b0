"""r14 probe: q63_merge_statement phase breakdown — CREATE DATABASE,
CTAS, the MERGE (batch count / union+staged write / renames+drops),
final count. Instruments by monkey-timing the incremental internals.
"""
import os
import sys
import time
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from dbt_icebreaker_spark.session import get_spark
    from dbt_icebreaker_spark.sources import register_dir
    from dbt_icebreaker_spark.runner import IcebreakerEngine
    from dbt_icebreaker_spark.materializations import incremental as inc

    input_bytes = bench._dir_bytes(SF_DIR)
    shuffle = max(4, min(2048, input_bytes // (32 * 1024 * 1024)))
    spark = get_spark(
        app_name="probe_q63",
        shuffle_partitions=int(shuffle),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    register_dir(spark, SF_DIR)
    spark.sql("SELECT COUNT(*) FROM orders").collect()

    # time _staged_overwrite internals via wrapper
    orig_staged = inc._staged_overwrite

    def timed_staged(spark_, df, target, partition_by=None,
                     clustered_by=None, buckets=None, size_coalesce=True):
        # mirrors incremental._staged_overwrite with phase timers —
        # keep in sync (r14: size-targeted coalesce + partition probe)
        from dbt_icebreaker_spark.materializations.ddl import configure_writer
        from dbt_icebreaker_spark.materializations.incremental import (
            _is_partitioned, _size_coalesced, _swap_names,
            _sync_partitions, clear_orphaned_location)
        staging, backup = _swap_names(target)
        t0 = time.time()
        for t in (staging, backup):
            spark_.sql(f"DROP TABLE IF EXISTS {t}")
            clear_orphaned_location(spark_, t)
        t1 = time.time()
        if size_coalesce:
            df = _size_coalesced(df)
        writer = configure_writer(
            df.write.mode("overwrite"), partition_by, clustered_by, buckets)
        writer.saveAsTable(staging)
        t2 = time.time()
        if spark_.catalog.tableExists(target):
            spark_.sql(f"ALTER TABLE {target} RENAME TO {backup}")
            if _is_partitioned(spark_, backup) is not False:
                _sync_partitions(spark_, backup)
        spark_.sql(f"ALTER TABLE {staging} RENAME TO {target}")
        if partition_by:
            _sync_partitions(spark_, target)
        t3 = time.time()
        spark_.sql(f"DROP TABLE IF EXISTS {backup}")
        t4 = time.time()
        print(f"  staged: pre_drops={t1-t0:.3f} write={t2-t1:.3f} "
              f"renames={t3-t2:.3f} final_drop={t4-t3:.3f}",
              file=sys.stderr)
    inc._staged_overwrite = timed_staged
    import dbt_icebreaker_spark.materializations.merge_stmt as ms
    ms_staged = ms
    for rep in range(3):
        base = tempfile.mkdtemp(prefix="q63p_")
        db = f"q63p_{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        spark.sql(f"CREATE DATABASE {db} LOCATION '{base}/wh'")
        t1 = time.time()
        eng = IcebreakerEngine(spark, schema=db)
        spark.sql(
            f"CREATE TABLE {db}.m_target AS "
            "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
            "FROM orders WHERE o_orderkey <= 10000"
        )
        t2 = time.time()
        eng.execute(
            f"""
            MERGE INTO {db}.m_target t
            USING (
                SELECT o_orderkey, o_custkey, o_orderstatus,
                       o_totalprice * 2 AS o_totalprice
                FROM orders WHERE o_orderkey > 5000 AND o_orderkey <= 15000
            ) s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """
        )
        t3 = time.time()
        n = spark.table(f"{db}.m_target").count()
        t4 = time.time()
        print(f"rep{rep}: create_db={t1-t0:.3f} ctas={t2-t1:.3f} "
              f"merge={t3-t2:.3f} count={t4-t3:.3f} n={n}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
