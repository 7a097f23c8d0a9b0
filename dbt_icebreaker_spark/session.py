"""SparkSession factory (SURVEY §7.1 step 1).

Mirror of the reference's single shared engine handle
(`connections.py:1057-1169`: one class-level DuckDB connection shared
across dbt threads) — here, one SparkSession shared by all model
threads; Spark sessions are thread-safe.

Scale posture: these defaults are written for a real cluster even
though tests run local[32] —
- AQE on (runtime re-plan, skew-join splitting, partition coalescing),
- Arrow on (vectorized pandas interchange for the X-ops),
- shuffle partitions default to cores locally but should be set
  ~2-3× total executor cores on a cluster (pass shuffle_partitions),
- broadcast threshold left at Spark's default; the advisor
  (observability.advisor) emits explicit broadcast() hints instead.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "spark-icebreaker",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    warehouse_dir: Optional[str] = None,
    extra_conf: Optional[dict[str, str]] = None,
) -> SparkSession:
    """Create (or fetch) the shared SparkSession."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) is unreadable by Spark's vectorized
        # reader; read as long and convert in sources.read_parquet
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={warehouse_dir}/derby",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
