"""Table maintenance (scale extension — the reference delegates file
layout to its warehouses; on a self-managed lake the engine owns it).

Small-file compaction is the 100 TB maintenance op every
incremental/streaming table eventually needs: every micro-batch merge
and append writes at least one file per shuffle partition, and a
table accumulating thousands of KB-sized files pays per-file open
cost, footer reads, and scheduler overhead on every scan. Compaction
rewrites the table into ~target-sized files through the SAME
crash-safe staged swap the incremental engine uses (backup rename →
staging rename → drop), preserving partition/bucket layout.

Sizing note: the file count target derives from the MEASURED table
bytes (catalog location walk), not row counts — the same
payload-not-rows principle as multimodal.repartition_for_payloads.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import SparkSession

from .incremental import _staged_overwrite


def table_location(spark: SparkSession, target: str) -> Optional[str]:
    """Filesystem path of a cataloged table (None for non-path
    tables)."""
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {target}").collect()
    except Exception:
        return None
    for r in rows:
        if (r.col_name or "").strip() == "Location":
            loc = r.data_type
            # file:/p, file:///p — os.path tolerates repeated slashes
            return loc[5:] if loc.startswith("file:") else loc
    return None


def table_layout(
    spark: SparkSession, target: str
) -> tuple[list[str], list[str], Optional[int]]:
    """(partition_cols, bucket_cols, num_buckets) from the catalog —
    so maintenance rewrites can PRESERVE layout without the caller
    restating it (a compaction that silently unpartitions a table is
    data-loss-adjacent: the next insert_overwrite run would
    dynamic-overwrite the whole table)."""
    import re as _re

    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {target}").collect()
    except Exception:
        return [], [], None
    part_cols: list[str] = []
    bucket_cols: list[str] = []
    buckets: Optional[int] = None
    in_part = False
    for r in rows:
        name = (r.col_name or "").strip()
        if name == "# Partition Information":
            in_part = True
            continue
        if in_part:
            if name == "# col_name" or name == "":
                in_part = name != ""
                continue
            if name.startswith("#"):
                in_part = False
            else:
                part_cols.append(name)
                continue
        if name == "Num Buckets":
            try:
                buckets = int(r.data_type)
            except (TypeError, ValueError):
                buckets = None
        elif name == "Bucket Columns":
            bucket_cols = _re.findall(r"`([^`]+)`", r.data_type or "")
    return part_cols, bucket_cols, buckets


def _scan_files(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a table location — one
    shared walker (sources.iter_data_files) for all size accounting."""
    from ..sources import iter_data_files

    n = total = 0
    for _p, size in iter_data_files(path):
        n += 1
        total += size
    return n, total


def zorder_key(df, cols: Sequence[str], bits: int = 8):
    """Z-order (Morton) key column over 2+ numeric columns — the
    multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE
    ZORDER. Each column is linearly scaled to ``bits`` bits via
    broadcast min/max (one tiny aggregate — no per-column global
    sort), then the bit planes are interleaved JVM-side (pure
    shift/or arithmetic, whole-stage codegen). Sorting/range-
    partitioning by the key co-locates rows that are close in EVERY
    dimension, so per-file min/max stats narrow on all of them at
    once and multi-column predicates skip files that a single-column
    sort could not.

    Returns (df_with_key, key_col_name). NULLs scale to 0 (first
    files), matching the null-first convention of range layout."""
    from pyspark.sql import functions as F

    max_v = (1 << bits) - 1
    agg = df.agg(
        *[f(c).cast("double").alias(f"__{n}_{c}")
          for c in cols for f, n in ((F.min, "mn"), (F.max, "mx"))]
    )
    out = df.crossJoin(F.broadcast(agg))
    scaled = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled.append(
            F.coalesce(
                F.floor((F.col(c).cast("double") - mn) / span * max_v)
                .cast("bigint"),
                F.lit(0),
            )
        )
    k = len(cols)
    z = F.lit(0).cast("bigint")
    for bit in range(bits):
        for j, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, bit).bitwiseAND(F.lit(1)),
                            bit * k + j)
            )
    out = out.withColumn("__zvalue", z).drop(
        *[f"__{n}_{c}" for c in cols for n in ("mn", "mx")]
    )
    return out, "__zvalue"


def cluster_by_zorder(df, cols: Sequence[str], num_files: int):
    """Range-partition by the z-order key into ``num_files`` output
    partitions (→ files on write). One range exchange total."""
    keyed, key = zorder_key(df, cols)
    return keyed.repartitionByRange(num_files, key).drop(key)


def compact_table(
    spark: SparkSession,
    target: str,
    target_file_mb: int = 128,
    partition_by: Optional[str] = None,
    clustered_by: str | Sequence[str] | None = None,
    buckets: Optional[int] = None,
    min_files: int = 2,
) -> dict:
    """Rewrite ``target`` into ~``target_file_mb``-sized files.

    Skips (no-op stats) when the table already has fewer than
    ``min_files`` files or is already at/under the target count —
    compaction must be safe to run on a schedule without rewriting
    healthy tables. Bucketed tables keep their bucket spec (the file
    count is then buckets-driven; pass the original ``buckets`` /
    ``clustered_by``); partitioned tables compact per-partition via
    a partition-keyed repartition.
    """
    loc = table_location(spark, target)
    if loc is None or not os.path.exists(loc):
        raise ValueError(f"table {target} has no scannable location")
    # preserve catalog layout unless explicitly overridden — the
    # docstring's promise must not depend on the caller restating it
    cat_parts, cat_bucket_cols, cat_buckets = table_layout(spark, target)
    if partition_by is None and cat_parts:
        partition_by = cat_parts if len(cat_parts) > 1 else cat_parts[0]
    # adopt the catalog bucket spec only when it is COMPLETE and the
    # caller supplied no bucket opinion at all — a half-parsed spec
    # (cols without a count) must not abort the rewrite, and explicit
    # caller values are never clobbered
    if (
        clustered_by is None
        and buckets is None
        and cat_bucket_cols
        and cat_buckets
    ):
        clustered_by, buckets = cat_bucket_cols, cat_buckets
    files_before, total_bytes = _scan_files(loc)
    target_files = max(1, int(total_bytes // (target_file_mb * 1024 * 1024)) + 1)
    if files_before < min_files or files_before <= target_files:
        return {
            "action": "skipped",
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total_bytes,
        }
    df = spark.table(target)
    if buckets and clustered_by:
        # bucket spec dictates layout; staged writer re-applies it
        compacted = df
    elif partition_by:
        pcols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        compacted = df.repartition(target_files, *pcols)
    else:
        compacted = df.repartition(target_files)
    _staged_overwrite(
        spark, compacted, target, partition_by, clustered_by, buckets,
        # compaction sized its own output above (target_file_mb) — the
        # writer's estimate-based coalesce must not second-guess it
        size_coalesce=False,
    )
    new_loc = table_location(spark, target) or loc
    files_after, _ = _scan_files(new_loc)
    return {
        "action": "compacted",
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }
