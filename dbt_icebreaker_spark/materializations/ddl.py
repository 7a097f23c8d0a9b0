"""DDL surface (SURVEY §2.2 M5; ref impl.py:440-529,
macros/adapters.sql:18-94) plus M7 schema-name generation
(adapters.sql:9-16)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


def clear_orphaned_location(spark: SparkSession, qualified_name: str) -> None:
    """A managed table's directory can outlive its catalog entry (each
    process is a fresh in-memory metastore over the persistent
    warehouse dir); ``saveAsTable`` / ``ALTER TABLE RENAME`` then fail
    with LOCATION_ALREADY_EXISTS. If the catalog does NOT know the
    table but its conventional managed location exists, the dir is
    orphaned — remove it so CREATE OR REPLACE semantics hold."""
    import os
    import shutil
    from urllib.parse import urlparse

    if spark.catalog.tableExists(qualified_name):
        return  # mode("overwrite") handles a live table itself
    parts = qualified_name.split(".")
    if len(parts) != 2:
        return
    db, tbl = parts
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if not wh:
        return
    loc = os.path.join(wh, f"{db}.db", tbl)
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def generate_schema_name(target_schema: str, custom_schema: str | None = None) -> str:
    """M7: `target_schema` or `target_schema + "_" + custom_schema`
    (ref macros/adapters.sql:9-16, mirrored in connections.py:378-409).
    """
    if custom_schema:
        return f"{target_schema}_{custom_schema.strip()}"
    return target_schema


@dataclass
class Ddl:
    spark: SparkSession

    def create_schema(self, schema: str) -> None:
        # ref impl.py:478-482
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema}")

    def drop_schema(self, schema: str, cascade: bool = True) -> None:
        # ref impl.py:484-488 (DROP SCHEMA … CASCADE)
        suffix = " CASCADE" if cascade else ""
        self.spark.sql(f"DROP DATABASE IF EXISTS {schema}{suffix}")

    def drop_relation(self, schema: str, identifier: str, kind: str = "table") -> None:
        # ref impl.py:490-494, adapters.sql:59-61 (typed DROP IF EXISTS)
        kw = "VIEW" if kind.lower() == "view" else "TABLE"
        self.spark.sql(f"DROP {kw} IF EXISTS {schema}.{identifier}")

    def truncate(self, schema: str, identifier: str) -> None:
        # ref impl.py:496-500: truncate implemented as DELETE FROM;
        # Spark supports TRUNCATE TABLE on managed tables
        self.spark.sql(f"TRUNCATE TABLE {schema}.{identifier}")

    def rename(self, schema: str, old: str, new: str) -> None:
        # ref impl.py:502-506 (ALTER TABLE … RENAME TO)
        self.spark.sql(f"ALTER TABLE {schema}.{old} RENAME TO {schema}.{new}")

    def list_schemas(self) -> list[str]:
        # ref impl.py:516-520
        return [d.name for d in self.spark.catalog.listDatabases()]

    def list_relations(self, schema: str) -> list[tuple[str, str]]:
        # ref impl.py:451-476 → (name, type)
        out = []
        for t in self.spark.catalog.listTables(schema):
            out.append((t.name, (t.tableType or "table").lower()))
        return out

    def list_columns(self, schema: str, identifier: str) -> list[tuple[str, str]]:
        # ref impl.py:440-449 (information_schema introspection)
        return [
            (c.name, c.dataType)
            for c in self.spark.catalog.listColumns(f"{schema}.{identifier}")
        ]

    def table_exists(self, schema: str, identifier: str) -> bool:
        return self.spark.catalog.tableExists(f"{schema}.{identifier}")


def configure_writer(
    writer,
    partition_by=None,
    clustered_by=None,
    buckets=None,
):
    """Apply layout options to a DataFrameWriter — shared by the table
    and incremental materializations so partitioning AND bucketing
    survive every rewrite path (a bucketed table silently degrading to
    unbucketed after one merge would lose the zero-Exchange join
    property nobody re-checks)."""
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if clustered_by and buckets:
        cols = [clustered_by] if isinstance(clustered_by, str) else list(clustered_by)
        writer = writer.bucketBy(buckets, *cols).sortBy(*cols)
    elif bool(clustered_by) != bool(buckets):
        raise ValueError("clustered_by and buckets must be set together")
    return writer
