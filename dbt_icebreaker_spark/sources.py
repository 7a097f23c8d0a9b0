"""Source registration + Parquet source cache (SURVEY §2.1 S1–S3).

The reference caches warehouse tables as one local Parquet file per
table under ``~/.icebreaker/cache`` with a TTL'd JSON manifest
(`source_cache.py:100-153`), then registers DuckDB views over
``read_parquet(...)`` (`source_cache.py:389-426`). Here the same
design registers Spark temp views over parquet paths; the "warehouse
download" side (`source_cache.py:310-387`, Arrow batch streaming) is
abstracted behind a fetch callback since no live warehouse exists in
this environment.

At 100 TB the cache concept inverts: Spark *is* the scale-out engine,
so big sources are read in place (predicate pushdown + partition
pruning reach the parquet scan); the cache remains useful for small
dimension snapshots pinned local for broadcast joins.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from functools import lru_cache
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Runtime-settable SQL confs the engine requires on ANY session —
# including sessions it did not create (the correctness driver owns
# its own SparkSession and calls queries() with it, so the builder
# confs in session.py never apply there). Both are plain SQL confs
# that spark.conf.set accepts on a live session.
_SESSION_CONFS = {
    # parquet TIMESTAMP(NANOS) is otherwise PARQUET_TYPE_ILLEGAL for
    # Spark's reader; read as long and convert in read_parquet.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB oracles compare naive UTC timestamps.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply required runtime confs to an arbitrary session (idempotent,
    cheap: conf.get is a local lookup)."""
    for k, v in _SESSION_CONFS.items():
        try:
            current = spark.conf.get(k, None)
        except Exception:
            current = None
        if current != v:
            spark.conf.set(k, v)


def _mtime_token(path: str) -> tuple[int, int]:
    """Cheap change token: a rewrite at the same path (e.g.
    SourceCache.cache_table(force=True)) bumps the file's — or, for a
    parquet directory, the directory's — (mtime_ns, size),
    invalidating the footer cache below. Without it a long-lived
    session would keep a stale ns-column list and silently skip or
    misapply the ns→µs conversion after a refresh changes the schema.
    mtime_ns + size (not float seconds): coarse-mtime filesystems can
    rewrite within one second, and a schema change almost always
    changes the footer size too."""
    try:
        st = os.stat(path)
        return st.st_mtime_ns, st.st_size
    except OSError:
        return -1, -1


def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    return _nanos_timestamp_cols_cached(path, _mtime_token(path))


@lru_cache(maxsize=256)
def _nanos_timestamp_cols_cached(path: str, _token: tuple[int, int]) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them
    as long (spark.sql.legacy.parquet.nanosAsLong) and we convert.
    lru_cache keyed by (path, mtime): re-reading the footer per query
    costs a pyarrow open per table (bench floor), but the cache must
    not outlive a rewrite of the file."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return tuple(
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        )
    except Exception:
        return ()


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet + nanosecond-timestamp normalization (ns →
    microsecond TimestampType via integer div — same floor DuckDB's
    TIMESTAMP_NS → µs fetch applies). Works on sessions the engine did
    not create: required confs are applied at runtime first."""
    ensure_session_confs(spark)
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


# Keyed by applicationId (stable for the session's lifetime) — id(spark)
# can be reused by CPython after GC and false-hit the cache.
_registered: dict[tuple[str, str], str] = {}

# Spark's out-of-the-box value; an explicit user setting (anything
# else) is never overridden by autotune below.
_SPARK_DEFAULT_SHUFFLE = "200"


def iter_data_files(d: str):
    """(path, size) for every DATA file under ``d`` — metadata
    (_SUCCESS, .crc, hidden) skipped. The single directory walker
    shared by shuffle autotune and table maintenance, so filtering
    and error-handling fixes apply everywhere at once."""
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            try:
                yield p, os.path.getsize(p)
            except OSError:
                pass


def _dir_bytes(d: str) -> int:
    return sum(size for _p, size in iter_data_files(d))


def autotune_shuffle_partitions(spark: SparkSession, sf_dir: str) -> None:
    """Data-sized shuffle partitioning for sessions the engine did not
    create: ~32 MB of input per partition (floor 8, cap 2048) — the
    same sizing rule bench.py applies to its own session. 200 hash
    partitions over a few-MB dev directory costs ~25× the useful task
    count on every exchange (and range exchanges cannot rely on AQE
    coalescing, which plans post-shuffle only); on a TB-scale
    directory the same rule scales partitions UP. Applied only while
    the session still runs Spark's out-of-the-box default, so an
    explicit user/cluster setting always wins."""
    try:
        current = spark.conf.get("spark.sql.shuffle.partitions", _SPARK_DEFAULT_SHUFFLE)
    except Exception:
        return
    if current != _SPARK_DEFAULT_SHUFFLE:
        return
    target = max(8, min(2048, _dir_bytes(sf_dir) // (32 * 1024 * 1024)))
    spark.conf.set("spark.sql.shuffle.partitions", str(int(target)))


def register_dir(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every parquet table under sf_dir as a temp view (S1:
    ref source_cache.py:389-426 registers DuckDB views the same way).

    Idempotent per (session, dir): re-registration re-reads 10 parquet
    footers and re-runs analysis (~0.5 s) — cached away since corpus
    queries call this per query."""
    key = (spark.sparkContext.applicationId, ",".join(tables))
    if _registered.get(key) == sf_dir:
        return
    autotune_shuffle_partitions(spark, sf_dir)
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_parquet(spark, path).createOrReplaceTempView(name)
    _registered[key] = sf_dir


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


@dataclass
class CacheConfig:
    """Defaults mirror the reference: TTL 24 h, cap 10 GB
    (`source_cache.py:33-34`, `connections.py:128-130`)."""

    cache_dir: str = os.path.expanduser("~/.spark_icebreaker/cache")
    ttl_hours: float = 24.0
    max_gb: float = 10.0


@dataclass
class SourceCache:
    """Parquet source cache with TTL manifest (S2/S3).

    Manifest format mirrors `source_cache.py:100-119`: JSON dict
    ``{"db.schema.table": {"cached_at": epoch, "path": …, "bytes": n}}``.
    """

    spark: SparkSession
    config: CacheConfig = field(default_factory=CacheConfig)
    # fetch(db, schema, table) -> DataFrame pulled from the remote
    # warehouse; in tests this reads local parquet. Replaces the
    # Snowflake Arrow-batch download of source_cache.py:310-387.
    fetch: Optional[Callable[[str, str, str], DataFrame]] = None

    def _manifest_path(self) -> Path:
        return Path(self.config.cache_dir) / "manifest.json"

    def _load_manifest(self) -> dict:
        p = self._manifest_path()
        if p.exists():
            try:
                return json.loads(p.read_text())
            except json.JSONDecodeError:
                return {}
        return {}

    def _save_manifest(self, m: dict) -> None:
        p = self._manifest_path()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(m, indent=2))

    def _key(self, db: str, schema: str, table: str) -> str:
        return f"{db}.{schema}.{table}".lower()

    def _table_dir(self, db: str, schema: str, table: str) -> Path:
        return Path(self.config.cache_dir) / db.lower() / schema.lower() / f"{table.lower()}.parquet"

    def is_fresh(self, db: str, schema: str, table: str) -> bool:
        """TTL check (ref source_cache.py:134-153)."""
        entry = self._load_manifest().get(self._key(db, schema, table))
        if not entry:
            return False
        age_h = (time.time() - entry["cached_at"]) / 3600.0
        return age_h < self.config.ttl_hours and os.path.exists(entry["path"])

    @staticmethod
    def _downcast_variants(df: DataFrame) -> tuple[DataFrame, list[str]]:
        """VARIANT/OBJECT/ARRAY handling at ingest (S2: ref
        source_cache.py:224-308 wraps such columns in TO_VARCHAR so the
        cache holds JSON text). Spark equivalent: struct/map/array
        columns become to_json strings, so cached sources obey the
        engine's VARIANT-as-JSON-string model and `col:path::type`
        extraction works on them."""
        from pyspark.sql.types import ArrayType, MapType, StructType

        variant_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        for c in variant_cols:
            df = df.withColumn(c, F.to_json(F.col(c)))
        return df, variant_cols

    def cache_table(self, db: str, schema: str, table: str, force: bool = False) -> str:
        """Materialize a remote table to local snappy parquet (S2: ref
        source_cache.py:163-222). Returns the local path."""
        if not force and self.is_fresh(db, schema, table):
            return self._load_manifest()[self._key(db, schema, table)]["path"]
        if self.fetch is None:
            raise RuntimeError(
                f"source {db}.{schema}.{table} not cached and no fetch "
                "callback configured (no warehouse connection available)"
            )
        df, _variant_cols = self._downcast_variants(self.fetch(db, schema, table))
        dest = self._table_dir(db, schema, table)
        dest.parent.mkdir(parents=True, exist_ok=True)
        df.write.mode("overwrite").option("compression", "snappy").parquet(str(dest))
        size = sum(f.stat().st_size for f in dest.rglob("*") if f.is_file())
        m = self._load_manifest()
        m[self._key(db, schema, table)] = {
            "cached_at": time.time(),
            "path": str(dest),
            "bytes": size,
        }
        self._save_manifest(m)
        self.prune()
        return str(dest)

    def register(self, db: str, schema: str, table: str) -> None:
        """Expose the cached parquet as view ``schema_table`` (S1: ref
        source_cache.py:389-426; DuckDB view name s.t → here
        schema_table since temp views are flat)."""
        path = self.cache_table(db, schema, table)
        self.spark.read.parquet(path).createOrReplaceTempView(f"{schema}_{table}".lower())

    def prune(self) -> list[str]:
        """Age/size prune (ref source_cache.py:513-549): drop expired
        entries, then oldest-first until under max_gb."""
        m = self._load_manifest()
        removed: list[str] = []
        now = time.time()
        for key, entry in list(m.items()):
            if (now - entry["cached_at"]) / 3600.0 >= self.config.ttl_hours:
                self._drop(entry)
                removed.append(key)
                del m[key]
        total = sum(e["bytes"] for e in m.values())
        cap = self.config.max_gb * 1024**3
        for key, entry in sorted(m.items(), key=lambda kv: kv[1]["cached_at"]):
            if total <= cap:
                break
            self._drop(entry)
            total -= entry["bytes"]
            removed.append(key)
            del m[key]
        self._save_manifest(m)
        return removed

    def _drop(self, entry: dict) -> None:
        path = entry.get("path")
        if path and os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)

    def status(self) -> dict:
        """Cache status for the CLI (ref cli.py:675-715)."""
        m = self._load_manifest()
        return {
            "entries": len(m),
            "total_bytes": sum(e["bytes"] for e in m.values()),
            "tables": {
                k: {
                    "age_hours": round((time.time() - e["cached_at"]) / 3600.0, 2),
                    "bytes": e["bytes"],
                    "fresh": (time.time() - e["cached_at"]) / 3600.0 < self.config.ttl_hours,
                }
                for k, e in m.items()
            },
        }

    def clear(self) -> None:
        shutil.rmtree(self.config.cache_dir, ignore_errors=True)


import re

_TABLE_REF_RE = re.compile(
    # ref connections.py:663-666 regex: FROM/JOIN schema.table
    r"\b(?:FROM|JOIN)\s+([A-Za-z_][\w$]*)\.([A-Za-z_][\w$]*)(?:\.([A-Za-z_][\w$]*))?",
    re.IGNORECASE,
)


def extract_table_refs(sql: str) -> list[tuple[str, ...]]:
    """S3 auto-cache scan (ref connections.py:646-689): find
    schema.table / db.schema.table refs in FROM/JOIN clauses."""
    out = []
    for m in _TABLE_REF_RE.finditer(sql):
        parts = tuple(p for p in m.groups() if p)
        out.append(parts)
    return out


def auto_cache_sources(cache: SourceCache, sql: str, default_db: str = "warehouse") -> list[str]:
    """For each referenced schema.table not present in the Spark
    catalog, cache + register it (S3). Returns registered view names."""
    registered = []
    for parts in extract_table_refs(sql):
        if len(parts) == 2:
            db, schema, table = default_db, parts[0], parts[1]
        else:
            db, schema, table = parts
        view = f"{schema}_{table}".lower()
        try:
            exists = cache.spark.catalog.tableExists(view) or cache.spark.catalog.tableExists(f"{schema}.{table}")
        except Exception:
            exists = False
        if not exists:
            cache.register(db, schema, table)
            registered.append(view)
    return registered
