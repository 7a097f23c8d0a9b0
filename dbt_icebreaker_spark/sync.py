"""Result sync (SURVEY S6–S8, S10, R8, R9; ref sync_manager.py,
connections.py:422-536).

The reference pushes local DuckDB results back to Snowflake with
verified row counts, retry/backoff, a SQLite ledger, and Kahn-ordered
dependency scheduling. Here the "remote" is any Spark-writable target
(another catalog, a path, a JDBC connector) behind a small Writer
protocol — the orchestration logic (ordering, retry, verify, ledger)
is identical.
"""

from __future__ import annotations

import sqlite3
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

# ref sync_manager.py:39-45
DEFAULT_MAX_RETRIES = 3
DEFAULT_BACKOFF_S = 1.0


@dataclass
class SyncConfig:
    max_retries: int = DEFAULT_MAX_RETRIES
    backoff_s: float = DEFAULT_BACKOFF_S
    ledger_path: Optional[str] = None


class SyncLedger:
    """SQLite sync ledger (ref sync_manager.py:258-414)."""

    def __init__(self, path: str):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        self.path = path
        with self._conn() as c:
            c.execute(
                """CREATE TABLE IF NOT EXISTS sync_log (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    ts REAL, table_name TEXT, status TEXT,
                    rows INTEGER, attempts INTEGER, error TEXT
                )"""
            )

    def _conn(self) -> sqlite3.Connection:
        return sqlite3.connect(self.path)

    def record(self, table: str, status: str, rows: int, attempts: int, error: str = "") -> None:
        with self._conn() as c:
            c.execute(
                "INSERT INTO sync_log (ts, table_name, status, rows, attempts, error) "
                "VALUES (?,?,?,?,?,?)",
                (time.time(), table, status, rows, attempts, error),
            )

    def success_rate(self) -> float:
        with self._conn() as c:
            total, succ = c.execute(
                "SELECT COUNT(*), SUM(CASE WHEN status='success' THEN 1 ELSE 0 END) FROM sync_log"
            ).fetchone()
        return (succ or 0) / total if total else 1.0


# Writer: (df, table_name) -> None. CountReader: (table_name) -> int.
Writer = Callable[[DataFrame, str], None]
CountReader = Callable[[str], int]


def spark_table_writer(spark: SparkSession, target_prefix: str = "") -> tuple[Writer, CountReader]:
    """S7 fast path (ref sync_manager.py:180-214): both sides visible
    to one engine ⇒ cross-catalog CTAS. Here: saveAsTable into a
    target schema/catalog."""

    def write(df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").saveAsTable(f"{target_prefix}{table}")

    def count(table: str) -> int:
        return spark.table(f"{target_prefix}{table}").count()

    return write, count


def parquet_roundtrip_writer(spark: SparkSession, base_dir: str) -> tuple[Writer, CountReader]:
    """S8 slow path (ref sync_manager.py:229-255): COPY TO parquet →
    load on the other side. Here: write parquet to a shared location."""

    def write(df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(f"{base_dir}/{table}.parquet")

    def count(table: str) -> int:
        return spark.read.parquet(f"{base_dir}/{table}.parquet").count()

    return write, count


class SyncManager:
    """Verified sync with retry (R9: ref sync_manager.py:76-164)."""

    def __init__(
        self,
        spark: SparkSession,
        writer: Writer,
        counter: CountReader,
        config: Optional[SyncConfig] = None,
    ):
        self.spark = spark
        self.writer = writer
        self.counter = counter
        self.config = config or SyncConfig()
        self.ledger = SyncLedger(self.config.ledger_path) if self.config.ledger_path else None

    def sync_table(self, source_table: str, target_name: Optional[str] = None) -> dict:
        """Copy + verify row count, retrying with linear backoff
        (ref sync_manager.py:101-141: delay × attempt)."""
        target_name = target_name or source_table.split(".")[-1]
        df = self.spark.table(source_table)
        expected = df.count()
        last_err = ""
        for attempt in range(1, self.config.max_retries + 1):
            try:
                self.writer(df, target_name)
                actual = self.counter(target_name)
                if actual == expected:  # S10 verify (sync_manager.py:101-114)
                    if self.ledger:
                        self.ledger.record(target_name, "success", actual, attempt)
                    return {"table": target_name, "rows": actual, "attempts": attempt, "status": "success"}
                last_err = f"row count mismatch: wrote {actual}, expected {expected}"
            except Exception as exc:  # noqa: BLE001 — retry contract
                last_err = str(exc)
            time.sleep(self.config.backoff_s * attempt)
        if self.ledger:
            self.ledger.record(target_name, "failed", expected, self.config.max_retries, last_err)
        return {
            "table": target_name,
            "rows": expected,
            "attempts": self.config.max_retries,
            "status": "failed",
            "error": last_err,
        }

    def sync_all(self, dependencies: dict[str, list[str]]) -> list[dict]:
        """Kahn-ordered sync, stop on first failure (R8: ref
        sync_manager.py:417-501, Kahn at 463-501)."""
        order = kahn_order(dependencies)
        results = []
        for table in order:
            r = self.sync_table(table)
            results.append(r)
            if r["status"] != "success":
                break
        return results


def kahn_order(dependencies: dict[str, list[str]]) -> list[str]:
    """Topological order; deps maps node -> upstream list
    (ref sync_manager.py:463-501). Raises on cycles."""
    nodes = set(dependencies)
    for ups in dependencies.values():
        nodes.update(ups)
    indegree = {n: 0 for n in nodes}
    downstream: dict[str, list[str]] = {n: [] for n in nodes}
    for node, ups in dependencies.items():
        for up in ups:
            indegree[node] += 1
            downstream[up].append(node)
    queue = sorted(n for n, d in indegree.items() if d == 0)
    out: list[str] = []
    while queue:
        n = queue.pop(0)
        out.append(n)
        for d in sorted(downstream[n]):
            indegree[d] -= 1
            if indegree[d] == 0:
                queue.append(d)
    if len(out) != len(nodes):
        raise ValueError("dependency cycle detected")
    return out
