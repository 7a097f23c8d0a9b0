"""Cost/savings accounting (SURVEY R7; ref savings.py).

Identical arithmetic to the reference, reframed as "cloud cost this
Spark job avoided": `max(60 s, duration)/3600 × credits_per_hour(size)
× $/credit(edition)` (ref savings.py:174-219, 60 s minimum at :206).
Ledger is SQLite like the reference (savings.py:76-96).
"""

from __future__ import annotations

import sqlite3
import time
from pathlib import Path

# ref savings.py:23-41
COST_PER_CREDIT = {"standard": 2.0, "enterprise": 3.0, "business_critical": 4.0}
CREDITS_PER_HOUR = {
    "xs": 1, "s": 2, "m": 4, "l": 8, "xl": 16, "2xl": 32, "3xl": 64, "4xl": 128,
}
MIN_BILLING_SECONDS = 60.0  # ref savings.py:39
DEFAULT_EDITION = "standard"   # ref savings.py:40
DEFAULT_WAREHOUSE = "xs"       # ref savings.py:41


def estimate_cloud_cost(
    duration_s: float,
    warehouse_size: str = DEFAULT_WAREHOUSE,
    edition: str = DEFAULT_EDITION,
) -> float:
    """ref savings.py:174-219."""
    billed = max(MIN_BILLING_SECONDS, duration_s)
    credits = (billed / 3600.0) * CREDITS_PER_HOUR[warehouse_size.lower()]
    return credits * COST_PER_CREDIT[edition.lower()]


class SavingsTracker:
    """SQLite savings ledger (ref savings.py:76-171, 232-303)."""

    def __init__(self, db_path: str):
        Path(db_path).parent.mkdir(parents=True, exist_ok=True)
        self.db_path = db_path
        with self._conn() as c:
            c.execute(
                """CREATE TABLE IF NOT EXISTS savings (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    ts REAL NOT NULL,
                    model TEXT NOT NULL,
                    engine TEXT NOT NULL,
                    duration_s REAL NOT NULL,
                    warehouse_size TEXT,
                    edition TEXT,
                    estimated_cloud_cost REAL NOT NULL,
                    actual_cost REAL NOT NULL
                )"""
            )

    def _conn(self) -> sqlite3.Connection:
        return sqlite3.connect(self.db_path)

    def log_run(
        self,
        model: str,
        duration_s: float,
        engine: str = "spark",
        warehouse_size: str = DEFAULT_WAREHOUSE,
        edition: str = DEFAULT_EDITION,
    ) -> float:
        """Record one model run; returns $ saved (ref savings.py:99-171:
        local run cost = $0, savings = estimated cloud cost)."""
        cloud = estimate_cloud_cost(duration_s, warehouse_size, edition)
        actual = 0.0 if engine == "spark" else cloud
        with self._conn() as c:
            c.execute(
                "INSERT INTO savings (ts, model, engine, duration_s, "
                "warehouse_size, edition, estimated_cloud_cost, actual_cost) "
                "VALUES (?,?,?,?,?,?,?,?)",
                (time.time(), model, engine, duration_s, warehouse_size,
                 edition, cloud, actual),
            )
        return cloud - actual

    def summary(self, days: float = 30.0) -> dict:
        """ref savings.py:232-303."""
        horizon = time.time() - days * 86400
        with self._conn() as c:
            total, n = c.execute(
                "SELECT COALESCE(SUM(estimated_cloud_cost - actual_cost), 0), "
                "COUNT(*) FROM savings WHERE ts >= ?",
                (horizon,),
            ).fetchone()
            by_model = c.execute(
                "SELECT model, COUNT(*), SUM(estimated_cloud_cost - actual_cost) "
                "FROM savings WHERE ts >= ? GROUP BY model ORDER BY 3 DESC",
                (horizon,),
            ).fetchall()
        return {
            "window_days": days,
            "total_savings_usd": round(total, 4),
            "runs": n,
            "by_model": [
                {"model": m, "runs": r, "savings_usd": round(s, 4)}
                for m, r, s in by_model
            ],
        }

    def projection(self, days: float = 30.0) -> dict:
        """Monthly projection from the window's daily rate
        (ref savings.py:355-459 dashboard math)."""
        s = self.summary(days)
        daily = s["total_savings_usd"] / max(days, 1e-9)
        return {"daily_rate_usd": round(daily, 4), "monthly_projection_usd": round(daily * 30, 2)}
