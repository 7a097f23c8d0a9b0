"""Health checks (SURVEY R10; ref health_check.py:69-276).

Checks: engine reachable, cache freshness, savings ledger present,
sync ledger success rate (≥95% OK / ≥80% WARN — ref
health_check.py:262-263).
"""

from __future__ import annotations

import os
from typing import Optional

OK, WARN, ERROR = "ok", "warning", "error"
SYNC_OK_THRESHOLD = 0.95   # ref health_check.py:262
SYNC_WARN_THRESHOLD = 0.80  # ref health_check.py:263


def health_check(
    spark=None,
    cache=None,
    savings_db: Optional[str] = None,
    sync_ledger: Optional[str] = None,
) -> dict:
    checks: list[dict] = []

    # engine reachable (ref health_check.py:69-110 "local DB reachable")
    if spark is not None:
        try:
            spark.sql("SELECT 1").collect()
            checks.append({"name": "spark_session", "status": OK})
        except Exception as exc:
            checks.append({"name": "spark_session", "status": ERROR, "detail": str(exc)})

    # cache freshness (ref health_check.py:112-170)
    if cache is not None:
        st = cache.status()
        stale = [k for k, v in st["tables"].items() if not v["fresh"]]
        status = OK if not stale else WARN
        checks.append(
            {
                "name": "source_cache",
                "status": status,
                "entries": st["entries"],
                "stale": stale,
            }
        )

    # savings ledger (ref health_check.py:172-210)
    if savings_db is not None:
        if os.path.exists(savings_db):
            checks.append({"name": "savings_ledger", "status": OK})
        else:
            checks.append(
                {"name": "savings_ledger", "status": WARN, "detail": "no ledger yet"}
            )

    # sync success rate (ref health_check.py:212-276)
    if sync_ledger is not None:
        import sqlite3

        if not os.path.exists(sync_ledger):
            checks.append({"name": "sync_ledger", "status": WARN, "detail": "no ledger yet"})
        else:
            with sqlite3.connect(sync_ledger) as c:
                total, succ = c.execute(
                    "SELECT COUNT(*), SUM(CASE WHEN status='success' THEN 1 ELSE 0 END) "
                    "FROM sync_log"
                ).fetchone()
            rate = (succ or 0) / total if total else 1.0
            status = OK if rate >= SYNC_OK_THRESHOLD else (
                WARN if rate >= SYNC_WARN_THRESHOLD else ERROR
            )
            checks.append(
                {"name": "sync_ledger", "status": status, "success_rate": round(rate, 4)}
            )

    worst = ERROR if any(c["status"] == ERROR for c in checks) else (
        WARN if any(c["status"] == WARN for c in checks) else OK
    )
    return {"status": worst, "checks": checks}
