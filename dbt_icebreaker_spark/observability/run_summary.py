"""Run summary (SURVEY R11; ref run_summary.py:22-257): per-model
outcome/duration/savings for a session, persisted as JSON."""

from __future__ import annotations

import json
import time
from pathlib import Path


class RunSummary:
    def __init__(self, session_dir: str):
        self.dir = Path(session_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.started_at = time.time()
        self.models: list[dict] = []

    def record(
        self,
        model: str,
        materialization: str,
        duration_s: float,
        rows: int,
        savings_usd: float = 0.0,
        status: str = "success",
        reason: str = "",
    ) -> None:
        self.models.append(
            {
                "model": model,
                "materialization": materialization,
                "duration_s": round(duration_s, 3),
                "rows": rows,
                "savings_usd": round(savings_usd, 4),
                "status": status,
                "reason": reason,
                "ts": time.time(),
            }
        )

    def finish(self) -> dict:
        """Session JSON + breakdown (ref run_summary.py:120-257)."""
        by_status: dict[str, int] = {}
        for m in self.models:
            by_status[m["status"]] = by_status.get(m["status"], 0) + 1
        summary = {
            "started_at": self.started_at,
            "finished_at": time.time(),
            "duration_s": round(time.time() - self.started_at, 3),
            "models": self.models,
            "n_models": len(self.models),
            "by_status": by_status,
            "total_savings_usd": round(sum(m["savings_usd"] for m in self.models), 4),
        }
        out = self.dir / f"run_{int(self.started_at)}.json"
        out.write_text(json.dumps(summary, indent=2))
        return summary
