"""Observability & advisory layer (SURVEY §2.5 R1–R12).

The reference's routing machinery (venue choice between DuckDB and
Snowflake) is recast for a single-engine world: the same analyses run,
but they emit *advice* (plan hints, preflight warnings) and *records*
(savings ledger, run summaries, crash WAL) instead of dispatch
decisions (SURVEY §4.1).
"""

from .advisor import Advisor, PreflightChecker
from .savings import SavingsTracker
from .state import CrashWal
from .run_summary import RunSummary
from .health import health_check

__all__ = [
    "Advisor",
    "PreflightChecker",
    "SavingsTracker",
    "CrashWal",
    "RunSummary",
    "health_check",
]
