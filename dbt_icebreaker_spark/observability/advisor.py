"""Execution advisor (SURVEY R1/R2/R6 recast; ref auto_router.py:192-291,
traffic.py:96-363, memory_guard.py:69-341).

The reference decides *where* to run (DuckDB vs Snowflake) through 7
routing priorities and 6 traffic gates. With one engine, the same
static analyses become advice:

- capability gate → can the SQL transpile + analyze? (hard error list)
- complexity taxonomy → plan hints (broadcast candidates, shuffle
  expectations, skew warnings)
- volume estimation → partition-count & broadcast-threshold hints
- crash WAL gate → blacklist warning
- memory preflight → estimate vs available, multiplier per complexity
  class (ref memory_guard.py:166-171: 1.2/1.5/2.5/4.0×)
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import SparkSession

from ..transpiler import Transpiler
from .state import CrashWal
from .telemetry import TelemetryStore

# complexity regex classes mirror memory_guard.py:112-152
_RE_JOIN = re.compile(r"\bJOIN\b", re.I)
_RE_CROSS = re.compile(r"\bCROSS\s+JOIN\b", re.I)
_RE_WINDOW = re.compile(r"\bOVER\s*\(", re.I)
_RE_SUBQ = re.compile(r"\bWITH\b|\(\s*SELECT\b", re.I)
_RE_HEAVY = re.compile(r"\bCUBE\b|\bROLLUP\b|\bGROUPING\s+SETS\b", re.I)
_RE_DISTINCT = re.compile(r"\bDISTINCT\b", re.I)
_RE_GROUP = re.compile(r"\bGROUP\s+BY\b", re.I)
_RE_ORDER = re.compile(r"\bORDER\s+BY\b", re.I)

# memory multipliers per class (ref memory_guard.py:166-171)
MEMORY_MULTIPLIERS = {"simple": 1.2, "medium": 1.5, "complex": 2.5, "heavy": 4.0}

# external-source patterns the reference routes to cloud
# (auto_router.py:109-134) — with no cloud, these are hard errors
_EXTERNAL_PATTERNS = (
    re.compile(r"s3://", re.I),
    re.compile(r"gcs?://", re.I),
    re.compile(r"azure://", re.I),
    re.compile(r"@[A-Za-z_][\w$.]*\s", re.I),     # snowflake stages
    re.compile(r"\bCOPY\s+INTO\b", re.I),
)


def classify_complexity(sql: str) -> str:
    """simple/medium/complex/heavy (ref memory_guard.py:112-152)."""
    if _RE_HEAVY.search(sql) or _RE_CROSS.search(sql):
        return "heavy"
    score = 0
    if _RE_JOIN.search(sql):
        score += 2
    if _RE_WINDOW.search(sql):
        score += 2
    if _RE_SUBQ.search(sql):
        score += 1
    if _RE_DISTINCT.search(sql) or _RE_GROUP.search(sql):
        score += 1
    if _RE_ORDER.search(sql):
        score += 1
    if score >= 4:
        return "complex"
    if score >= 2:
        return "medium"
    return "simple"


@dataclass
class Advice:
    model: str
    ok: bool
    complexity: str
    estimated_input_bytes: int
    estimated_memory_bytes: int
    hints: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)

    def summary(self) -> str:
        lines = [
            f"model: {self.model}",
            f"ok: {self.ok}",
            f"complexity: {self.complexity}",
            f"estimated_input: {self.estimated_input_bytes / 1e6:.1f} MB",
            f"estimated_memory: {self.estimated_memory_bytes / 1e6:.1f} MB",
        ]
        for h in self.hints:
            lines.append(f"hint: {h}")
        for w in self.warnings:
            lines.append(f"warning: {w}")
        for e in self.errors:
            lines.append(f"error: {e}")
        return "\n".join(lines)


# broadcast-join candidate ceiling: Spark's default
# autoBroadcastJoinThreshold (10 MB) — the advisor suggests explicit
# broadcast() up to 8× that for dimension tables
BROADCAST_HINT_BYTES = 80 * 1024 * 1024

# measured-run gates — same thresholds as the reference's traffic
# controller (traffic.py:30-43: max_local_seconds=600,
# max_spill_bytes=1 GiB)
MAX_RUNTIME_S = 600.0
MAX_SPILL_BYTES = 1024**3


class Advisor:
    """Static analysis in the shape of AutoRouter.explain
    (ref auto_router.py:424-459) + TrafficController gates
    (traffic.py:96-152), emitting plan advice for the one engine."""

    def __init__(
        self,
        spark: SparkSession,
        wal: Optional[CrashWal] = None,
        telemetry: Optional[TelemetryStore] = None,
    ):
        self.spark = spark
        self.wal = wal
        self.telemetry = telemetry
        # the advisor gates capability FOR THE ENGINE — engine-session
        # UDFs (COMPRESS family) are runnable there, and explain()
        # must be able to PLAN them, so register on this session too
        # (r7 review; spark is None in some unit-test paths)
        self.transpiler = Transpiler(session_udfs=True)
        if spark is not None:
            from ..udfs import register_scalar_udfs

            register_scalar_udfs(spark)

    # ---- volume estimation (R4: ref catalog_scanner.py:51-234) ----
    def table_bytes(self, sql: str, search_dirs: tuple[str, ...] = ()) -> dict[str, int]:
        """Estimate referenced-table sizes by file listing. Temp-view
        parquet paths aren't exposed by the catalog, so callers pass
        candidate dirs (like the reference passes its cache dir)."""
        from ..sources import extract_table_refs

        sizes: dict[str, int] = {}
        names = {parts[-1] for parts in extract_table_refs(sql)}
        names |= set(re.findall(r"\bFROM\s+([A-Za-z_][\w$]*)\b", sql, re.I))
        names |= set(re.findall(r"\bJOIN\s+([A-Za-z_][\w$]*)\b", sql, re.I))
        for name in names:
            for d in search_dirs:
                p = os.path.join(d, f"{name}.parquet")
                if os.path.exists(p):
                    if os.path.isdir(p):
                        sizes[name] = sum(
                            os.path.getsize(os.path.join(r, f))
                            for r, _, fs in os.walk(p)
                            for f in fs
                        )
                    else:
                        sizes[name] = os.path.getsize(p)
                    break
        return sizes

    def advise(
        self,
        model: str,
        sql: str,
        search_dirs: tuple[str, ...] = (),
        available_memory_bytes: Optional[int] = None,
        route_override: Optional[str] = None,
    ) -> Advice:
        errors: list[str] = []
        warnings: list[str] = []
        hints: list[str] = []

        # gate: user override (R1 priority 1 — ref auto_router.py's
        # `icebreaker_route` model config). One engine → an explicit
        # 'cloud' pin is surfaced, not silently dropped.
        if route_override:
            if str(route_override).lower() in ("cloud", "snowflake", "remote"):
                warnings.append(
                    f"model config pins route={route_override!r}, but this "
                    "engine has no cloud target — running on Spark; drop "
                    "the override or wire an external catalog/connector"
                )
            else:
                hints.append(f"route override {route_override!r} honored (local)")

        # gate: external sources (R1 priority 3; no cloud to route to)
        for pat in _EXTERNAL_PATTERNS:
            if pat.search(sql):
                errors.append(
                    f"external source pattern {pat.pattern!r} — configure a "
                    "Spark connector/catalog for it (no cloud fallback)"
                )

        # gate: toxic types (R2 gate 3, ref traffic.py:251-259 reason
        # TOXIC_TYPES; auto_router.py:97-101 geo blacklist) — named
        # separately from general transpile failure so the refusal
        # leads with the type class, as the reference does.
        from ..transpiler import transforms as _transforms

        toxic = _transforms.detect_toxic_types(sql)
        if toxic:
            errors.append(
                "toxic types (TOXIC_TYPES gate): unsupported type class "
                f"geospatial — Types: {', '.join(toxic)}. Spark has no "
                "native GEOGRAPHY/GEOMETRY; keep this model on the "
                "warehouse or pre-compute lon/lat numerics upstream"
            )

        # gate: capability (R2 gate 3: can_transpile, traffic.py:241-248)
        ok, err = self.transpiler.can_transpile(sql)
        if not ok and not toxic:  # toxic gate already covers its failure
            errors.append(f"transpile: {err}")

        # gate: stability (R2 gate 4: crash WAL, traffic.py:250-262)
        if self.wal is not None and self.wal.is_blacklisted(model):
            warnings.append(
                f"model crashed {self.wal.crash_count(model)}x recently — "
                "raise driver/executor memory or reduce partition size"
            )

        complexity = classify_complexity(sql)
        sizes = self.table_bytes(sql, search_dirs)
        input_bytes = sum(sizes.values())
        est_memory = int(input_bytes * MEMORY_MULTIPLIERS[complexity] * 3)
        # ×3: parquet→deserialized row expansion, conservative

        # plan hints
        small = [t for t, b in sizes.items() if b <= BROADCAST_HINT_BYTES]
        big = [t for t, b in sizes.items() if b > BROADCAST_HINT_BYTES]
        if _RE_JOIN.search(sql) and small and big:
            hints.append(
                f"broadcast candidates: {sorted(small)} (≤80 MB) joined "
                f"against {sorted(big)} — use F.broadcast() or rely on AQE"
            )
        if _RE_CROSS.search(sql):
            warnings.append("CROSS JOIN: output is |L|×|R| — verify intent")
        if complexity == "heavy":
            hints.append(
                "grouping-set expansion multiplies shuffle volume; check "
                "spark.sql.shuffle.partitions against input size"
            )
        if input_bytes > 10 * 1024**3:
            hints.append(
                f"input ≈ {input_bytes / 1024**3:.1f} GiB — set shuffle "
                f"partitions ≈ {max(32, input_bytes // (128 * 1024**2))} "
                "(~128 MB each) and prefer partition-pruned predicates"
            )

        # measured-run gates (R5: ref traffic.py:30-43 thresholds fed
        # by metadata.py's harvested stats) — advice from what the
        # model actually did last run, not the static estimate
        last = self.telemetry.last(model) if self.telemetry is not None else None
        if last:
            dur = last.get("duration_s", 0.0)
            spill = last.get("spill_bytes", 0.0)
            shuffle_b = last.get("shuffle_write_bytes", 0.0)
            peak = last.get("peak_memory_bytes", 0.0)
            hints.append(
                f"measured last run: {dur:.1f}s, {last.get('rows', 0)} rows, "
                f"shuffle {shuffle_b / 1e6:.1f} MB, spill {spill / 1e6:.1f} MB, "
                f"peak memory {peak / 1e6:.1f} MB"
            )
            if dur > MAX_RUNTIME_S:
                warnings.append(
                    f"measured runtime {dur:.0f}s exceeds the {MAX_RUNTIME_S:.0f}s "
                    "gate — split the model or pre-aggregate its heaviest input"
                )
            if spill > MAX_SPILL_BYTES:
                warnings.append(
                    f"measured spill {spill / 1024**3:.1f} GiB exceeds the 1 GiB "
                    "gate — raise spark.sql.shuffle.partitions or executor memory"
                )
            elif spill > 0:
                hints.append(
                    f"last run spilled {spill / 1e6:.1f} MB — partitions are "
                    "near the memory ceiling; watch this model as data grows"
                )

        if available_memory_bytes is not None and est_memory > available_memory_bytes * 0.8:
            warnings.append(
                f"estimated memory {est_memory / 1e9:.1f} GB exceeds 80% of "
                f"available {available_memory_bytes / 1e9:.1f} GB — Spark "
                "will spill; expect slower run, not failure"
            )

        return Advice(
            model=model,
            ok=not errors,
            complexity=complexity,
            estimated_input_bytes=input_bytes,
            estimated_memory_bytes=est_memory,
            hints=hints,
            warnings=warnings,
            errors=errors,
        )

    def advise_project(
        self,
        models: dict[str, str],
        deps: Optional[dict[str, list[str]]] = None,
        search_dirs: tuple[str, ...] = (),
    ) -> dict[str, Advice]:
        """Project-wide advice with dependency propagation (R1
        priority 5 — ref auto_router.py routes a model to cloud when
        any upstream went to cloud). Here the propagated signal is
        advisory: a model whose upstream has advisory ERRORS gets a
        warning, because its input will be missing/stale if the
        upstream can't run. Models are visited in Kahn order via the
        project DAG so upstream advice exists before downstream."""
        from ..sync import kahn_order

        deps = deps or {}
        order = kahn_order({m: deps.get(m, []) for m in models})
        out: dict[str, Advice] = {}
        for name in order:
            if name not in models:
                continue  # raw source dep, not an advisable model
            adv = self.advise(name, models[name], search_dirs)
            flagged = [
                u for u in deps.get(name, [])
                if u in out and not out[u].ok
            ]
            if flagged:
                adv.warnings.append(
                    f"upstream model(s) {sorted(flagged)} have blocking "
                    "advice — this model's inputs will be missing or "
                    "stale until they are fixed"
                )
            out[name] = adv
        return out

    def explain(self, model: str, sql: str, search_dirs: tuple[str, ...] = ()) -> str:
        """`engine explain` = advice + Spark's own formatted plan
        (strictly more than ref cli.py:491-521, which is static-only).
        """
        advice = self.advise(model, sql, search_dirs)
        parts = [advice.summary()]
        if advice.ok:
            try:
                import contextlib
                import io

                spark_sql = self.transpiler.to_spark(sql)
                df = self.spark.sql(spark_sql)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                parts.append(buf.getvalue())
            except Exception as exc:  # analysis needs tables registered
                parts.append(f"(plan unavailable: {exc})")
        return "\n\n".join(parts)


class PreflightChecker:
    """R6 (ref memory_guard.py:258-341): estimate vs budget check.
    Budget: ≤75% of system RAM, ≥1 GB kept free
    (memory_guard.py:46-48); run if estimate ≤ 80% of effective
    available (memory_guard.py:101-102). Spark spills instead of
    OOMing, so failures become warnings."""

    def __init__(self, advisor: Advisor, total_memory_bytes: Optional[int] = None):
        self.advisor = advisor
        if total_memory_bytes is None:
            try:
                total_memory_bytes = os.sysconf("SC_PAGE_SIZE") * os.sysconf(
                    "SC_PHYS_PAGES"
                )
            except (ValueError, OSError):
                total_memory_bytes = 16 * 1024**3  # ref memory_guard.py:64-65
        self.total = total_memory_bytes

    def check(self, model: str, sql: str, search_dirs: tuple[str, ...] = ()) -> Advice:
        budget = max(self.total * 0.75 - 1024**3, 1024**3)
        return self.advisor.advise(
            model, sql, search_dirs, available_memory_bytes=int(budget)
        )
